#!/usr/bin/env python3
"""Cluster replay job — the spark-submit entry point.

    python tools/make_pyfiles.py
    spark-submit --py-files dist/cdc_tools_spark.zip \
        --num-executors 250 --executor-cores 4 --executor-memory 16g \
        examples/replay_job.py \
        --log s3://bucket/binlog/ --table s3://bucket/lake/repo_files \
        --state s3://bucket/state/commits --execution-id prod-replay-7 \
        --epoch-events 100000000

At 10^10 events: ~100 epochs of 10^8 events; each epoch is one distributed
job; resume after any failure is automatic via the commit log. Use
``--iceberg catalog.db.repo_files`` on clusters with the Iceberg runtime to
MERGE INTO a real Iceberg table instead of the self-contained parquet
format.
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_tools_spark.lake.iceberg import IcebergTable  # noqa: E402
from cdc_tools_spark.pipeline import ReplayConfig, replay  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True, help="binlog parquet directory")
    ap.add_argument("--table", required=True, help="lake table root (parquet format)")
    ap.add_argument("--iceberg", help="Iceberg identifier; overrides --table format")
    ap.add_argument("--state", required=True, help="commit-log root")
    ap.add_argument("--execution-id", default="replay-0")
    ap.add_argument("--epoch-events", type=int, default=100_000_000)
    ap.add_argument("--num-buckets", type=int, default=4096)
    ap.add_argument(
        "--atomic-tables", action="store_true",
        help="log carries table_name: fan out per table with per-epoch "
        "ALL-OR-NOTHING cross-table visibility (group markers; readers "
        "resolve a consistent per-table version set via group_snapshot)",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.appName(f"cdc-replay-{args.execution_id}").getOrCreate()
    log = spark.read.parquet(args.log)

    if args.atomic_tables:
        from cdc_tools_spark.pipeline import replay_tables_atomic

        out = replay_tables_atomic(
            spark, log, args.table, args.state,
            execution_id=args.execution_id,
            config=ReplayConfig(
                epoch_events=args.epoch_events,
                num_buckets=args.num_buckets,
                parity_column=True,
            ),
        )
        for t, s in sorted(out.items()):
            print(
                f"{t}: epochs={s.epochs_applied} upserts={s.upserts} "
                f"deletes={s.deletes} version={s.table_version}"
            )
        return

    table = None
    if args.iceberg:
        table = IcebergTable(spark, args.iceberg)

    summary = replay(
        spark,
        log,
        args.table,
        args.state,
        execution_id=args.execution_id,
        config=ReplayConfig(
            epoch_events=args.epoch_events,
            num_buckets=args.num_buckets,
            parity_column=True,
        ),
        table=table,
    )
    print(
        f"epochs applied={summary.epochs_applied} skipped={summary.epochs_skipped} "
        f"upserts={summary.upserts} deletes={summary.deletes} "
        f"redundant={summary.redundant_events} version={summary.table_version}"
    )


if __name__ == "__main__":
    main()
