#!/usr/bin/env python3
"""Table-maintenance job — the operational companion to replay_job.py.

    spark-submit --py-files dist/cdc_tools_spark.zip \
        examples/maintenance_job.py --table s3://bucket/lake/repo_files \
        [--compact-max-deltas 8] [--expire-below-lsn 123456] \
        [--grow-buckets 4096] [--rescale-step-groups 64] [--vacuum 16]

Every action is incremental and bounded — safe to run on a 100 TB table in
a short maintenance window, repeatedly:

* ``--compact-max-deltas N``  — MOR governor: fold buckets whose delta
  chain exceeds N (manifest-only check when nothing is over).
* ``--expire-below-lsn W``    — GC delete-tombstones below the replay
  watermark W; candidate buckets come from the manifest's per-bucket
  tombstone stats (zero data I/O) and only those are rewritten.
* ``--grow-buckets M``        — begin an incremental rescale to M buckets
  (manifest-only; M must be an integer multiple of the current count).
  Ongoing merges split the sibling groups they touch for free.
* ``--rescale-step-groups K`` — split up to K quiescent sibling groups in
  one bounded job; run on a cadence until it reports 0 remaining.
* ``--vacuum N``              — drop data directories referenced by no
  retained snapshot, keeping the N newest snapshots time-travelable (also
  collects CAS-loser orphan directories from crashed/conflicted writers).

Concurrent-writer note: all of these commit through the same CAS manifest
chain as merges — a conflict with a live writer surfaces as
CommitConflictError; rerun the action (it reloads fresh state).
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_tools_spark.lake.parquet_merge import ParquetMergeTable  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--compact-max-deltas", type=int, default=None)
    ap.add_argument("--expire-below-lsn", type=int, default=None)
    ap.add_argument("--grow-buckets", type=int, default=None)
    ap.add_argument("--rescale-step-groups", type=int, default=None)
    ap.add_argument("--vacuum", type=int, default=None, metavar="KEEP_VERSIONS")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("cdc-maintenance").getOrCreate()
    table = ParquetMergeTable(spark, args.table)  # key_cols from the manifest

    if args.compact_max_deltas is not None:
        v = table.compact_table(max_deltas=args.compact_max_deltas)
        print(f"compact_table -> version {v}")
    if args.expire_below_lsn is not None:
        v = table.expire_tombstones(args.expire_below_lsn, epoch_id=-1)
        print(f"expire_tombstones(<{args.expire_below_lsn}) -> version {v}")
    if args.grow_buckets is not None:
        table.begin_rescale(args.grow_buckets)
        print(f"begin_rescale({args.grow_buckets}) recorded (manifest-only)")
    if args.rescale_step_groups is not None:
        split = table.rescale_step(max_groups=args.rescale_step_groups)
        print(f"rescale_step -> split groups {split or 'none (complete)'}")
    if args.vacuum is not None:
        removed = table.vacuum(keep_versions=args.vacuum)
        print(f"vacuum -> removed versions {removed}")


if __name__ == "__main__":
    main()
