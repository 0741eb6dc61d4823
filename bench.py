#!/usr/bin/env python3
"""Per-round benchmark harness.

Runs the headline pipeline + operator queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints
ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "events_per_sec": ...}

The headline number for BASELINE.json's metric (change-events/sec applied
end-to-end tail→merge) is ``events_per_sec``: a seeded synthetic binlog
replayed through epoch planning → compaction → bucketed MERGE → commit log.
Scaling-efficiency evidence (N vs 4N cores) is produced separately by
``tools/bench_scaling.py`` into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("BENCH_EVENTS", "2000000"))


def main() -> None:
    from cdc_tools_spark.pipeline import ReplayConfig, replay
    from cdc_tools_spark.session import get_spark
    from cdc_tools_spark.sources.binlog import synthetic_binlog

    import cdc_tools_spark.queries as q

    spark = get_spark("cdc-bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    # -- headline: end-to-end tail→merge on a synthetic binlog ------------
    def bench_replay() -> None:
        work = tempfile.mkdtemp(prefix="bench_replay_")
        try:
            # Materialize the binlog once (untimed): the engine tails a
            # stored log, and lsn-ordered parquet row groups let each
            # epoch's range predicate prune the scan.
            synthetic_binlog(
                spark, N_EVENTS, n_keys=N_EVENTS // 20, txn_size=4,
                n_repos=200, hot_key_pct=20, n_hot_keys=5, content_chars=256,
            ).write.parquet(os.path.join(work, "log"))
            log = spark.read.parquet(os.path.join(work, "log"))
            cfg = ReplayConfig(
                epoch_events=max(N_EVENTS // 4, 1), num_buckets=128,
                epoch_strategy="quantile", collect_metrics=False,
            )
            t0 = time.time()
            replay(spark, log, os.path.join(work, "t"), os.path.join(work, "s"), config=cfg)
            extras["events_per_sec"] = round(N_EVENTS / (time.time() - t0), 1)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    timed("cdc_replay_tail_merge", bench_replay)

    # -- operator queries over the sf dir ----------------------------------
    for name in (
        "cdc_changelog",
        "cdc_compaction",
        "cdc_transactions",
        "cdc_upsert_delete_split",
        "pricing_summary",
        "top_customer_revenue",
        "nation_order_volume",
        "events_hourly",
    ):
        fn = q.queries()[name]
        timed(name, lambda fn=fn: fn(spark, SF_DIR).write.format("noop").mode("overwrite").save())

    print(
        json.dumps(
            {
                "metric": "change-events/sec applied end-to-end tail->merge "
                "(synthetic binlog replay) + operator suite wall-clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "bench_events": N_EVENTS,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
