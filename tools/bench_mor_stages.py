#!/usr/bin/env python
"""MOR read-path stage breakdown (VERDICT r4 #5).

The MOR bench charges one read-side compaction pass (base ∪ deltas →
per-key max_by → noop write) inside its timed window; its scaling tier has
trailed COW's. This tool attributes that pass at STAGE granularity via the
Spark UI REST API (spark.ui here, normally off): per stage —
executor-run-time, input bytes, shuffle read/write — which separates the
scan+partial-aggregation stage from the final-aggregation+write stage the
shuffle splits them into (whole-stage codegen fuses scan with partial agg,
so two stages IS the physical decomposition of scan/compact/write).

Run once per parallelism level (fresh JVM per level — local masters can't
be swapped in-process):

    BENCH_WORKDIR=/dev/shm/b python tools/bench_mor_stages.py --cores 8
    BENCH_WORKDIR=/dev/shm/b python tools/bench_mor_stages.py --cores 32

Prints one JSON line: phase wall times (delta-append replay, compaction)
plus per-stage rows for the compaction job group.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.load(r)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--ui-port", type=int, default=4057)
    args = ap.parse_args()

    from bench import run_replay  # noqa: E402 — reuse the headline generator
    from cdc_tools_spark.lake.parquet_merge import ParquetMergeTable
    from cdc_tools_spark.pipeline import ReplayConfig, replay
    from cdc_tools_spark.session import get_spark
    from cdc_tools_spark.sources.binlog import synthetic_binlog

    workbase = os.environ.get("BENCH_WORKDIR")
    if workbase:
        os.makedirs(workbase, exist_ok=True)
    spark = get_spark(
        f"mor-stages-{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores * 2,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(args.ui_port),
            "spark.sql.files.maxPartitionBytes": "16m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
            "spark.io.compression.codec": "lz4",
            "spark.sql.parquet.compression.codec": "lz4",
            **(
                {"spark.local.dir": workbase} if workbase else {}
            ),
        },
    )
    sc = spark.sparkContext
    work = tempfile.mkdtemp(prefix="mor_stages_", dir=workbase)

    n = args.events
    synthetic_binlog(
        spark, n, n_keys=n // 20, txn_size=4, n_repos=200,
        hot_key_pct=20, n_hot_keys=5, content_chars=256,
    ).write.parquet(os.path.join(work, "log"))
    log = spark.read.parquet(os.path.join(work, "log"))
    cfg = ReplayConfig(
        epoch_events=max(n // 4, 1), num_buckets=128,
        epoch_strategy="quantile", collect_metrics=False,
        total_events=n, bucket_pruning=False, parity_column=True,
        merge_mode="mor",
    )

    sc.setJobGroup("mor-replay", "delta-append replay", interruptOnCancel=False)
    t0 = time.time()
    replay(spark, log, os.path.join(work, "t"), os.path.join(work, "s"), config=cfg)
    replay_wall = time.time() - t0
    sc.setJobGroup("mor-compact", "read-side compaction", interruptOnCancel=False)
    t0 = time.time()
    ParquetMergeTable(spark, os.path.join(work, "t")).read().write.format(
        "noop"
    ).mode("overwrite").save()
    compact_wall = time.time() - t0
    sc.setJobGroup("other", "", interruptOnCancel=False)

    base = f"http://localhost:{args.ui_port}/api/v1/applications/{sc.applicationId}"
    jobs = _rest(f"{base}/jobs?status=succeeded")
    stages = {s["stageId"]: s for s in _rest(f"{base}/stages?status=COMPLETE")}

    def group_stages(group: str) -> list[dict]:
        sids = sorted(
            {
                sid
                for j in jobs
                if j.get("jobGroup") == group
                for sid in j["stageIds"]
            }
        )
        out = []
        for sid in sids:
            s = stages.get(sid)
            if s is None:
                continue
            out.append(
                {
                    "stage": sid,
                    "name": s["name"].split("\n")[0][:60],
                    "executor_run_ms": s["executorRunTime"],
                    "task_time_ms": s.get("executorCpuTime", 0) // 1_000_000,
                    "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                    "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                    "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                    "output_mb": round(s.get("outputBytes", 0) / 1e6, 1),
                    "tasks": s.get("numCompleteTasks", s.get("numTasks", 0)),
                }
            )
        return out

    result = {
        "cores": args.cores,
        "events": n,
        "replay_wall_sec": round(replay_wall, 2),
        "compact_wall_sec": round(compact_wall, 2),
        "replay_events_per_sec": round(n / replay_wall, 1),
        "compact_stages": group_stages("mor-compact"),
        "replay_stage_count": len(group_stages("mor-replay")),
        "replay_executor_run_ms": sum(
            s["executor_run_ms"] for s in group_stages("mor-replay")
        ),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
