#!/usr/bin/env python3
"""Round-7 optimization profiler (guide §1): time each contract/bench query
with the noop sink, dump ``explain("formatted")`` plans, and break the heavy
queries into isolated sub-stages so the expensive operator is attributable.

Separate from the frozen ``bench.py`` (measurement contract); numbers here
feed OPTIMIZATION_r07.md only.

Usage::

    python tools/profile_r07.py --sf-dir /root/testdata/sf1.0 \
        --queries dedup_minhash_lsh decontaminate --repeat 2
    python tools/profile_r07.py --plans plans/r07 --suffix before
    python tools/profile_r07.py --stages minhash
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_QUERIES = [
    "cdc_changelog", "cdc_compaction", "cdc_transactions",
    "cdc_upsert_delete_split", "pricing_summary", "top_customer_revenue",
    "nation_order_volume", "events_hourly", "dedup_exact",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_clusters",
    "dedup_incremental", "ann_kmeans_assign", "text_quality",
    "text_repetition", "decontaminate", "quality_filter", "bpe_pairs",
    "key_profile_events", "pack_sequences",
]


def get_session(cores: int):
    from cdc_tools_spark.session import get_spark

    return get_spark(
        "cdc-profile-r07",
        master=f"local[{cores}]",
        shuffle_partitions=cores * 2,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "16m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
        },
    )


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label: str, fn, repeat: int = 1) -> list[float]:
    out = []
    for i in range(repeat):
        spark.sparkContext.setJobDescription(f"{label}#{i}")
        t0 = time.time()
        fn()
        out.append(round(time.time() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    return out


def stage_frames(spark, sf_dir: str, which: str):
    """Isolated sub-stage DataFrames for the heavy queries."""
    import pyspark.sql.functions as F

    from cdc_tools_spark.ops import dedup as D
    from cdc_tools_spark.ops import text as X
    from cdc_tools_spark.sources.scan import parallel_read

    docs = parallel_read(spark, os.path.join(sf_dir, "documents.parquet"))
    frames: dict[str, object] = {}
    if which in ("minhash", "all"):
        sh = D.word_shingles(docs)
        frames["minhash/shingles"] = sh
        frames["minhash/sig_wide"] = D.minhash_signatures_wide(docs)
        frames["minhash/band_index"] = D.lsh_band_index(docs)
        frames["minhash/candidates"] = D.minhash_lsh_candidates(docs)
        frames["minhash/neardup_verified"] = D.neardup_pairs(docs)
    if which in ("decon", "all"):
        bench = docs.where((F.col("doc_id") % 10) == 3)
        train = docs.where((F.col("doc_id") % 10) != 3)
        tr = D.word_shingles(train).select(
            F.col("doc_id").alias("train_id"), "shingle"
        )
        frames["decon/train_shingles"] = tr
        frames["decon/overlap_pairs"] = D.contamination_overlap(
            train, bench, n=3, min_shared=4, max_gram_freq=200
        )
        frames["decon/full"] = D.decontaminate(
            train, bench, n=3, min_shared=4, max_gram_freq=200
        )
    if which in ("repetition", "all"):
        frames["repetition/full"] = X.repetition_features(docs)
    if which in ("simhash", "all"):
        frames["simhash/full"] = D.simhash(docs)
    if which in ("pack", "all"):
        chunks = X.chunk_documents(docs, chunk_tokens=64, overlap=8)
        frames["pack/chunks"] = chunks
        frames["pack/full"] = X.pack_sequences(chunks, seq_len=256, n_shards=8)
    return frames


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--cores", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", nargs="*", default=None,
                    help="bench query names to time (noop sink)")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--plans", default=None,
                    help="directory to write explain('formatted') plans into")
    ap.add_argument("--suffix", default="before",
                    help="plan filename suffix (before/after)")
    ap.add_argument("--stages", default=None,
                    help="sub-stage group: minhash|decon|repetition|simhash|pack|all")
    args = ap.parse_args()

    spark = get_session(args.cores)
    import cdc_tools_spark.queries as q

    reg = q.queries()
    results: dict[str, list[float]] = {}

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        names = args.queries or BENCH_QUERIES
        for name in names:
            if name not in reg:
                continue
            df = reg[name](spark, args.sf_dir)
            path = os.path.join(args.plans, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"plan -> {path}", file=sys.stderr)

    if args.queries is not None and not args.plans:
        names = args.queries or BENCH_QUERIES
        for name in names:
            fn = reg[name]
            results[name] = timed(
                spark, name,
                lambda fn=fn: noop(fn(spark, args.sf_dir)), args.repeat)
            print(f"{name}: {results[name]}", file=sys.stderr, flush=True)

    if args.stages:
        for label, df in stage_frames(spark, args.sf_dir, args.stages).items():
            results[label] = timed(
                spark, label, lambda df=df: noop(df), args.repeat)
            print(f"{label}: {results[label]}", file=sys.stderr, flush=True)

    print(json.dumps({"sf_dir": args.sf_dir, "cores": args.cores,
                      "timings": results}))


if __name__ == "__main__":
    main()
