#!/usr/bin/env python3
"""Volume probe for the dedup/ANN plane (VERDICT r5 #5).

The CDC path has 20M/50M-event probes; this drives the DEDUP operators at
millions-of-docs scale with per-stage attribution, reporting the numbers
that detect superlinear blowup: candidates per doc, verified pairs per
doc, and CC rounds-to-converge. Run it at two sizes (``--docs`` and
``--docs-small``, default 4:1) in one process — per-doc rates that hold
across the 4x step are the no-blowup evidence.

Corpus: synthesized IN SPARK (pure JVM expressions, no Python UDF, no
driver loop) — ``n`` docs of 60 md5-derived tokens; every 10th doc is a
near-copy of its predecessor with 2 of 60 tokens rewritten (shingle
Jaccard ~0.9 >> the 0.5 verify threshold), so ~10% of docs belong to a
2-doc cluster, and 1% of docs form 4-doc PATH clusters (three chained
copies) so CC takes multi-hop rounds: a deterministic, scale-invariant
near-dup rate.

Prints one JSON line per size plus a final summary line with the
small->large per-doc ratios.

Usage:
    BENCH_WORKDIR=/dev/shm/dv python tools/bench_dedup_volume.py \
        --docs 2000000 --cores 32
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_corpus(spark, n: int, path: str):
    """n docs, 60 tokens each; id%10==9 docs are near-copies of id-1."""
    import pyspark.sql.functions as F

    # id%10==9 -> 2-doc clusters (copy of id-1); id%100 in {97, 98} chains
    # three consecutive copies into a 4-doc path cluster {96..99} so
    # connected components has multi-hop work (rounds > 1), 1% of docs
    mutated = (F.col("id") % 10 == 9) | (F.col("id") % 100).isin(97, 98)
    base = F.when(mutated, F.col("id") - 1).otherwise(F.col("id"))
    tok = lambda j_expr, owner: F.substring(  # noqa: E731
        F.md5(F.concat_ws(":", owner.cast("string"), j_expr.cast("string"))), 1, 8
    )
    # positions 0 and 29 are rewritten in copies (2/60 token edits)
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(59)),
            lambda j: F.when(
                mutated & j.isin(0, 29), tok(j + 1000, F.col("id"))
            ).otherwise(tok(j, base)),
        ),
        " ",
    )
    (
        spark.range(n)
        .select(F.col("id").alias("doc_id"), text.alias("text"))
        .write.mode("overwrite")
        .parquet(path)
    )


def probe(spark, path: str, n: int) -> dict:
    import pyspark.sql.functions as F

    from cdc_tools_spark.ops import dedup as D

    docs = spark.read.parquet(path)
    out = {"n_docs": n}

    t0 = time.time()
    cand = D.minhash_lsh_candidates(docs, num_hashes=32, rows_per_band=4)
    n_cand = cand.count()
    out["lsh_candidates_s"] = round(time.time() - t0, 2)
    out["candidates"] = n_cand
    out["candidates_per_doc"] = round(n_cand / n, 4)

    t0 = time.time()
    pairs = D.neardup_pairs(docs, num_hashes=32, rows_per_band=4, threshold=0.5)
    ppath = path + "_pairs"
    pairs.write.mode("overwrite").parquet(ppath)
    pairs = spark.read.parquet(ppath)
    n_pairs = pairs.count()
    out["verify_s"] = round(time.time() - t0, 2)
    out["verified_pairs"] = n_pairs
    out["pairs_per_doc"] = round(n_pairs / n, 4)

    t0 = time.time()
    stats: dict = {}
    cc = D.connected_components(pairs, stats=stats)
    n_clustered = cc.count()
    n_clusters = cc.select("cluster_id").distinct().count()
    out["cc_s"] = round(time.time() - t0, 2)
    out["cc_rounds"] = stats.get("rounds")
    out["docs_in_clusters"] = n_clustered
    out["clusters"] = n_clusters

    # incremental: last 5% of ids arrive as a batch against the rest
    cut = int(n * 0.95)
    new = docs.where(F.col("doc_id") >= cut)
    corpus = docs.where(F.col("doc_id") < cut)
    t0 = time.time()
    index = D.lsh_band_index(corpus, num_hashes=32, rows_per_band=4)
    ipath = path + "_index"
    index.write.mode("overwrite").parquet(ipath)
    index = spark.read.parquet(ipath)
    out["index_build_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    inc = D.neardup_pairs_incremental(
        new, corpus, num_hashes=32, rows_per_band=4, threshold=0.5,
        corpus_index=index,
    )
    n_inc = inc.count()
    out["incremental_s"] = round(time.time() - t0, 2)
    out["incremental_pairs"] = n_inc
    out["incremental_pairs_per_batch_doc"] = round(n_inc / max(1, n - cut), 4)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=2_000_000)
    p.add_argument("--docs-small", type=int, default=None,
                   help="default: --docs // 4")
    p.add_argument("--cores", type=int, default=32)
    p.add_argument("--workdir", default=os.environ.get(
        "BENCH_WORKDIR", "/dev/shm/dedup_vol"))
    args = p.parse_args()
    small = args.docs_small or args.docs // 4

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName("dedup-volume-probe")
        .config("spark.sql.shuffle.partitions", str(4 * args.cores))
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", os.path.join(args.workdir, "tmp"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for n in (small, args.docs):
        path = os.path.join(args.workdir, f"docs_{n}")
        t0 = time.time()
        build_corpus(spark, n, path)
        gen_s = round(time.time() - t0, 2)
        r = {"gen_s": gen_s, **probe(spark, path, n)}
        results.append(r)
        print(json.dumps(r), flush=True)

    s, l = results
    scale = l["n_docs"] / s["n_docs"]

    def ratio(key):
        return round((l[key] / l["n_docs"]) / (s[key] / s["n_docs"]), 3)

    print(json.dumps({
        "summary": "per-doc cost ratio large/small (1.0 = linear)",
        "scale_factor": scale,
        "lsh_candidates": ratio("lsh_candidates_s"),
        "verify": ratio("verify_s"),
        "cc": ratio("cc_s"),
        "incremental": ratio("incremental_s"),
        "candidates_per_doc": [s["candidates_per_doc"], l["candidates_per_doc"]],
        "cc_rounds": [s["cc_rounds"], l["cc_rounds"]],
    }), flush=True)
    shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
