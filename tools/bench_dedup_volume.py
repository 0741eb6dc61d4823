#!/usr/bin/env python3
"""Volume probe for the dedup/ANN plane (VERDICT r5 #5).

The CDC path has 20M/50M-event probes; this drives the DEDUP operators at
millions-of-docs scale with per-stage attribution, reporting the numbers
that detect superlinear blowup: candidates per doc, verified pairs per
doc, and CC rounds-to-converge. Run it at two sizes (``--docs`` and
``--docs-small``, default 4:1) in one process — per-doc rates that hold
across the 4x step are the no-blowup evidence.

Corpus: synthesized IN SPARK (pure JVM expressions, no Python UDF, no
driver loop) — ``n`` docs of 60 md5-derived tokens with a deterministic,
scale-invariant dup structure: ~9% of docs in 2-doc near-copy clusters
and 1% in 4-doc PATH clusters whose edges exist only between consecutive
members (see ``build_corpus``) so CC takes multi-hop rounds. Chain-edge
Jaccard ~0.66 sits where banded-LSH recall is ~0.8 per edge — some chain
edges are (correctly) not discovered, which the per-size pair counts
reflect.

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
    """n docs, 60 tokens each, two deterministic dup structures:

    * id%10==9 (except chain tails): a near-copy of id-1 with 2 tokens
      rewritten (shingle Jaccard ~0.9) -> 2-doc clusters, ~9%/100 docs;
    * id%100 in {97,98,99}: a PATH cluster rooted at id%100==96 — depth d
      mutates 4*d SPREAD positions (j%16 in {0,4,8}, step d' owns
      j%16 == 4*(d'-1)) with depth-STABLE values, so consecutive depths
      differ by exactly 4 isolated tokens (J ~0.66, above the 0.5 verify
      bar) while depth-skipping pairs differ by >= 8 (J ~0.41, below it):
      edges form ONLY between consecutive depths, giving connected
      components true multi-hop work (rounds > 1). Spread positions (not
      a contiguous prefix) matter: contiguous edits share shingle windows
      and would leave endpoint Jaccard above threshold, collapsing the
      path into a clique.
    """
    import pyspark.sql.functions as F

    m100 = F.col("id") % 100
    depth = m100 - 96  # 1..3 for chain members
    is_chain = m100.isin(97, 98, 99)
    root = F.col("id") - depth
    is_pair = (F.col("id") % 10 == 9) & ~is_chain
    base = (
        F.when(is_chain, root)
        .when(is_pair, F.col("id") - 1)
        .otherwise(F.col("id"))
    )
    tok = lambda j_expr, owner: F.substring(  # noqa: E731
        F.md5(F.concat_ws(":", owner.cast("string"), j_expr.cast("string"))), 1, 8
    )
    chain_tok = lambda j: F.substring(  # noqa: E731  depth-stable value
        F.md5(F.concat_ws(":", root.cast("string"), j.cast("string"), F.lit("mut"))),
        1, 8,
    )
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(59)),
            lambda j: F.when(
                is_chain
                & (j % 16).isin(0, 4, 8)
                & (F.floor((j % 16) / 4) < depth),
                chain_tok(j),
            )
            .when(is_pair & j.isin(0, 29), tok(j + 1000, F.col("id")))
            .otherwise(tok(j, base)),
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
