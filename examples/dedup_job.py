#!/usr/bin/env python3
"""Training-data dedup job — the LLM-pipeline companion to replay_job.py.

    spark-submit --py-files dist/cdc_tools_spark.zip \
        examples/dedup_job.py --docs s3://bucket/corpus/documents.parquet \
        --out s3://bucket/corpus/dedup \
        [--threshold 0.5] [--quality] \
        [--incremental s3://bucket/corpus/new_batch.parquet]

Bootstrap mode (default) runs the full-corpus pipeline once:

1. MinHash-LSH discovery (one aggregation for the whole signature matrix,
   band-key equi-join — never all pairs), exact-Jaccard verify on
   candidates only (``neardup_pairs``);
2. transitive clustering over the verified pairs (alternating
   large-star/small-star connected components — ``dedup_clusters``);
3. the keep list: one survivor per cluster — minimum id, or the highest
   quality score with ``--quality`` (BPE-ish token count here; swap in
   your own (doc_id, score) frame);
4. persists three artifacts under ``--out``: the cluster map
   (``clusters/``), the keep list (``keep/``), and the corpus LSH band
   index (``band_index/`` — bucketed for the incremental probe join).

Incremental mode (``--incremental BATCH``) dedups an arriving batch
against the persisted index WITHOUT re-self-joining the corpus: candidate
discovery is a band-key probe join of the batch's bands against
``band_index/`` plus a within-batch join — O(|batch| × matched buckets) —
and the verify stage reads shingles of the batch plus only candidate
corpus docs. Pairs involving the batch are appended to ``pairs/``; rerun
clustering over the accumulated pairs on your compaction cadence.

At 100 TB: every stage here is a hash-partitioned join or aggregation with
map-side partial aggregation; nothing is quadratic in the corpus, no stage
collects data to the driver (the connected-components loop checkpoints
bounded edge frames and reads one scalar checksum per round).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from cdc_tools_spark.ops import dedup as D
from cdc_tools_spark.ops import text as X
from cdc_tools_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="corpus parquet (doc_id, text)")
    ap.add_argument("--out", required=True, help="output root")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--num-hashes", type=int, default=32)
    ap.add_argument("--rows-per-band", type=int, default=4)
    ap.add_argument("--quality", action="store_true",
                    help="quality-ranked representatives (token count)")
    ap.add_argument("--incremental", default=None,
                    help="arriving-batch parquet: probe the persisted index")
    args = ap.parse_args()

    spark = get_spark("dedup-job")
    docs = spark.read.parquet(args.docs)

    if args.incremental:
        new = spark.read.parquet(args.incremental)
        idx = spark.read.parquet(os.path.join(args.out, "band_index"))
        pairs = D.neardup_pairs_incremental(
            new, docs,
            num_hashes=args.num_hashes, rows_per_band=args.rows_per_band,
            threshold=args.threshold, corpus_index=idx,
        )
        pairs.write.mode("append").parquet(os.path.join(args.out, "pairs"))
        D.lsh_band_index(
            new, args.num_hashes, args.rows_per_band
        ).write.mode("append").parquet(os.path.join(args.out, "band_index"))
        print(f"appended batch pairs; re-cluster from {args.out}/pairs on cadence")
        return 0

    pairs = D.neardup_pairs(
        docs, num_hashes=args.num_hashes, rows_per_band=args.rows_per_band,
        threshold=args.threshold,
    )
    pairs.write.mode("overwrite").parquet(os.path.join(args.out, "pairs"))
    pairs = spark.read.parquet(os.path.join(args.out, "pairs"))

    clusters = D.dedup_clusters(docs, pairs)
    clusters.write.mode("overwrite").parquet(os.path.join(args.out, "clusters"))

    if args.quality:
        quality = X.quality_features(docs).select(
            "doc_id", F.col("n_bpe_tokens").cast("double").alias("score")
        )
        keep = D.keep_list_quality(docs, pairs, quality)
    else:
        keep = D.keep_list_transitive(docs, pairs)
    keep.write.mode("overwrite").parquet(os.path.join(args.out, "keep"))

    D.lsh_band_index(docs, args.num_hashes, args.rows_per_band).write.mode(
        "overwrite"
    ).parquet(os.path.join(args.out, "band_index"))

    stats = D.cluster_stats(docs, pairs)
    n = stats.where(F.col("cluster_size") > 1).count()
    print(f"wrote clusters/keep/band_index under {args.out}; {n} non-trivial clusters")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
