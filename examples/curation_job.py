#!/usr/bin/env python3
"""Corpus curation job — the quality/contamination companion to
dedup_job.py: everything between raw ingest and the dedup/chunk/split
stages of a training-data pipeline.

    spark-submit --py-files dist/cdc_tools_spark.zip \
        examples/curation_job.py --docs s3://bucket/corpus/documents.parquet \
        --out s3://bucket/corpus/curation \
        [--benchmarks s3://bucket/eval/eval_docs.parquet] \
        [--min-shared 13] [--max-gram-freq 1000] \
        [--min-tokens 30] [--max-top-bigram-frac 0.2] \
        [--max-dup-trigram-frac 0.3]

Stages (each an independent, restartable write under ``--out``):

1. ``quality/`` — per-doc quality features (lengths, stopword/uniqueness
   ratios) JOINED with Gopher-style repetition signals (top-bigram
   dominance, duplicate-trigram occupancy) and the pass/fail verdict from
   the thresholds above;
2. ``vocab/`` — corpus vocabulary (occurrences + exact document
   frequency) for tokenizer training / coverage checks;
3. ``contamination/`` — with ``--benchmarks``: the shared-n-gram
   decontamination keep list (GPT-3's rule; default ``--min-shared 13``
   matches the published 13-gram filter — the oracle fixtures use smaller
   thresholds only because their docs are 60 tokens long) plus the
   pair-level evidence table for auditing.

At 100 TB: every stage is one explode + hash aggregations with map-side
partials, or a frequency-capped equi-join on gram values. Nothing is
quadratic, nothing collects to the driver. The contamination join's skew
cap (``--max-gram-freq``) deterministically drops boilerplate grams that
would otherwise form one giant join group.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from cdc_tools_spark.ops.dedup import contamination_overlap, decontaminate  # noqa: E402
from cdc_tools_spark.ops.text import (  # noqa: E402
    quality_features,
    repetition_features,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--benchmarks", default=None)
    ap.add_argument("--min-shared", type=int, default=13)
    ap.add_argument("--max-gram-freq", type=int, default=1000)
    ap.add_argument("--min-tokens", type=int, default=30)
    ap.add_argument("--max-top-bigram-frac", type=float, default=0.2)
    ap.add_argument("--max-dup-trigram-frac", type=float, default=0.3)
    ap.add_argument("--cores", type=int, default=0)
    args = ap.parse_args()

    builder = SparkSession.builder.appName("curation-job")
    if args.cores:
        builder = builder.master(f"local[{args.cores}]").config(
            "spark.sql.shuffle.partitions", str(4 * args.cores)
        )
    spark = builder.getOrCreate()
    docs = spark.read.parquet(args.docs)

    quality = quality_features(docs).join(repetition_features(docs), "doc_id")
    verdict = quality.withColumn(
        "passes",
        (F.col("n_tokens") >= args.min_tokens)
        & (F.col("top_bigram_frac") <= args.max_top_bigram_frac)
        & (F.col("dup_trigram_frac") <= args.max_dup_trigram_frac),
    )
    verdict.write.mode("overwrite").parquet(os.path.join(args.out, "quality"))

    from cdc_tools_spark.ops.text import tokens

    vocab = (
        docs.select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("token")
        .agg(
            F.sum("c").cast("long").alias("n_occurrences"),
            F.count(F.lit(1)).cast("long").alias("doc_freq"),
        )
    )
    vocab.write.mode("overwrite").parquet(os.path.join(args.out, "vocab"))

    if args.benchmarks:
        bench = spark.read.parquet(args.benchmarks)
        keep = decontaminate(
            docs, bench, min_shared=args.min_shared,
            max_gram_freq=args.max_gram_freq,
        )
        keep.write.mode("overwrite").parquet(
            os.path.join(args.out, "contamination", "keep")
        )
        evidence = contamination_overlap(
            docs, bench, min_shared=args.min_shared,
            max_gram_freq=args.max_gram_freq,
        )
        evidence.write.mode("overwrite").parquet(
            os.path.join(args.out, "contamination", "evidence")
        )
        flagged = keep.where(~F.col("kept")).count()
        print(f"contamination: {flagged} docs flagged")

    print(f"curation artifacts written under {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
