#!/usr/bin/env python3
"""Tokenize-and-pack job — the last mile of the training-data pipeline:
everything between a curated/deduped corpus and the sequences a trainer
reads.

    spark-submit --py-files dist/cdc_tools_spark.zip \
        examples/tokenize_pack_job.py --docs s3://bucket/corpus/documents.parquet \
        --out s3://bucket/corpus/packed \
        [--keep s3://bucket/corpus/dedup/keep] \
        [--num-merges 32] [--chunk-tokens 512] [--overlap 64] \
        [--seq-len 2048] [--n-shards 512]

Stages (each an independent, restartable write under ``--out``):

1. ``bpe/`` — the learned BPE merge table (Sennrich 2016: the corpus is
   read ONCE into word-type frequencies; every merge round is vocab-sized)
   plus the initial pair statistics for audit — exported for the
   trainer's tokenizer;
2. ``splits/`` — deterministic per-doc train/val/test assignment (md5 on
   id: stable under corpus growth — a doc never migrates);
3. ``chunks/`` — fixed-size token windows with overlap, over the TRAIN
   split only (val/test docs must never reach the training packs —
   packing after the split is what keeps held-out text out, and a
   post-hoc filter would invalidate every pack's prefix sum);
4. ``packs/`` — shard-local concat-and-split sequence packing of the
   train chunks, written ``partitionBy(shard)`` so a trainer (or a
   repack of one shard) reads exactly the shard directories it owns.

Units: chunking and packing count WHITESPACE tokens (the engine's
canonical tokenization), not BPE tokens — pick ``--chunk-tokens`` /
``--seq-len`` with your tokenizer's fertility factor in mind (BPE
tokens per word, readable off ``bpe/pair_counts`` vs the vocab) if the
trainer consumes at a BPE context length.

At 100 TB: BPE iterates over word TYPES, not the corpus; chunking is a
shuffle-free array projection; packing windows within hash shards only
(``--n-shards`` is the parallelism knob — size shards to one task's
sort budget), so no stage plans a global order, a cartesian, or a
driver-side collect beyond BPE's one argmax row per merge.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from cdc_tools_spark.ops.text import (  # noqa: E402
    bpe_pair_counts,
    bpe_train,
    chunk_documents,
    hash_split,
    pack_sequences,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--keep", default=None,
                    help="optional keep-list parquet (doc_id, kept) from dedup_job")
    ap.add_argument("--num-merges", type=int, default=32)
    ap.add_argument("--chunk-tokens", type=int, default=512)
    ap.add_argument("--overlap", type=int, default=64)
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--n-shards", type=int, default=512)
    ap.add_argument("--cores", type=int, default=0)
    args = ap.parse_args()

    builder = SparkSession.builder.appName("tokenize-pack-job")
    if args.cores:
        builder = builder.master(f"local[{args.cores}]").config(
            "spark.sql.shuffle.partitions", str(4 * args.cores)
        )
    spark = builder.getOrCreate()
    docs = spark.read.parquet(args.docs)
    if args.keep:
        keep = spark.read.parquet(args.keep).where("kept").select("doc_id")
        docs = docs.join(keep, "doc_id")  # survivors only

    bpe_pair_counts(docs).write.mode("overwrite").parquet(
        os.path.join(args.out, "bpe", "pair_counts")
    )
    merges = bpe_train(docs, num_merges=args.num_merges)
    merges.write.mode("overwrite").parquet(os.path.join(args.out, "bpe", "merges"))

    splits = hash_split(docs)
    splits.write.mode("overwrite").parquet(os.path.join(args.out, "splits"))
    train_docs = docs.join(
        spark.read.parquet(os.path.join(args.out, "splits"))
        .where(F.col("split") == "train")
        .select("doc_id"),
        "doc_id",
    )

    chunks = chunk_documents(
        train_docs, chunk_tokens=args.chunk_tokens, overlap=args.overlap
    )
    chunks.write.mode("overwrite").parquet(os.path.join(args.out, "chunks"))

    packs = pack_sequences(
        spark.read.parquet(os.path.join(args.out, "chunks")),
        seq_len=args.seq_len,
        n_shards=args.n_shards,
    )
    packs.write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(args.out, "packs")
    )

    n_packs = (
        spark.read.parquet(os.path.join(args.out, "packs"))
        .agg(F.count_distinct("shard", "pack_id"))
        .collect()[0][0]
    )
    print(f"packed {n_packs} sequences of {args.seq_len} tokens under {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
