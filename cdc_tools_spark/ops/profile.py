"""Data-profiling operators — the diagnostics a 100-TB pipeline runs
before committing to a partitioning: key-skew / heavy-hitter profiles.

A skewed key is the single most common cause of a stuck shuffle at scale
(one reducer gets the hot key's rows). The profile below is the exact
version — one hash aggregation over the keys (map-side partial combine),
then ONLY the top-k rows (a bounded set) pass through a single-partition
window for rank / cumulative share. The corpus-sized data never sees a
window or a sort; the k-row tail is driver-bounded by construction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def key_profile(df: DataFrame, key_col: str, top_k: int = 20) -> DataFrame:
    """Heavy-hitter profile of ``key_col``: the ``top_k`` most frequent
    keys with absolute count, share of all rows, and cumulative share —
    the table an operator reads to decide whether a join needs salting or
    AQE skew handling.

    Returns ``(rank, <key_col>, n_rows, share, cum_share)`` ordered by
    descending count (ties break to the smallest key, NULL last —
    deterministic, and matching ANSI ``ORDER BY ... NULLS LAST`` so the
    DuckDB oracle agrees; a NULL key is a classic hot key and profiles
    like any other value).

    Scale shape: ``groupBy(key).count()`` is one shuffle with map-side
    partial aggregation (key-cardinality-sized, not corpus-sized); the
    total is a broadcast scalar (no driver round-trip); rank/cum_share
    windows run over the ``top_k`` surviving rows only — the
    single-partition window is bounded by k, never by data size."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("_total"))
    order = [F.desc("n_rows"), F.col(key_col).asc_nulls_last()]
    top = counts.orderBy(*order).limit(top_k).crossJoin(F.broadcast(total))
    # constant-valued but NON-foldable partition key (a foldable literal
    # is pruned from the window spec by the optimizer): the window runs
    # over the top_k surviving rows only (bounded by construction) — the
    # key marks that as intentional instead of tripping WindowExec's
    # no-partition warning on every run (r7: keeps bench/ops logs signal)
    w = Window.partitionBy(
        F.pmod(F.xxhash64(F.col("n_rows")), F.lit(1))
    ).orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn("share", F.round(F.col("n_rows") / F.col("_total"), 6))
        .withColumn(
            "cum_share",
            F.round(
                F.sum("n_rows").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                )
                / F.col("_total"),
                6,
            ),
        )
        .select(
            "rank", key_col, F.col("n_rows").cast("long").alias("n_rows"),
            "share", "cum_share",
        )
    )
