"""Similarity search over embedding columns (``array<float>``).

* :func:`cosine_pairs` / :func:`topk_cosine` — brute-force exact baseline.
  All arithmetic in double precision via JVM higher-order functions
  (``zip_with`` + ``aggregate``) — no UDF, no Python.
* :func:`lsh_buckets` / :func:`topk_cosine_lsh` — random-hyperplane LSH:
  the scale path. Hyperplane weights are ±1 derived from md5 (deterministic
  and reproducible in SQL for the oracle). Candidates = vectors sharing a
  bucket signature; exact cosine only within buckets.

At 100 TB the brute-force path is O(n²) and exists as the verifier/oracle;
LSH bucket size controls the candidate-join fan-out, and the bucket join is
an equi-join on the signature (shuffle on bucket key, AQE-skew-safe).
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    ad, bd = _as_double(a), _as_double(b)
    return dot(ad, bd) / (norm(ad) * norm(bd))


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (a < b) pairs with cosine ≥ threshold — embedding near-dup set."""
    a = df.select(F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("vb"))
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"),
    ).where(F.col("cos") >= threshold)


def topk_cosine(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries: DataFrame | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (brute force).

    Deterministic ranking: (rounded cosine desc, neighbor id asc)."""
    from pyspark.sql import Window

    base = df.select(F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("vb"))
    qs = (queries or df).select(
        F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("va")
    )
    pairs = qs.crossJoin(base).where(F.col("id_a") != F.col("id_b"))
    scored = pairs.select(
        "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos")
    )
    w = Window.partitionBy("id_a").orderBy(F.col("cos").desc(), F.col("id_b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("id_a", "id_b", "cos", F.col("rank").cast("long").alias("rank"))
    )


def hyperplanes(num_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes: weight[p][d] = +1 iff the first md5
    nibble of 'p:d' is odd. Reproducible in any engine with md5."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            nibble = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0], 16)
            row.append(1 if nibble % 2 == 1 else -1)
        planes.append(row)
    return planes


def lsh_buckets(
    df: DataFrame,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) — bucket = sign-bit string of the hyperplane projections."""
    planes = hyperplanes(num_planes, dim)
    vd = _as_double(F.col(vec_col))
    bits = []
    for row in planes:
        plane = F.array(*[F.lit(float(w)) for w in row])
        bits.append(F.when(dot(vd, plane) > 0, F.lit("1")).otherwise(F.lit("0")))
    return df.select(F.col(id_col), F.concat(*bits).alias("bucket"))


def topk_cosine_lsh(
    df: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine ranking within LSH buckets only."""
    from pyspark.sql import Window

    buckets = lsh_buckets(df, num_planes, dim, id_col, vec_col)
    vecs = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v")).join(
        buckets, id_col
    )
    a = vecs.select(
        F.col(id_col).alias("id_a"), F.col("v").alias("va"), F.col("bucket")
    )
    b = vecs.select(
        F.col(id_col).alias("id_b"), F.col("v").alias("vb"), F.col("bucket")
    )
    pairs = a.join(b, "bucket").where(F.col("id_a") != F.col("id_b"))
    scored = pairs.select(
        "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos")
    ).dropDuplicates(["id_a", "id_b"])
    w = Window.partitionBy("id_a").orderBy(F.col("cos").desc(), F.col("id_b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("id_a", "id_b", "cos", F.col("rank").cast("long").alias("rank"))
    )
