"""S6: keyset pagination — resumable tuple-inequality paging, no OFFSET.

The reference's full load reads the source table in key-ordered pages:
``SELECT TOP {n} * FROM <T> WHERE pk1 > @p1 AND ... ORDER BY pks``
(FullLoadRepository.cs:68-110; query builder
TableSchemaQueryBuilder.cs:40-57) so an interrupted export resumes from the
last key instead of re-scanning an OFFSET. Spark's distributed snapshot
scan subsumes paging for *throughput* (SURVEY §2.1), but the operator is
part of the reference's user-facing surface — driver-side cursoring,
bounded previews, resumable key-ordered exports — so it exists first-class:

* the cursor predicate is the composite lexicographic tuple inequality
  ``(k1 > c1) OR (k1 = c1 AND k2 > c2) OR ...`` — plain comparisons on the
  key columns, so Catalyst pushes it into the parquet scan (sargable, the
  same property the reference's ``OPTION(RECOMPILE)`` query has on the PK
  index);
* ``ORDER BY keys LIMIT n`` plans as ``TakeOrderedAndProject`` — a per-
  partition top-n plus one bounded driver merge, never a global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def keyset_predicate(key_cols: Sequence[str], after: Sequence) -> Column:
    """Lexicographic ``(key_cols...) > (after...)`` as a Column."""
    if len(after) != len(key_cols):
        raise ValueError(
            f"cursor arity {len(after)} != key arity {len(key_cols)}"
        )
    cond: Column | None = None
    eq: Column | None = None
    for c, v in zip(key_cols, after):
        gt = F.col(c) > F.lit(v)
        branch = gt if eq is None else eq & gt
        cond = branch if cond is None else cond | branch
        e = F.col(c) == F.lit(v)
        eq = e if eq is None else eq & e
    return cond


def keyset_page(
    df: DataFrame,
    key_cols: Sequence[str],
    after: Sequence | None = None,
    page_size: int = 1000,
) -> DataFrame:
    """One key-ordered page strictly after the ``after`` cursor (None =
    first page). The caller's resume cursor is the last row's key tuple —
    the reference's ``FullLoadBatch.LastRowKey``."""
    out = df
    if after is not None:
        out = out.where(keyset_predicate(key_cols, after))
    return out.orderBy(*[F.col(c) for c in key_cols]).limit(page_size)
