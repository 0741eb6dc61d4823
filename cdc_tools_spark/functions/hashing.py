"""Vectorized hashing — the engine's only Python-side data touchpoint.

BASELINE.json requires the per-row parity invariant ``sha256(content)`` and
"zero per-row Python". Two implementations with identical output:

* :func:`sha256_hex` — ``F.sha2(col, 256)``: pure JVM, whole-stage codegen,
  the hot-path default.
* :func:`sha256_hex_pandas` — an Arrow-batched pandas UDF computing the same
  digest with :mod:`hashlib`. This is the required vectorized-UDF surface
  (and the template for payload-decode UDFs): data crosses the JVM↔Python
  boundary once per Arrow batch, never per row. Tests assert it matches
  ``sha2`` bit-for-bit, proving the Python boundary is loss-free.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def sha256_hex(col: Column | str) -> Column:
    """JVM-side sha256 hex digest (whole-stage codegen; prefer in hot paths)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c.cast("string"), 256)


# returnType as a DataType object (not a DDL string): DDL parsing would
# require an active SparkContext at import time.
@pandas_udf(StringType())
def sha256_hex_pandas(s: pd.Series) -> pd.Series:
    # One Arrow batch in, one out; hashlib per element inside the batch —
    # no JVM↔Python round-trip per row (the reference's per-row dictionary
    # marshalling, ChangeRecord.cs:23, is exactly what this avoids).
    return s.map(
        lambda v: None if v is None else hashlib.sha256(str(v).encode("utf-8")).hexdigest()
    )


def change_key(*cols: str, sep: str = "|") -> Column:
    """The reference's flattened ChangeKey: PK values joined with '|' in
    ordinal order (CdcRepository.cs:99-105). Display/hash form only — the
    engine keys on the raw columns."""
    return F.concat_ws(sep, *[F.col(c) for c in cols])
