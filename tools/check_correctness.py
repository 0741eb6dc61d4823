#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run every ``queries()``
entry on Spark and its ``oracle_sql()`` twin on DuckDB at sf0.01, compare
row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None or v != v else str(v))
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from cdc_tools_spark.session import get_spark

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}")
            sys.exit(2)
        qs = {n: f for n, f in qs.items() if n in only}
    failures = []
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
        except Exception as e:
            failures.append(name)
            results[name] = {"status": "fail", "err": f"spark error: {e}"[:500]}
            print(f"FAIL {name}: spark error: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            results[name] = {"status": "rows_only", "spark_rows": int(len(got))}
            print(f"ok?  {name}: rows-only check, {len(got)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            want = normalize(con.execute(sql).df())
        except Exception as e:
            failures.append(name)
            results[name] = {"status": "fail", "err": f"duckdb error: {e}"[:500]}
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        status = []
        if list(got.columns) != list(want.columns):
            status.append(f"schema: spark={list(got.columns)} duck={list(want.columns)}")
        if len(got) != len(want):
            status.append(f"rows: spark={len(got)} duck={len(want)}")
        if not status:
            eq = got.equals(want)
            if not eq:
                # pinpoint mismatching cells
                diff_cols = [
                    c for c in got.columns if not got[c].equals(want[c])
                ]
                status.append(f"values differ in columns {diff_cols}")
                for c in diff_cols[:2]:
                    neq = got[c] != want[c]
                    idx = neq[neq].index[:3]
                    for i in idx:
                        status.append(f"  [{i}] {c}: spark={got[c][i]!r} duck={want[c][i]!r}")
        if status:
            failures.append(name)
            results[name] = {"status": "fail", "err": "; ".join(status)[:500]}
            print(f"FAIL {name}: " + "; ".join(status))
        else:
            results[name] = {
                "status": "pass",
                "rows": int(len(got)),
                "secs": round(time.time() - t0, 1),
            }
            print(f"PASS {name}: {len(got)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} pass")
    out_json = os.environ.get("CHECK_CORRECTNESS_JSON")
    if out_json:
        import json

        with open(out_json, "w") as f:
            json.dump({"sf_dir": sf_dir, "results": results}, f, indent=1)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
