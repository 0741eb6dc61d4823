#!/usr/bin/env python3
"""Package the engine for ``spark-submit --py-files``.

    python tools/make_pyfiles.py            # -> dist/cdc_tools_spark.zip
    spark-submit --py-files dist/cdc_tools_spark.zip your_job.py

The zip contains only the pure-Python package — no data, no tests — so it
ships to every executor; jobs import ``cdc_tools_spark`` exactly as the
tests do.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "cdc_tools_spark")
OUT = os.path.join(REPO, "dist", "cdc_tools_spark.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(PKG):
            if "__pycache__" in root:
                continue
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                path = os.path.join(root, name)
                zf.write(path, os.path.relpath(path, REPO))
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
