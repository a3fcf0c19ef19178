#!/usr/bin/env python3
"""Zip the text_search_spark package for spark-submit --py-files.

    python scripts/package.py        # -> dist/text_search_spark.zip

Pure-Python package, no compiled artifacts — the zip imports directly on
executors (Spark adds --py-files zips to sys.path)."""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "text_search_spark")
OUT = os.path.join(ROOT, "dist", "text_search_spark.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(PKG):
            _dirs.sort()  # deterministic entry order -> reproducible zip
            if "__pycache__" in dirpath:
                continue
            for f in sorted(files):
                # .json = model/data artifacts (e.g. langid weights),
                # read zip-safely via importlib.resources
                if not f.endswith((".py", ".json")):
                    continue
                full = os.path.join(dirpath, f)
                z.write(full, os.path.relpath(full, ROOT))
    print(OUT)


if __name__ == "__main__":
    main()
