"""Merge tabular reports (the reference utils/merge_excel.py:1-23 surface).

Concatenates CSV (and Excel when an engine is available) files with a
`source` column added; used to consolidate per-shard / per-package QA
reports from the data factory.
"""

from __future__ import annotations

import argparse
import os
from typing import List


def merge_tables(paths: List[str], out_path: str) -> int:
    import pandas as pd

    frames = []
    for p in paths:
        df = pd.read_excel(p) if p.endswith((".xlsx", ".xls")) else pd.read_csv(p)
        df["source"] = os.path.basename(p)
        frames.append(df)
    merged = pd.concat(frames, ignore_index=True)
    if out_path.endswith((".xlsx", ".xls")):
        try:
            merged.to_excel(out_path, index=False)
        except Exception:  # no openpyxl in this image
            out_path = os.path.splitext(out_path)[0] + ".csv"
            merged.to_csv(out_path, index=False)
    else:
        merged.to_csv(out_path, index=False)
    return len(merged)


def main():
    ap = argparse.ArgumentParser(description="merge CSV/Excel reports")
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    n = merge_tables(args.inputs, args.out)
    print(f"{n} rows → {args.out}")


if __name__ == "__main__":
    main()
