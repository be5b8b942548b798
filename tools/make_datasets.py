"""Regenerate the bundled sample-dataset parquet files from the published
CSVs the reference ships (public data; see datasets.py).  Run once::

    python tools/make_datasets.py
"""

from __future__ import annotations

import os

import pandas as pd

SRC = "/root/reference/src/petropandas/data"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "petropandas_spark", "data")


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    for name in ("avgpelite", "bulk", "grt_profile", "minerals", "sazava"):
        df = pd.read_csv(os.path.join(SRC, f"{name}.csv"))
        df.to_parquet(os.path.join(OUT, f"{name}.parquet"), index=False)
        print(f"{name}: {len(df)} rows, {len(df.columns)} cols")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
