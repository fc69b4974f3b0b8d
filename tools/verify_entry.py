"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at the given SF dir and compares
row-count + sorted-column value frame against oracle_sql() via DuckDB.

Usage: python tools/verify_entry.py [sf_dir] [--only SUBSTR[,SUBSTR...]]

--only runs just the entries whose name contains any given substring
(fast per-entry verify stamps while iterating; the full run stays the
round gate).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from ckanext_extractor_spark.session import get_spark


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(list(pdf.columns), ignore_index=True)
    return pdf


def main() -> int:
    args = list(sys.argv[1:])
    only: list[str] = []
    if "--only" in args:
        i = args.index("--only")
        only = [s for s in args[i + 1].split(",") if s]
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    spark = get_spark("verify-entry", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in ("documents", "embeddings", "region", "nation", "customer",
              "supplier", "part", "orders", "lineitem", "events"):
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        except duckdb.Error:
            pass

    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in entrymod.queries().items():
        if only and not any(s in name for s in only):
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(spdf)} rows")
            if len(spdf) == 0:
                failures.append((name, "0 rows (rows-only check)"))
            continue
        try:
            opdf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            continue
        a, b = normalize(spdf), normalize(opdf)
        if list(a.columns) != list(b.columns):
            failures.append((name, f"schema mismatch {list(a.columns)} vs {list(b.columns)}"))
            print(f"FAIL {name}: schema {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append((name, f"rowcount {len(a)} vs {len(b)}"))
            print(f"FAIL {name}: rowcount {len(a)} vs {len(b)}")
            continue
        try:
            b2 = b.astype(a.dtypes.to_dict())
        except Exception:
            b2 = b
        eq = True
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                import numpy as np

                if not np.allclose(
                    a[c].to_numpy(dtype=float),
                    b2[c].to_numpy(dtype=float),
                    rtol=1e-9, atol=1e-9, equal_nan=True,
                ):
                    eq = False
            elif not a[c].equals(b2[c]):
                eq = False
            if not eq:
                failures.append((name, f"value mismatch in column {c}"))
                print(f"FAIL {name}: column {c} differs")
                print("spark:", a.head(5).to_dict("records"))
                print("duck :", b2.head(5).to_dict("records"))
                break
        if eq:
            print(f"PASS {name}: {len(a)} rows")
    print(f"\n{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
