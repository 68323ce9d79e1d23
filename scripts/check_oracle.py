#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the same testdata parquet, load the Verify.scala parquet
output for the query, sort columns by name, and compare values.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("int64") // 1000  # ns -> us
    return df.reset_index(drop=True)


def compare(got: pd.DataFrame, want: pd.DataFrame) -> str | None:
    """None if equal; else a description. Integers exact; floats within
    1e-12 relative (do NOT round large floats — x*1e9 overflows the
    53-bit mantissa and manufactures differences)."""
    if list(got.columns) != list(want.columns):
        return f"columns {list(got.columns)} != {list(want.columns)}"
    if len(got) != len(want):
        return f"rows {len(got)} != {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ok = np.isclose(g.astype("float64"), w.astype("float64"),
                            rtol=1e-12, atol=1e-12, equal_nan=True).all()
        else:
            ok = g.equals(w) or (g.astype(str) == w.astype(str)).all()
        if not ok:
            bad = (g.astype(str) != w.astype(str))
            i = int(np.argmax(bad.values)) if bad.any() else 0
            return f"column {c} differs, e.g. row {i}: {g.iloc[i]!r} != {w.iloc[i]!r}"
    return None


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_bad += 1
            continue
        try:
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        # flag dtype drift the driver's schema/hash compare could trip on
        dtype_note = ""
        for c in got.columns:
            if str(got[c].dtype) != str(want[c].dtype):
                dtype_note = f"  [dtype drift: {c} {got[c].dtype} vs {want[c].dtype}]"
        err = compare(got, want)
        if err:
            print(f"FAIL {name}: {err}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(got)} rows){dtype_note}")
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracles:
            try:
                n = len(pd.read_parquet(p))
                print(f"ROWS {name}: {n} rows{' (EMPTY!)' if n == 0 else ''}")
            except Exception as e:
                print(f"FAIL {name}: unreadable rows-only output: {e}")
                n_bad += 1
    print("ALL OK" if n_bad == 0 else f"{n_bad} FAILURES")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
