#!/usr/bin/env python3
"""Local dev mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the
fixture parquet tables registered as views, loads the Spark-written parquet
result for the same query name, sorts columns by name in both, and compares.
NOT shipped code — dev harness only (duckdb/pandas are driver-side libs).
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df


def cell_eq(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return abs(af - bf) <= 1e-9 * max(1.0, abs(af), abs(bf))
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
        if a is None or b is None:
            return a == b
        return len(a) == len(b) and all(cell_eq(x, y) for x, y in zip(a, b))
    if a is None or b is None or a is pd.NaT or b is pd.NaT:
        return (a is None or a is pd.NaT) and (b is None or b is pd.NaT)
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> str:
    got, exp = canon(got), canon(exp)
    if list(got.columns) != list(exp.columns):
        return f"SCHEMA MISMATCH spark={list(got.columns)} oracle={list(exp.columns)}"
    if len(got) != len(exp):
        return f"ROWCOUNT MISMATCH spark={len(got)} oracle={len(exp)}"
    for i in range(len(got)):
        for c in got.columns:
            a, b = got[c].iloc[i], exp[c].iloc[i]
            if not cell_eq(a, b):
                return f"VALUE MISMATCH row {i} col {c}: spark={a!r} oracle={b!r}"
    return "OK"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    only = set(sys.argv[3:])
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        parts = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not parts:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            got = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_bad += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        verdict = compare(name, got, exp)
        if verdict == "OK":
            n_ok += 1
            print(f"OK   {name}")
        else:
            n_bad += 1
            print(f"FAIL {name}: {verdict}")
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
