#!/usr/bin/env python3
"""Local dev mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the
fixture parquet tables registered as views, loads the Spark-written parquet
result for the same query name, sorts columns by name in both, row-sorts by
every column (exactly like the driver — so unsortable cells such as numpy
arrays FAIL here too), and compares EXACTLY:

  - no float tolerance: float cells must be bit-equal (the driver hashes);
  - dtype drift is an error: Decimal vs float64, int64 vs float64, date vs
    Timestamp all FAIL even when the values are numerically equal, because
    the driver's value hash covers the representation. (Round-1 lesson:
    a 1e-9 tolerance here shipped 11 queries that the driver hash-failed.)

NOT shipped code — dev harness only (duckdb/pandas are driver-side libs).
"""
import datetime
import decimal
import glob
import json
import math
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # The driver lex-sorts rows over all columns before hashing; replicate it
    # so cells that cannot be sorted/hashed (lists, ndarrays) fail locally
    # the same way they fail the driver's comparator.
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def kind(v) -> str:
    """Representation class of one cell — mismatching classes hash apart."""
    if v is None or v is pd.NaT:
        return "null"
    if isinstance(v, (bool, np.bool_)):
        return "bool"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "nan" if math.isnan(v) else "float"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, (pd.Timestamp, np.datetime64, datetime.datetime)):
        return "timestamp"
    if isinstance(v, datetime.date):
        return "date"
    if isinstance(v, str):
        return "str"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "list"
    return type(v).__name__


def cell_eq(a, b) -> bool:
    ka, kb = kind(a), kind(b)
    if ka != kb:
        return False
    if ka in ("null", "nan"):
        return True
    if ka == "float":
        return float(a) == float(b)  # exact, no tolerance
    if ka == "list":
        a, b = list(a), list(b)
        return len(a) == len(b) and all(cell_eq(x, y) for x, y in zip(a, b))
    if ka == "timestamp":
        return pd.Timestamp(a) == pd.Timestamp(b)
    return a == b


def dtype_ok(a, b) -> bool:
    sa, sb = str(a), str(b)
    if sa == sb:
        return True
    # datetime64 resolution (ns vs us) differs between pyarrow and duckdb
    # bridges; values still compare exactly — tolerated at dtype level.
    if sa.startswith("datetime64") and sb.startswith("datetime64"):
        return True
    # Integer WIDTH is not hashed by the driver (r1 evidence: q_win_rownum
    # et al. pass with Spark int32 vs DuckDB int64) — int-vs-float is.
    if sa.startswith("int") and sb.startswith("int"):
        return True
    return False


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> str:
    if sorted(got.columns) != sorted(exp.columns):
        return (f"SCHEMA MISMATCH spark={sorted(got.columns)} "
                f"oracle={sorted(exp.columns)}")
    if len(got) != len(exp):
        return f"ROWCOUNT MISMATCH spark={len(got)} oracle={len(exp)}"
    try:
        got, exp = canon(got), canon(exp)
    except Exception as e:
        return f"UNSORTABLE OUTPUT (driver comparator would error): {e}"
    for c in got.columns:
        if not dtype_ok(got[c].dtype, exp[c].dtype):
            return (f"DTYPE DRIFT col {c}: spark={got[c].dtype} "
                    f"oracle={exp[c].dtype}")
    for i in range(len(got)):
        for c in got.columns:
            a, b = got[c].iloc[i], exp[c].iloc[i]
            if not cell_eq(a, b):
                return (f"VALUE MISMATCH row {i} col {c}: spark={a!r} "
                        f"({kind(a)}) oracle={b!r} ({kind(b)})")
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
            got = pd.concat([pd.read_parquet(p) for p in parts],
                            ignore_index=True)
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
