#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Loads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB against views over the
same sf parquet tables, and compares values exactly (rows sorted, columns
sorted by name). Dev-tool only — the engine itself has no Python deps.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True) if len(df) else df
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        try:
            got = norm(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf())
            exp = norm(con.execute(oracle[name]).fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        if got.shape != exp.shape:
            print(f"FAIL {name}: shape {got.shape} vs {exp.shape}")
            n_fail += 1
            continue
        bad_dtype = [c for c in got.columns if str(got[c].dtype) != str(exp[c].dtype)]
        if bad_dtype:
            print(f"WARN {name}: dtype diff "
                  f"{[(c, str(got[c].dtype), str(exp[c].dtype)) for c in bad_dtype]}")
        eq = got.astype(str).equals(exp.astype(str))
        if eq:
            print(f"PASS {name} ({got.shape[0]} rows)")
            n_pass += 1
        else:
            diff = (got.astype(str) != exp.astype(str)).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: value mismatch, e.g. rows {list(idx)}")
            for i in idx:
                print(f"  got {got.loc[i].to_dict()}")
                print(f"  exp {exp.loc[i].to_dict()}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
