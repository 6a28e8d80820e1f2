#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB differential oracle.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each query parquet written by graft.Verify, runs the corresponding
oracle SQL from oracle_sql.json in DuckDB (with each fixture table
registered as a view over the parquet file), sorts columns by name,
formats floats through a fixed decimal format, and compares row-wise.
Dev tool only — the engine itself never depends on Python.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def fmt(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)

    return df.apply(lambda col: col.map(fmt))


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir()):
        got = pd.read_parquet(Path(out_dir) / name)
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"✗ {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        cg, cw = canon(got), canon(want)
        if list(cg.columns) != list(cw.columns):
            print(f"✗ {name}: columns differ: spark={list(cg.columns)} duck={list(cw.columns)}")
            n_fail += 1
        elif len(cg) != len(cw):
            print(f"✗ {name}: row count {len(cg)} vs {len(cw)}")
            n_fail += 1
        elif not cg.reset_index(drop=True).equals(cw.reset_index(drop=True)):
            diff = (cg.reset_index(drop=True) != cw.reset_index(drop=True)).any(axis=1)
            i = diff.idxmax()
            print(f"✗ {name}: first diff at row {i}:\n  spark={cg.iloc[i].to_dict()}\n  duck ={cw.iloc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"✓ {name}: {len(cg)} rows")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
