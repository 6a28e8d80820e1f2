#!/usr/bin/env python3
"""sf1-scale oracle sweep (round-7 VERDICT item 6).

The per-round DuckDB differential runs at sf0.01 (and value-match at
sf0.1); large-scale value drift — long overflow, float accumulation
order, hash-bucket saturation — is invisible there. This tool re-runs
the driver's rows+schema+values compare for a chosen query subset at
~sf1 (the ScaleStress x10 blowup of sf0.1), emitting CORRECTNESS_sf1.json.

Usage: sf1_oracle.py <blowupDir> <verifyOutDir> <outJson> [timeoutSec]

Dev/measurement tool only — the engine itself never depends on Python.
Each DuckDB oracle runs in a child process with a hard timeout so a
quadratic-by-design oracle (q166's pairwise CTE) records "oracle_timeout"
instead of hanging the sweep.
"""
import hashlib
import json
import multiprocessing as mp
import sys
import time
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


def frame_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    h.update("|".join(df.columns).encode())
    for row in df.itertuples(index=False):
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def run_oracle(sf_dir: str, sql: str, q):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
                        if p.is_dir() else
                        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    t0 = time.time()
    want = con.execute(sql).df()
    c = canon(want)
    q.put((len(c), list(c.columns), frame_hash(c), round(time.time() - t0, 1)))


def main(sf_dir: str, out_dir: str, out_json: str, timeout: int,
         merge: bool = False) -> int:
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    results = {}
    n_fail = 0
    for name in sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir()):
        got = canon(pd.read_parquet(Path(out_dir) / name))
        row = {"rows": len(got)}
        if name not in oracle:
            row["status"] = "rows_only"
        else:
            q = mp.Queue()
            proc = mp.Process(target=run_oracle, args=(sf_dir, oracle[name], q))
            proc.start()
            proc.join(timeout)
            if proc.is_alive():
                proc.terminate()
                proc.join()
                row["status"] = "oracle_timeout"
                row["note"] = f"DuckDB oracle exceeded {timeout}s at this scale"
            else:
                try:
                    want_rows, want_cols, want_hash, duck_s = q.get_nowait()
                except Exception:
                    row["status"] = "oracle_error"
                    n_fail += 1
                    results[name] = row
                    print(f"x {name}: oracle crashed")
                    continue
                gh = frame_hash(got)
                row.update(duck_s=duck_s, spark_hash=gh, duck_hash=want_hash)
                if list(got.columns) != want_cols:
                    row["status"] = "schema_mismatch"
                    row["note"] = f"spark={list(got.columns)} duck={want_cols}"
                    n_fail += 1
                elif len(got) != want_rows:
                    row["status"] = "row_mismatch"
                    row["note"] = f"spark={len(got)} duck={want_rows}"
                    n_fail += 1
                elif gh != want_hash:
                    row["status"] = "hash_mismatch"
                    n_fail += 1
                else:
                    row["status"] = "pass"
        results[name] = row
        print(("ok" if row["status"] == "pass" else "x ") + f" {name}: {row}")
    if merge and Path(out_json).exists():
        # --merge (r12 VERDICT item 7): fold this run's rows into the
        # existing record instead of overwriting — used to add the
        # three reference-semantics quadratics at their feasible x3
        # blowup alongside the full-inventory x10 sweep.
        #
        # Provenance rules (r13 ADVICE low): EVERY row carries an
        # explicit per-row sf_dir — rows that predate per-row tagging
        # are stamped with the record's top-level sf_dir before the
        # merge, so no row's scale is ever inferred from the absence of
        # a tag. A merge that REPLACES an existing row with a different
        # status or a different scale warns loudly: silently swapping a
        # passing x10 witness for an x3 one (or a pass for a fail)
        # would corrupt the record's meaning with no trace.
        old = json.loads(Path(out_json).read_text())
        top_sf = old.get("sf_dir", "unknown")
        for k, v in old["queries"].items():
            v.setdefault("sf_dir", top_sf)
        for k, v in results.items():
            v["sf_dir"] = sf_dir
            prev = old["queries"].get(k)
            if prev is not None and (prev.get("status") != v["status"]
                                     or prev.get("sf_dir") != sf_dir):
                print(f"WARN merge replaces {k}: "
                      f"{prev.get('status')}@{prev.get('sf_dir')} -> "
                      f"{v['status']}@{sf_dir}")
            old["queries"][k] = v
        scales = old.setdefault("merged_scales", [])
        if sf_dir not in scales:
            scales.append(sf_dir)
        Path(out_json).write_text(json.dumps(old, indent=1) + "\n")
    else:
        record = {
            "metric": "sf1_oracle",
            "sf_dir": sf_dir,
            "scale_note": "ScaleStress x10 blowup of sf0.1 (~sf1 row counts); rows+schema+hash, 6dp float canon",
            "timeout_s": timeout,
            "queries": results,
        }
        Path(out_json).write_text(json.dumps(record, indent=1) + "\n")
    print(f"\n{sum(1 for r in results.values() if r['status'] == 'pass')} pass, {n_fail} fail -> {out_json}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    argv = [a for a in sys.argv if a != "--merge"]
    sys.exit(main(argv[1], argv[2], argv[3],
                  int(argv[4]) if len(argv) > 4 else 1200,
                  merge="--merge" in sys.argv))
