#!/usr/bin/env python3
"""Local oracle-parity harness (developer tool, NOT part of the library).

Mirrors the driver's correctness gate: for each result parquet written by
`graft.Verify`, run the corresponding oracle SQL from oracle_sql.json in
DuckDB over the same source tables, canonicalize both sides (columns
sorted by name, rows sorted by all columns), and diff EXACTLY.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify to dodge dtype mismatches (int32 vs int64 etc.) the same
    # way a value-hash would; floats via repr (exact round-trip).
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(float(v)) if isinstance(v, float) else repr(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir, out_dir = Path(sys.argv[1]), Path(sys.argv[2])
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # Bound DuckDB for the builder's sf0.1 sweeps: the default limit
    # (80% of RAM = ~100 GB here) let the 0.9G-pair head-ranking chain
    # balloon resident before spilling, and the spill then filled the
    # disk. A firm limit + a dedicated temp dir keeps the big oracle
    # queries in streaming/spill discipline. Overridable via env.
    import os
    con.execute(f"SET memory_limit='{os.environ.get('PARITY_MEM', '48GB')}'")
    tmp = os.environ.get("PARITY_TMP", "/tmp/duck_parity_tmp")
    Path(tmp).mkdir(parents=True, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.is_dir():  # Spark-written table: a directory of part files
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = out_dir / name
        if not res_dir.exists():
            print(f"MISS {name}: no result parquet")
            n_fail += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df())
            want = canon(con.execute(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {e}")
            n_fail += 1
            continue
        if got.equals(want):
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: spark {got.shape} vs oracle {want.shape}")
            if list(got.columns) != list(want.columns):
                print(f"  cols spark={list(got.columns)} oracle={list(want.columns)}")
            else:
                neq = (got != want).any(axis=1)
                both = pd.concat(
                    [got[neq].head(3).add_prefix("s_"), want[neq].head(3).add_prefix("o_")],
                    axis=1)
                print(both.to_string())
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
