#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf_dir
tables, and compares: schema (column names sorted), row count, and a
hash of values (rows sorted, columns sorted by name, floats rounded).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize temporal / decimal-ish types to comparable forms
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        # float-tolerant elementwise compare
        ok = True
        for c in got.columns:
            g, e = got[c], exp[c]
            if pd.api.types.is_float_dtype(g) and pd.api.types.is_float_dtype(e):
                import numpy as np
                if not np.allclose(g.fillna(1e999), e.fillna(1e999), rtol=0, atol=1e-9):
                    bad = (g - e).abs().idxmax()
                    print(f"FAIL {name}: col {c} differs, e.g. row {bad}: {g[bad]} vs {e[bad]}")
                    ok = False
                    break
            else:
                if not g.astype(str).equals(e.astype(str)):
                    diff = g.astype(str) != e.astype(str)
                    i = diff.idxmax()
                    print(f"FAIL {name}: col {c} differs at row {i}: {g[i]!r} vs {e[i]!r}")
                    ok = False
                    break
        if ok:
            # exact-hash check too (what the driver actually does)
            import hashlib
            hg = hashlib.md5(got.to_csv(index=False).encode()).hexdigest()
            he = hashlib.md5(exp.to_csv(index=False).encode()).hexdigest()
            tag = "PASS" if hg == he else "PASS(~)"  # ~ = allclose but not hash-equal
            print(f"{tag} {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
