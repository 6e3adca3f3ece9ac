#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB with
views over <sfDir>/*.parquet, loads the Spark result parquet from
<verifyOutDir>/<name>/, sorts columns by name, and compares values
exactly (with a small report of near-miss float drift). Dev tool only —
the engine itself has no Python dependency.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns differ: oracle={list(exp.columns)} spark={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: row counts differ: oracle={len(exp)} spark={len(got)}")
            n_fail += 1
            continue
        mismatch = []
        for c in exp.columns:
            ev, gv = exp[c], got[c]
            if str(ev.dtype) != str(gv.dtype):
                mismatch.append(f"dtype[{c}]: {ev.dtype} vs {gv.dtype}")
                continue
            if ev.dtype.kind == "f":
                import numpy as np
                e_na, g_na = ev.isna(), gv.isna()
                if not (e_na == g_na).all():
                    mismatch.append(f"nulls[{c}]")
                    continue
                diff = (ev.fillna(0) != gv.fillna(0))
                if diff.any():
                    md = float((ev.fillna(0) - gv.fillna(0)).abs().max())
                    mismatch.append(f"float[{c}]: {int(diff.sum())} rows, maxdiff={md:.3e}")
            else:
                e_na, g_na = ev.isna(), gv.isna()
                if not (e_na == g_na).all() or not (ev.fillna(0) == gv.fillna(0)).all():
                    bad = (ev.astype(str) != gv.astype(str))
                    idx = bad[bad].index[:3].tolist()
                    mismatch.append(
                        f"val[{c}]: {int(bad.sum())} rows, e.g. idx {idx}: "
                        f"oracle={[ev[i] for i in idx]} spark={[gv[i] for i in idx]}")
        if mismatch:
            print(f"FAIL {name}: " + "; ".join(mismatch))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    no_oracle = []
    import os
    for d in sorted(os.listdir(out_dir)):
        if os.path.isdir(f"{out_dir}/{d}") and d not in oracle:
            try:
                n = con.execute(
                    f"SELECT count(*) FROM read_parquet('{out_dir}/{d}/*.parquet')").fetchone()[0]
                no_oracle.append(f"{d}({n} rows)")
            except Exception as e:
                no_oracle.append(f"{d}(READ ERROR {e})")
    print(f"\n{n_pass} pass, {n_fail} fail; rows-only: {', '.join(no_oracle)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
