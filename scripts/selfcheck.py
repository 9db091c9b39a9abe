#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`,
run `python3 scripts/selfcheck.py /root/testdata/sf0.01 /tmp/verify_out`.

For each query: load the Spark parquet result, run the oracle SQL in DuckDB
against the sf tables, sort columns by name, compare row-by-row (exact for
non-floats; exact too for floats since the engine is designed for bit-equal
determinism — report max abs diff when that fails).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark result dir"); n_fail += 1; continue
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{res_dir}/*.parquet'").df()
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        sdf = spark_df.reindex(sorted(spark_df.columns), axis=1)
        ddf = duck_df.reindex(sorted(duck_df.columns), axis=1)
        ddf.columns = [c for c in ddf.columns]
        if list(sdf.columns) != list(ddf.columns):
            print(f"FAIL {name}: columns spark={list(sdf.columns)} duck={list(ddf.columns)}")
            n_fail += 1; continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
            n_fail += 1; continue
        # compare cell-wise with NaN==NaN
        bad = []
        for c in sdf.columns:
            a, b = sdf[c], ddf[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                bad.append((c, i, a.iloc[i], b.iloc[i], int((~eq).sum())))
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatching cols")
            for c, i, av, bv, n in bad[:5]:
                print(f"  col={c} row={i} spark={av!r} duck={bv!r} ({n} bad)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
            n_pass += 1
    missing = [d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)) and d not in oracles]
    for m in missing:
        print(f"NOORACLE {m} (rows-only check)")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(missing)} without oracle")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
