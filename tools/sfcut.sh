#!/bin/bash
# Cut an intermediate scale factor out of a larger ScaleGen table by key
# range (BASELINE.md r7, state-store crossover): ScaleGen builds sfN*10
# from sfN as 10 key-shifted copies at a known step, so "the first k of
# 10 copies" — an exact sf(N*k) in rows, key ranges, and referential
# slices — is a pure filter `shifted_key < k * step`. Used to locate the
# heap state store's OOM cliff between sf100 and sf1000 (sf300 = first 3
# copies of the sf1000 events at step 1e12) without another generation
# chain. DuckDB (driver-side tooling) does the cut so no Spark/sbt lock
# is needed; PER_THREAD_OUTPUT keeps the directory-of-part-files layout
# the streaming source expects (a single parquet FILE would route
# StreamRunner into its small-dir memory-sink sanity block, which
# collects outputs on the driver and would poison a at-scale run).
#
# Usage: tools/sfcut.sh <src_table_dir> <dst_table_dir> <key_col> <k> <step>
# e.g.:  tools/sfcut.sh tmp/sf1000/events.parquet tmp/sf300/events.parquet event_id 3 1000000000000
set -euo pipefail
SRC=$1; DST=$2; KEY=$3; K=$4; STEP=$5
mkdir -p "$(dirname "$DST")"
python3 - "$SRC" "$DST" "$KEY" "$K" "$STEP" <<'EOF'
import sys, duckdb
src, dst, key, k, step = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]), int(sys.argv[5])
con = duckdb.connect()
con.sql("SET threads=16; SET preserve_insertion_order=false;")
con.sql(f"""COPY (SELECT * FROM '{src}/*.parquet' WHERE {key} < {k * step})
            TO '{dst}' (FORMAT PARQUET, COMPRESSION SNAPPY,
                        ROW_GROUP_SIZE 1000000, PER_THREAD_OUTPUT TRUE)""")
print(duckdb.sql(f"SELECT count(*) FROM '{dst}/*.parquet'").fetchone())
EOF
