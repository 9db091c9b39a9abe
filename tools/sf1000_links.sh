#!/bin/bash
# Fourth-decade (sf1000) materialization for the lineitem-family headline
# queries (BASELINE.md r7): a REAL sf1000 lineitem projects to ~110 GB
# parquet vs ~80 GB free on this host (the measured infeasibility), but
# q_sql_tpch_q1/q6 aggregate over (l_returnflag, l_linestatus) and a
# filtered sum — key cardinality is IRRELEVANT to both plans, so a 10x
# hardlink amplification of the real ScaleGen sf100 lineitem files is
# bit-identical input semantics for those two queries at 6 G rows /
# 110 GB logical scan, with zero additional disk. LIMIT (stated in
# BASELINE.md): the 11 GB physical file set is page-cache-resident after
# the first pass, so the measurement exercises decompression + compute,
# not cold I/O; a real 110 GB set on this 128 GB host would be partially
# cache-resident too, but colder.
# Satellite tables are hardlinked once (sf100-sized) only so
# Sql.register's view registration (schema/footer reads) succeeds; the
# measured queries never scan them.
set -euo pipefail
SRC=${1:-tmp/sf100}
DST=${2:-tmp/sf1000}
COPIES=${3:-10}

mkdir -p "$DST/lineitem.parquet"
for f in "$SRC"/lineitem.parquet/part-*; do
  base=$(basename "$f")
  for i in $(seq 0 $((COPIES - 1))); do
    ln -f "$f" "$DST/lineitem.parquet/copy${i}-${base}"
  done
done
touch "$DST/lineitem.parquet/_SUCCESS"

for t in region nation customer supplier part orders events; do
  if [ -e "$SRC/$t.parquet" ] && [ ! -e "$DST/$t.parquet" ]; then
    cp -al "$SRC/$t.parquet" "$DST/$t.parquet"
  fi
done
echo "done: $(du -sh "$DST" | cut -f1) apparent, physical shared with $SRC"
