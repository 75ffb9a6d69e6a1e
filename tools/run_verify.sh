#!/bin/bash
# Local correctness loop: compile, run graft.Verify on a scale factor, then
# hash-compare every query against its DuckDB oracle (emulates the driver).
# Usage: tools/run_verify.sh [sf_dir] [out_dir] [query_filter]
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/graft_verify}
# Gate on sbt's exit status (the old grep-for-success let a compile
# failure run Verify against stale classes).
COMPILE_LOG=$(mktemp)
if ! sbt -batch compile > "$COMPILE_LOG" 2>&1; then
  echo "[run_verify] compile failed:"
  grep -E '^\[error\]' "$COMPILE_LOG" || tail -20 "$COMPILE_LOG"
  exit 1
fi
rm -rf "$OUT"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
java $ADD_OPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/opt/spark/jars/*:target/scala-2.13/classes" \
  graft.Verify "$SF" "$OUT"
python3 tools/oracle_check.py "$SF" "$OUT" "$3"
