#!/bin/bash
# Third-decade sweep for the pair-family frontier: fresh-JVM bench of the
# named queries at each scale fixture, heap sized per decade.
# Usage: tools/decade_sweep.sh [n]
set -e
cd /root/repo
N=${1:-3}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run() { # sf_dir xmx shuffle_partitions query
  echo "== $4 @ $1 (xmx=$2 shufP=$3) =="
  SPARK_GRAFT_SHUFFLE_PARTITIONS=$3 java $ADD_OPENS -Xmx$2 \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/opt/spark/jars/*:target/scala-2.13/classes" \
    graft.BenchOne "$4" "$1" "$N" 2>/dev/null | grep -E "run[0-9]:" || true
}
# Shuffle width sized to the decade (the 100 TB sizing rule): per-task
# build/state must not grow with the corpus.
for q in q36_dedup_ngram_jaccard q151_setsim_prefix q218_media_neardup q220_crossmodal_align; do
  run /root/repo/scaledata/sf1x   12g 32  "$q"
  run /root/repo/scaledata/sf10x  24g 64  "$q"
  run /root/repo/scaledata/sf100x 56g 256 "$q"
done
