#!/usr/bin/env bash
# Fresh-JVM clean bench session: runs graft.Bench via a direct java
# launch (no sbt between the JVM and the pass) in its own scratch cwd so
# each session's BENCH_DETAIL.json sidecar survives independently.
#
# Usage: clean_bench.sh OUT_DIR [SF_DIR] [CPUS] [ITERS]
set -euo pipefail
OUT=$1
SF=${2:-/root/testdata/sf0.1}
CPUS=${3:-32}
ITERS=${4:-1}
CLASSES=/root/repo/target/scala-2.13/classes
mkdir -p "$OUT"
cd "$OUT"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_ITERS=$ITERS \
exec java $ADD_OPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" graft.Bench
