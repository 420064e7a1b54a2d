#!/bin/bash
# A/B: default ReservedCodeCacheSize (240MB) vs 512MB, 8 full reps each.
# Per-query JVM telemetry (gc/jit/code-cache deltas) on stderr.
set -u
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
BASE="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx100g"
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
cd /root/repo/tools/r10
for rep in 1 2 3 4 5 6 7 8; do
  echo "=== A(default-cc) rep $rep $(date -u +%H:%M:%S) ==="
  java $BASE -cp "$CP" graft.Bench 2>ccA_rep$rep.stderr | tail -1
done
for rep in 1 2 3 4 5 6 7 8; do
  echo "=== B(512m-cc) rep $rep $(date -u +%H:%M:%S) ==="
  java $BASE -XX:ReservedCodeCacheSize=512m -cp "$CP" graft.Bench 2>ccB_rep$rep.stderr | tail -1
done
echo "=== ab done $(date -u +%H:%M:%S) ==="
