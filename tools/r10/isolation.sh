#!/bin/bash
# Round-10 isolation evidence for the q66-q71 BENCH_r09 drift cluster.
# Reproduces the driver's config: sf0.1, local[32], 128g heap.
set -u
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx100g"
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
cd /root/repo/tools/r10
for rep in 1 2 3; do
  echo "=== isolation rep $rep $(date -u +%H:%M:%S) ==="
  SPARK_GRAFT_ONLY=q66,q67,q68,q69,q70,q71 \
    java $OPTS -cp "$CP" graft.Bench 2>iso_rep$rep.stderr | tail -1
done
for rep in 1 2; do
  echo "=== full run rep $rep $(date -u +%H:%M:%S) ==="
  java $OPTS -cp "$CP" graft.Bench 2>full_rep$rep.stderr | tail -1
done
echo "=== done $(date -u +%H:%M:%S) ==="
