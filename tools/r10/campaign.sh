#!/bin/bash
# Repeated full bench runs with PSI/loadavg telemetry: catch a drifting
# run (the BENCH_r09 q66-q71 signature) with a watcher attached.
set -u
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx100g"
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
cd /root/repo/tools/r10
( while true; do
    echo "$(date -u +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg) cpu=[$(grep avg10 /proc/pressure/cpu | head -1)] io=[$(grep avg10 /proc/pressure/io | head -1)] mem=[$(grep avg10 /proc/pressure/memory | head -1)]"
    sleep 2
  done ) > psi.log 2>/dev/null &
WATCH=$!
for rep in 3 4 5 6; do
  echo "=== campaign full rep $rep $(date -u +%H:%M:%S) ==="
  java $OPTS -cp "$CP" graft.Bench 2>full_rep$rep.stderr | tail -1
done
kill $WATCH 2>/dev/null
echo "=== campaign done $(date -u +%H:%M:%S) ==="
