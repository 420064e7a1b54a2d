#!/bin/bash
# One full bench run with GC logging + a /tmp shuffle-dir size watcher.
set -u
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx100g -Xlog:gc:/root/repo/tools/r10/gc.log:time,uptime"
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
cd /root/repo/tools/r10
( while true; do
    sz=$(du -sm /tmp/blockmgr-* 2>/dev/null | awk '{s+=$1} END {print s+0}')
    nf=$(find /tmp/blockmgr-* -type f 2>/dev/null | wc -l)
    echo "$(date -u +%H:%M:%S.%3N) shuffleMB=$sz files=$nf"
    sleep 2
  done ) > tmpwatch.log 2>/dev/null &
WATCH=$!
java $OPTS -cp "$CP" graft.Bench 2>instr.stderr | tail -1
kill $WATCH 2>/dev/null
echo done
