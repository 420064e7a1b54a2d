#!/bin/bash
# Campaign C: full bench runs with safepoint logging — tests the
# time-to-safepoint hypothesis for the drift clusters. D-side adds
# -XX:+UseCountedLoopSafepoints as the candidate mitigation.
set -u
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
BASE="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx100g"
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
cd /root/repo/tools/r10
# steal-time watcher: a VM vCPU descheduled by the hypervisor is invisible
# to PSI — /proc/stat col 8 (steal jiffies, cumulative) is the tell
( while true; do
    echo "$(date -u +%H:%M:%S) $(awk '/^cpu /{print "steal="$9" idle="$5" iowait="$6}' /proc/stat)"
    sleep 2
  done ) > steal.log 2>/dev/null &
WATCH=$!
trap 'kill $WATCH 2>/dev/null' EXIT
for rep in 1 2 3 4 5 6; do
  echo "=== C(safepoint-log) rep $rep $(date -u +%H:%M:%S) ==="
  java $BASE "-Xlog:safepoint=info:file=sp_rep$rep.log:time,uptime" \
    -cp "$CP" graft.Bench 2>spC_rep$rep.stderr | tail -1
done
for rep in 1 2 3 4 5 6; do
  echo "=== D(counted-loop-sp) rep $rep $(date -u +%H:%M:%S) ==="
  java $BASE -XX:+UseCountedLoopSafepoints \
    "-Xlog:safepoint=info:file=spD_rep$rep.log:time,uptime" \
    -cp "$CP" graft.Bench 2>spD_rep$rep.stderr | tail -1
done
echo "=== safepoint campaign done $(date -u +%H:%M:%S) ==="
