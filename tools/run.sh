#!/bin/bash
# java -cp launcher for graft mains (Verify/Bench/tools) that mirrors
# build.sbt's forked-JVM options, so long-running data generation and
# validation can proceed WITHOUT holding the sbt project lock.
#   tools/run.sh graft.tools.ScaleGen /root/testdata/sf0.1 /tmp/graft_sf1 10
# SPARK_DRIVER_MEM overrides the heap (default: half of RAM, capped 48g).
set -euo pipefail
CLS=/root/repo/target/scala-2.13/classes
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
RAM_GB=$(awk '/MemTotal/{print int($2/1048576)}' /proc/meminfo)
HEAP=${SPARK_DRIVER_MEM:-$(( RAM_GB/2 > 48 ? 48 : (RAM_GB/2 < 2 ? 2 : RAM_GB/2) ))g}
# -XX:-UseCodeCacheFlushing + 512m reserve: the JDK-17 sweeper's
# speculative cold-code flushing is the sf1000 cross-query session-rot
# mechanism (SCALE.md round 16) — mirror build.sbt's javaOptions
# GRAFT_EXTRA_JVM_OPTS: ad-hoc JVM flags for A/B experiments
# (e.g. -XX:-TieredCompilation for the r18 ivf_ann variance bisect)
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"$HEAP" -XX:+ExplicitGCInvokesConcurrent \
  -XX:ReservedCodeCacheSize=512m -XX:-UseCodeCacheFlushing \
  ${GRAFT_EXTRA_JVM_OPTS:-} \
  -cp "$CLS:/opt/spark/jars/*" "$@"
