#!/bin/bash
# Run a graft main class outside sbt (avoids the sbt lock for parallel
# background runs). Usage: run_main.sh [-mXmx] <mainClass> [args...]
# Env passthrough: SPARK_GRAFT_* vars work as with sbt runMain.
set -euo pipefail
# Heap default mirrors build.sbt (r13 advisory): SPARK_DRIVER_MEM wins,
# else half of physical RAM capped at 32g, floored at 2g (8g if unknown).
MEM="${SPARK_DRIVER_MEM:-}"
if [ -z "$MEM" ]; then
  PHYS_GB=$(awk '/MemTotal/{print int($2/1048576)}' /proc/meminfo 2>/dev/null || echo 0)
  HALF=$(( PHYS_GB / 2 ))
  if [ "$PHYS_GB" -le 0 ]; then HALF=8; fi
  if [ "$HALF" -gt 32 ]; then HALF=32; fi
  if [ "$HALF" -lt 2 ]; then HALF=2; fi
  MEM="${HALF}g"
fi
# Match the driver's environment (local[32]); GraftSession's own default
# is 4, which silently produced 4-thread "regressions" in CPU-dense
# kernels the first time this script forgot to set it.
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
# Runner provenance (r19 item 4): Bench stamps this into its capture
# JSON — sbt-run and script-run sf0.1 totals measure ~10% apart, and the
# census must attribute that to the launcher, not to code drift.
export SPARK_GRAFT_RUNNER="${SPARK_GRAFT_RUNNER:-run_main}"
SCALA_LIB=$(find /root/.cache/coursier -name "scala-library-2.13.17.jar" | head -1)
# GRAFT_CLASSES: point long background runs at a snapshot copy of the
# classes dir so a concurrent `sbt compile` can't swap class files under
# a running JVM (lazy classloading would mix old and new code).
CLASSES="${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}"
CP="${CLASSES}:${SCALA_LIB}:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# ParallelGC: matches build.sbt javaOptions (6-9% faster than G1 on the
# full suite, measured r13) so sbt-run and script-run captures agree.
# GRAFT_GC_OPTS overrides for collector experiments (e.g.
# "-XX:+UseG1GC -XX:G1HeapRegionSize=32m") — conflicting GC flags on one
# command line are a JVM error, so the default must be replaced, not
# appended to.
GC_OPTS="${GRAFT_GC_OPTS:--XX:+UseParallelGC}"
exec java -cp "$CP" $ADD_OPENS $GC_OPTS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"$MEM" "$@"
