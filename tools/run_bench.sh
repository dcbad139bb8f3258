#!/bin/bash
# Canonical bench launcher: raw java (no sbt sibling JVM — the r16 guard
# diverts any run that shares the machine with another JVM), the build's
# JDK-17 --add-opens set, 8 GB heap (the canonical heap the records are
# comparable under), 32 cores, median-of-3.
#
#   tools/run_bench.sh <sfDir> <benchFile>
#
# Compile FIRST (sbt -batch compile) and let the machine go idle —
# never recompile while this runs (class files swap under the live
# classloader) and never run anything else (the stamps will divert the
# record).
set -euo pipefail
SF_DIR="${1:?usage: run_bench.sh <sfDir> <benchFile>}"
BENCH_FILE="${2:?usage: run_bench.sh <sfDir> <benchFile>}"
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_RUNS=3 \
SPARK_GRAFT_BENCH_FILE="$BENCH_FILE" \
exec java -Xmx8g $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Bench
