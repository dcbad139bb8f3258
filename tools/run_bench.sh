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
# Quiet-host contract (r20/r21 verdicts' #1 ask, promoted to enforcement):
#  - preflight: wait for 1-min loadavg to drop below 0.5 and for every
#    other java process to exit (up to ~5 min) before launching;
#  - retry: the bench itself diverts a contaminated run (loadavg, sibling
#    JVMs, heap, and now calib_mt_ratio at suite start OR end) to a
#    _loaded sibling; when that happens, wait out the episode and retry —
#    up to 3 attempts. The canonical file is only ever written by a run
#    whose stamps prove it was idle end to end.
preflight() {
  for i in $(seq 1 60); do
    load=$(cut -d' ' -f1 /proc/loadavg)
    njava=$(pgrep -c -x java || true)
    if awk -v l="$load" 'BEGIN{exit !(l < 0.5)}' && [ "${njava:-0}" -eq 0 ]; then
      return 0
    fi
    echo "[run_bench] waiting for idle host (loadavg=$load, java procs=${njava:-0})" >&2
    sleep 5
  done
  echo "[run_bench] WARNING: host never went idle; launching anyway (the bench will divert if contaminated)" >&2
}
run_once() {
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_RUNS=3 \
  SPARK_GRAFT_BENCH_FILE="$BENCH_FILE" \
  java -Xmx8g $OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench
}
for attempt in 1 2 3; do
  preflight
  before=$(md5sum "$BENCH_FILE" 2>/dev/null | cut -d' ' -f1 || echo none)
  run_once
  after=$(md5sum "$BENCH_FILE" 2>/dev/null | cut -d' ' -f1 || echo none)
  if [ "$after" != "$before" ]; then
    echo "[run_bench] canonical record written on attempt $attempt" >&2
    exit 0
  fi
  echo "[run_bench] attempt $attempt diverted (contaminated run); cooling off 120s" >&2
  sleep 120
done
echo "[run_bench] all attempts diverted — see the _loaded sibling for the last record" >&2
exit 1
