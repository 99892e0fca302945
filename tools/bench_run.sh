#!/bin/bash
# Standalone-JVM bench runner (round-14 protocol): same driver contract as
# `sbt "runMain graft.Bench"` but without sbt co-tenancy — the recorded
# minima come from runs launched this way on a quiet box.
#   usage: bench_run.sh <sfdir> <outfile> [env k=v ...]
# Classpath = compiled classes + the image's Spark jars (build.sbt's
# unmanagedBase); JDK17 add-opens mirror build.sbt's fork options.
set -euo pipefail
SF_DIR="${1:?sf dir}"; OUT="${2:?out file}"; shift 2
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
env SPARK_GRAFT_SF_DIR="$SF_DIR" "$@" \
  java $ADD_OPENS -Xmx${BENCH_XMX:-8g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench > "$OUT.raw" 2>"$OUT.log"
# Bench prints TWO records since round 15 (full per-query line, then a
# compact total line for the driver's 2 kB tail) — repo tooling wants the
# per-query one
grep -o '{"metric".*"queries".*}' "$OUT.raw" | head -1 > "$OUT"
echo "wrote $OUT"
