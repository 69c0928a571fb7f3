#!/usr/bin/env bash
# Publishing-hygiene proof (r9): the packaged library JAR works under a
# STOCK spark-submit and spark-shell from a clean shell — no sbt runtime,
# no test classpath, exactly how a user would consume the artifact.
#
#   1. `sbt package` -> target/scala-2.13/*.jar
#   2. spark-submit --class graft.Smoke <jar>    (flagship pipeline, rows>0)
#   3. spark-shell --jars <jar> running a README-style snippet
#      (Curation.sweep on the sf0.001 fixtures, prints kept-count)
#
# Exits non-zero on any failure. Mirrors tools/pyspark_registry_check.sh's
# discipline of proving a consumption surface end-to-end.
set -euo pipefail
cd "$(dirname "$0")/.."

SPARK_HOME=${SPARK_HOME:-/opt/spark}
SF_DIR=${SF_DIR:-/root/testdata/sf0.001}

echo "[jar-check] sbt package..."
sbt -batch -error package </dev/null
JAR=$(ls -t target/scala-2.13/*.jar | head -1)
echo "[jar-check] jar: $JAR ($(du -h "$JAR" | cut -f1))"

echo "[jar-check] spark-submit graft.Smoke..."
SUBMIT_OUT=$("$SPARK_HOME/bin/spark-submit" \
  --master 'local[8]' \
  --conf spark.ui.enabled=false \
  --conf spark.sql.shuffle.partitions=8 \
  --conf spark.sql.session.timeZone=UTC \
  --class graft.Smoke "$JAR" 2>/dev/null | grep '\[smoke\]' || true)
echo "$SUBMIT_OUT"
ROWS=$(echo "$SUBMIT_OUT" | sed -n 's/.*entry rows=\([0-9]*\).*/\1/p')
if [ -z "$ROWS" ] || [ "$ROWS" -le 0 ]; then
  echo "[jar-check] FAIL: spark-submit smoke produced no rows"; exit 1
fi
echo "[jar-check] spark-submit OK ($ROWS rows)"

echo "[jar-check] spark-shell quickstart snippet..."
SHELL_OUT=$("$SPARK_HOME/bin/spark-shell" \
  --master 'local[8]' \
  --conf spark.ui.enabled=false \
  --conf spark.sql.shuffle.partitions=8 \
  --conf spark.sql.session.timeZone=UTC \
  --jars "$JAR" 2>/dev/null <<SCALA | grep '\[quickstart\]' || true
import graft.operators._
val docs = spark.read.parquet("$SF_DIR/documents.parquet")
val bench = docs.filter(col("doc_id") % 17 === 0)
val verdicts = Curation.sweep(docs, bench, "text", "doc_id")
val kept = verdicts.filter(col("kept")).count()
println(s"[quickstart] docs=\${docs.count()} kept=\$kept")
assert(kept > 0, "curation kept nothing")
SCALA
)
echo "$SHELL_OUT"
KEPT=$(echo "$SHELL_OUT" | sed -n 's/.*kept=\([0-9]*\).*/\1/p')
if [ -z "$KEPT" ] || [ "$KEPT" -le 0 ]; then
  echo "[jar-check] FAIL: spark-shell quickstart kept nothing"; exit 1
fi
echo "[jar-check] spark-shell OK (kept=$KEPT)"
echo "[jar-check] PASS: packaged JAR consumable via spark-submit and spark-shell"
