#!/usr/bin/env bash
# PySpark binding proof, end to end: package the jar, dump the Scala-driven
# references (SQL registry facade + a real Curation.sweep run), then a
# clean pyspark process recomputes BOTH — the registry through SQL and the
# sweep through the py4j gateway on the packaged jar — and compares row
# for row.
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.001}"
DUMP="${2:-/tmp/registry_dump}"
sbt -batch -error package </dev/null
sbt -batch "runMain graft.tools.RegistryDump $SF_DIR $DUMP"
python3 tools/pyspark_registry_check.py "$SF_DIR" "$DUMP"
