#!/usr/bin/env bash
# PySpark binding proof, end to end: facade dump then SQL-from-python compare.
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.001}"
DUMP="${2:-/tmp/registry_dump}"
sbt -batch "runMain graft.tools.RegistryDump $SF_DIR $DUMP"
python3 tools/pyspark_registry_check.py "$SF_DIR" "$DUMP"
