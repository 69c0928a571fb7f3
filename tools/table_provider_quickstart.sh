#!/usr/bin/env bash
# TextEncoder offline-inference loop, end to end from a clean shell:
# stage 1 "GPU batch job" writes a (value, embedding) parquet lookup for
# the corpus' distinct strings; stage 2 encodes through
# TableEmbeddingProvider over that parquet; stage 3 asserts the result is
# bit-identical to encoding through the provider directly. Exits nonzero
# on mismatch.
set -euo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-/tmp/graft_te_quickstart}"
sbt -batch "runMain graft.tools.TableProviderQuickstart $WORK" </dev/null \
  | grep "\[quickstart\]"
