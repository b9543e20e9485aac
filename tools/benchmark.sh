#!/bin/bash
# Run the headline benchmark N times and store one JSON line per run.
#
# Counterpart of the reference's `tools/benchmark.sh` (CPU pinning and
# RUSTFLAGS there; here the stable-measurement knobs are the persistent XLA
# compilation cache, the pre-generated corpus cache, and a freshly built
# C++ core). Results append to bench_results/$1.txt for
# tools/compare_benches.py.
#
# Usage: tools/benchmark.sh <name> [runs]

set -e -o pipefail
cd "$(dirname "$0")/.."

NAME="${1:?usage: tools/benchmark.sh <name> [runs]}"
RUNS="${2:-5}"

python -m claxon_tpu.native.build
mkdir -p bench_results

i=0
while [ "$i" -lt "$RUNS" ]; do
    python bench.py | tee -a "bench_results/$NAME.txt"
    i=$((i + 1))
done
echo "wrote bench_results/$NAME.txt"
