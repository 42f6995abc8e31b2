#!/bin/bash
# On-chip measurement protocol for the pending round-3 items (CLAUDE.md).
# Run this the moment the tunnel is healthy (tools/tpu_probe.py exits 0).
# One TPU process at a time: make sure nothing else is on the chip.
#
# Usage: bash tools/chip_protocol.sh [outdir]
set -u
OUT="${1:-/tmp/chip_protocol}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

echo "=== 1/3 tailpallas interleaved A/B (the round-3 pending decision)"
timeout 1800 python tools/ab_bench.py tailpallas trials=8 \
    2>&1 | tee "$OUT/tailpallas.log"
echo "exit=$?" >> "$OUT/tailpallas.log"

echo "=== 2/3 headline bench"
timeout 900 python bench.py 2> "$OUT/bench.stderr" | tee "$OUT/bench.json"
echo "exit=$?" >> "$OUT/bench.stderr"

echo "=== 3/3 done — inspect $OUT/tailpallas.log before flipping pair_tail auto"
echo "If mul_pallas wins: flip engine.py pair_tail auto -> 'pallas', re-run"
echo "bench.py + benchmarks/report.py, sync RESULTS.md/CLAUDE.md/ROUND3.md."
