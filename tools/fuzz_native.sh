#!/usr/bin/env bash
# Coverage-guided fuzzing of the pure-native parser surface (calldata
# framing + bincode/SEAL/zstd readers in precompiles.cpp), ASan+UBSan
# instrumented.  No clang/libFuzzer in this image, so coverage comes from
# gcc's -fsanitize-coverage=trace-pc feeding the AFL-style harness in
# native/fuzz_native.cpp (the harness TU itself is NOT instrumented — the
# bitmap sees only library edges, and the trace callback cannot recurse).
#
# Usage: tools/fuzz_native.sh [--ci | SECONDS]
#        --ci: 60 s budget; a number: that many seconds; default 300 s
set -euo pipefail
cd "$(dirname "$0")/.."

BUDGET=300
[[ "${1:-}" == "--ci" ]] && BUDGET=60
[[ "${1:-}" =~ ^[0-9]+$ ]] && BUDGET=$1

ND=fhe_precompiles_tpu/native
BUILD=$ND/fuzz_build
mkdir -p "$BUILD"

SAN="-fsanitize=address,undefined -fno-sanitize-recover=all"
CXX=${CXX:-g++}

# library TUs: sanitizers + coverage instrumentation
$CXX -O1 -g -std=c++17 -fPIC $SAN -fsanitize-coverage=trace-pc \
    -c $ND/precompiles.cpp -o "$BUILD/precompiles.o"
$CXX -O1 -g -std=c++17 -fPIC $SAN -fsanitize-coverage=trace-pc \
    -c $ND/host_engine.cpp -o "$BUILD/host_engine.o"
# harness TU: sanitizers only (keeps mutator edges out of the bitmap)
$CXX -O1 -g -std=c++17 $SAN -c $ND/fuzz_native.cpp -o "$BUILD/fuzz_native.o"
$CXX $SAN "$BUILD/precompiles.o" "$BUILD/host_engine.o" \
    "$BUILD/fuzz_native.o" -o "$BUILD/fuzz_native" -lzstd -ldl

# seed corpus: small malformed shapes are checked in; the valid deep-path
# seeds (each carries the ~400 KB network pk) are synthesized locally
python3 tools/make_fuzz_corpus.py "$ND/fuzz_corpus"

# the App singleton + pk cache are deliberately process-lifetime: not
# leaks.  FHE_TPU_NATIVE_DATA: the binary sits in fuzz_build/, so the
# dladdr-relative key discovery would miss the package data dir.
ASAN_OPTIONS=detect_leaks=0 \
FHE_TPU_NATIVE_DATA="$(pwd)/fhe_precompiles_tpu/data" \
    "$BUILD/fuzz_native" "$ND/fuzz_corpus" "$BUDGET"
echo "FUZZ DRIVE PASSED"
