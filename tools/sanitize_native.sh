#!/usr/bin/env bash
# Build the native host engine with ASan+UBSan and drive every op across all
# presets (SURVEY.md section 5: "C++ pieces get ASan/UBSan in CI").
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${TMPDIR:-/tmp}/libhost_engine_asan.so"
g++ -O1 -g -fPIC -Wall -Wextra -std=c++17 -fsanitize=address,undefined \
    -shared "$REPO/fhe_precompiles_tpu/native/host_engine.cpp" -o "$OUT"
ASAN_LIB=$(g++ -print-file-name=libasan.so)
UBSAN_LIB=$(g++ -print-file-name=libubsan.so)
LD_PRELOAD="$ASAN_LIB $UBSAN_LIB" ASAN_OPTIONS=detect_leaks=0 \
PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}" \
python - "$OUT" <<'PYEOF'
import sys
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import fhe_precompiles_tpu.native.engine as ne
ne.LIB_PATH = sys.argv[1]
ne.build = lambda force=False: ne.LIB_PATH
from fhe_precompiles_tpu.params import BENCH_N1024, BENCH_N8192, TESTNET_ONE
from fhe_precompiles_tpu.bfv.golden import BfvContext
for P in (TESTNET_ONE, BENCH_N8192, BENCH_N1024):
    ctx = BfvContext(P)
    eng = ne.NativeEngine(P, golden=ctx)
    pk, sk = ctx.generate_keys()
    m = np.random.default_rng(0).integers(0, ctx.t, ctx.n, dtype=np.uint64)
    c1 = ctx.encrypt(m, pk, b"\x01" * 64)
    c2 = ctx.encrypt(m, pk, b"\x02" * 64)
    eng.add(c1, c2); eng.sub(c1, c2); eng.negate(c1)
    eng.add_plain(c1, m); eng.mul_plain(c1, m); eng.plain_sub(m, c1)
    assert (eng.encrypt(m, pk, b"\x03" * 64).data
            == ctx.encrypt(m, pk, b"\x03" * 64).data).all()
    assert (eng.decrypt(c1, sk) == ctx.decrypt(c1, sk)).all()
    if pk.relin is not None:
        v = eng.mul_relin(c1, c2, pk.relin)
        assert (v.data == ctx.mul_relin(c1, c2, pk.relin).data).all()
        eng.decrypt(eng.multiply(c1, c2), sk)
    print(f"n={ctx.n} ok")
print("SANITIZER DRIVE PASSED")
PYEOF
