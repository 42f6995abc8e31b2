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
    pk, sk = eng.generate_keys(seed=b"\x07" * 64)
    pk_g, sk_g = ctx.generate_keys(seed=b"\x07" * 64)
    assert (sk.s_ntt == sk_g.s_ntt).all() and (pk.data == pk_g.data).all()
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

# Phase 2: the pure-native C ABI (precompiles.cpp) under ASan+UBSan --
# drives the full byte path (framing, bincode/SEAL/zstd, encodings, seeding)
# including malformed-input error cases, where memory bugs would live.
OUT2="${TMPDIR:-/tmp}/libc_fhe_native_asan.so"
g++ -O1 -g -fPIC -Wall -Wextra -std=c++17 -fsanitize=address,undefined \
    -shared "$REPO/fhe_precompiles_tpu/native/precompiles.cpp" \
    "$REPO/fhe_precompiles_tpu/native/host_engine.cpp" -o "$OUT2" -lzstd
LD_PRELOAD="$ASAN_LIB $UBSAN_LIB" ASAN_OPTIONS=detect_leaks=0 \
PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}" \
python - "$OUT2" <<'PYEOF'
import hashlib
import os
import struct
import sys
import jax; jax.config.update("jax_platforms", "cpu")
import fhe_precompiles_tpu
# the ASan .so lives in /tmp: point the dladdr-relative key loader at the
# package data dir explicitly
os.environ["FHE_TPU_NATIVE_DATA"] = os.path.join(
    os.path.dirname(os.path.abspath(fhe_precompiles_tpu.__file__)), "data")
from fhe_precompiles_tpu.native import NativeFhe
from fhe_precompiles_tpu import pack
from fhe_precompiles_tpu.app import _CT_CODEC, PRECOMPILE_NAMES
from fhe_precompiles_tpu.encoding import PLAIN_TYPES
from fhe_precompiles_tpu.testnet import one

FHE = one.FHE
nat = NativeFhe(sys.argv[1])
SC = {"u256": pack.U256, "u64": pack.U64, "i64": pack.I64,
      "frac64": pack.FRAC64}
V1 = {"u256": 16, "u64": 16, "i64": -16, "frac64": 2.5}
V2 = {"u256": 4, "u64": 4, "i64": 4, "frac64": -0.25}
upk, usk = FHE.generate_keys()

def ct(v, t, pk, tag):
    seed = hashlib.sha512(tag + t.encode()).digest()
    return FHE.ctx.encrypt(PLAIN_TYPES[t].encode(v, FHE.params), pk, seed)

for name in PRECOMPILE_NAMES:
    head, _, rest = name.partition("_")
    if name == "public_key_bytes":
        data = b""
    elif head in ("encrypt", "reencrypt", "decrypt"):
        t = rest
        if head == "encrypt":
            data = pack.pack_two_arguments(V1[t], SC[t], b"pd", pack.BYTES)
        elif head == "decrypt":
            data = pack.pack_one_argument(
                ct(V1[t], t, FHE.public_key, b"s"), _CT_CODEC)
        else:
            data = pack.pack_binary_operation(
                upk, ct(V1[t], t, FHE.public_key, b"s"), _CT_CODEC,
                b"rd", pack.BYTES)
    else:
        at, bt = rest.split("_")
        t = at.replace("cipher", "")
        a = (ct(V1[t], t, FHE.public_key, b"a") if at.startswith("cipher")
             else V1[t])
        b = (ct(V2[t], t, FHE.public_key, b"b") if bt.startswith("cipher")
             else V2[t])
        ca = _CT_CODEC if at.startswith("cipher") else SC[t]
        cb = _CT_CODEC if bt.startswith("cipher") else SC[t]
        data = pack.pack_binary_operation(FHE.public_key, a, ca, b, cb)
    code, out = nat.call(name, data)
    got = FHE.call(name, data)
    assert (code, out) == got, (name, code, got[0])

# malformed inputs: every parser branch under the sanitizers
for name, data in [
    ("add_cipheru64_cipheru64", b""),
    ("add_cipheru64_cipheru64", b"\x00\x00\x00"),
    ("add_cipheru64_cipheru64", struct.pack(">II", 9, 8) + b"\x00" * 64),
    ("encrypt_u64", struct.pack(">I", 10_000_000) + b"\x00" * 64),
    ("decrypt_u64", b"\xde\xad" * 40),
    ("decrypt_frac64", b"\x00" * 200),
    ("reencrypt_u64", struct.pack(">II", 8, 8)),
]:
    code, _ = nat.call(name, data)
    assert code == FHE.call(name, data)[0], (name, code)
print("C ABI SANITIZER DRIVE PASSED")
PYEOF
