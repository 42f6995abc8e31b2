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

# mismatched component counts: SEAL zero-extension add/sub (memcpy +
# he_neg extras -- the raw-pointer arithmetic ASan should watch)
import numpy as np
from fhe_precompiles_tpu.bfv.golden import Ciphertext
rng = np.random.default_rng(1)
k, n = len(FHE.params.ct_moduli), FHE.params.n
def randct(size):
    d = np.zeros((size, k, n), dtype=np.uint64)
    for j, p in enumerate(FHE.params.ct_moduli):
        d[:, j] = rng.integers(0, p, size=(size, n), dtype=np.uint64)
    return Ciphertext(FHE.params, d)
for sa in (1, 2, 3, 5):
    for sb in (1, 2, 3, 5):
        data = pack.pack_binary_operation(FHE.public_key, randct(sa),
                                          _CT_CODEC, randct(sb), _CT_CODEC)
        for name in ("add_cipheru64_cipheru64", "sub_cipheru64_cipheru64"):
            assert nat.call(name, data) == FHE.call(name, data), (name, sa, sb)
print("C ABI SANITIZER DRIVE PASSED")
PYEOF

# Phase 3: ThreadSanitizer over the pure-native byte path.  A C driver (no
# Python -- TSan and CPython don't mix) hammers encrypt/binary-op/decrypt
# from 4 threads through the same App singleton, exercising the pk-cache
# LRU, thread-local zstd contexts and scratch arenas under the race
# detector.
OUT3="${TMPDIR:-/tmp}/libc_fhe_native_tsan.so"
g++ -O1 -g -fPIC -std=c++17 -fsanitize=thread \
    -shared "$REPO/fhe_precompiles_tpu/native/precompiles.cpp" \
    "$REPO/fhe_precompiles_tpu/native/host_engine.cpp" -o "$OUT3" -lzstd
DRIVER="${TMPDIR:-/tmp}/tsan_driver"
cat > "${DRIVER}.c" <<'CEOF'
#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "c_fhe.h"

/* pack_two_arguments for encrypt_u64: [u32 BE off1=12][u64 BE v][pd] */
static void enc_input(uint64_t v, uint8_t out[13]) {
  out[0] = 0; out[1] = 0; out[2] = 0; out[3] = 12;
  for (int i = 0; i < 8; ++i) out[4 + i] = (uint8_t)(v >> (56 - 8 * i));
  out[12] = 0x61;
}

static uint8_t *g_pk; static int64_t g_pk_len;
static uint8_t *g_ct[4]; static int64_t g_ct_len[4];

static void *worker(void *arg) {
  long id = (long)arg;
  for (int round = 0; round < 3; ++round) {
    /* binary op: [off1][off2][pk][a][b] */
    uint32_t off1 = 8 + (uint32_t)g_pk_len;
    uint32_t off2 = off1 + (uint32_t)g_ct_len[id];
    size_t len = (size_t)off2 + (size_t)g_ct_len[(id + 1) % 4];
    uint8_t *buf = malloc(len);
    buf[0]=off1>>24; buf[1]=off1>>16; buf[2]=off1>>8; buf[3]=off1;
    buf[4]=off2>>24; buf[5]=off2>>16; buf[6]=off2>>8; buf[7]=off2;
    memcpy(buf + 8, g_pk, g_pk_len);
    memcpy(buf + off1, g_ct[id], g_ct_len[id]);
    memcpy(buf + off2, g_ct[(id + 1) % 4], g_ct_len[(id + 1) % 4]);
    uint8_t *out = NULL; int64_t out_len = 0;
    int32_t code = c_fhe_mul_cipheru64_cipheru64(buf, len, &out, &out_len);
    if (code != 0) { fprintf(stderr, "mul code %d\n", code); exit(1); }
    uint8_t *dec = NULL; int64_t dec_len = 0;
    code = c_fhe_decrypt_u64(out, out_len, &dec, &dec_len);
    if (code != 0 || dec_len != 8) { fprintf(stderr, "dec %d\n", code); exit(1); }
    fhe_free(out); fhe_free(dec); free(buf);
  }
  return NULL;
}

/* The batched-codec path ByteServer worker threads actually run:
 * fhe_tpu_unpack_binary hands out REFCOUNTED pk handles from a shared
 * parse cache; pk_id/pk_relin/pk_data/release and pack_ciphertext all
 * run concurrently against the same cache entry. */
static uint64_t g_n, g_kct, g_kkey, g_t;

static void *tpu_worker(void *arg) {
  long id = (long)arg;
  uint64_t *ct = malloc(2 * g_kct * g_n * 8);
  uint64_t *other = malloc(2 * g_kct * g_n * 8);
  uint64_t *rk = malloc(g_kct * 2 * g_kkey * g_n * 8);
  uint64_t *pkb = malloc(2 * g_kkey * g_n * 8);
  uint32_t off1 = 8 + (uint32_t)g_pk_len;
  uint32_t off2 = off1 + (uint32_t)g_ct_len[id];
  size_t len = (size_t)off2 + (size_t)g_ct_len[(id + 1) % 4];
  uint8_t *buf = malloc(len);
  buf[0]=off1>>24; buf[1]=off1>>16; buf[2]=off1>>8; buf[3]=off1;
  buf[4]=off2>>24; buf[5]=off2>>16; buf[6]=off2>>8; buf[7]=off2;
  memcpy(buf + 8, g_pk, g_pk_len);
  memcpy(buf + off1, g_ct[id], g_ct_len[id]);
  memcpy(buf + off2, g_ct[(id + 1) % 4], g_ct_len[(id + 1) % 4]);
  for (int round = 0; round < 12; ++round) {
    int32_t shape, op; uint64_t cs, os; void *pk = NULL;
    int32_t code = fhe_tpu_unpack_binary("mul_cipheru64_cipheru64", buf,
                                         len, ct, other, &shape, &op,
                                         &cs, &os, &pk);
    if (code != 0) { fprintf(stderr, "tpu unpack %d\n", code); exit(1); }
    uint64_t kid;
    fhe_tpu_pk_id(pk, &kid);
    fhe_tpu_pk_relin(pk, rk);
    fhe_tpu_pk_data(pk, pkb);
    fhe_tpu_pk_release(pk);
    uint8_t *out = NULL; int64_t out_len = 0;
    if (fhe_tpu_pack_ciphertext(ct, 2, &out, &out_len) != 0) exit(1);
    fhe_free(out);
    uint8_t in13[13], seed[64]; enc_input(40 + id, in13);
    uint64_t *m = other;  /* reuse, (n,) fits */
    if (fhe_tpu_unpack_encrypt("u64", in13, 13, m, seed) != 0) exit(1);
    if (fhe_tpu_decode_scalar("u64", m, &out, &out_len) != 0) exit(1);
    fhe_free(out);
  }
  free(ct); free(other); free(rk); free(pkb); free(buf);
  return NULL;
}

/* Race the runtime zstd dispatch swap (fhe_tpu_use_libzstd) against the
 * codec workers: each toggle heap-installs a fresh dispatch table and
 * every worker thread lazily rebuilds its TLS contexts — the exact
 * interleaving a serving process hits if an operator re-points the zstd
 * build mid-flight.  dlopen'ing the LINKED build as the "candidate"
 * passes byte-verification trivially while exercising all of the swap
 * machinery. */
static const char *g_zstd_path = "/usr/lib/x86_64-linux-gnu/libzstd.so.1";

static void *swapper(void *arg) {
  (void)arg;
  for (int i = 0; i < 30; ++i) {
    if (fhe_tpu_use_libzstd(g_zstd_path) != 0) { fprintf(stderr, "swap\n"); exit(1); }
    if (fhe_tpu_use_libzstd("system") != 0) { fprintf(stderr, "unswap\n"); exit(1); }
  }
  return NULL;
}

int main(void) {
  if (c_fhe_public_key_bytes(NULL, 0, &g_pk, &g_pk_len) != 0) return 1;
  for (long i = 0; i < 4; ++i) {
    uint8_t in[13]; enc_input(3 + i, in);
    if (c_fhe_encrypt_u64(in, 13, &g_ct[i], &g_ct_len[i]) != 0) return 1;
  }
  pthread_t th[4];
  for (long i = 0; i < 4; ++i) pthread_create(&th[i], NULL, worker, (void *)i);
  for (long i = 0; i < 4; ++i) pthread_join(th[i], NULL);
  if (fhe_tpu_params(&g_n, &g_kct, &g_kkey, &g_t) != 0) return 1;
  pthread_t sw; int have_sw = fhe_tpu_use_libzstd(g_zstd_path) == 0;
  if (have_sw) fhe_tpu_use_libzstd("system");
  for (long i = 0; i < 4; ++i)
    pthread_create(&th[i], NULL, tpu_worker, (void *)i);
  if (have_sw) pthread_create(&sw, NULL, swapper, NULL);
  for (long i = 0; i < 4; ++i) pthread_join(th[i], NULL);
  if (have_sw) pthread_join(sw, NULL);
  else fprintf(stderr, "note: zstd swap-race phase skipped (no %s)\n",
               g_zstd_path);
  printf("TSAN DRIVE PASSED\n");
  return 0;
}
CEOF
gcc -O1 -g -fsanitize=thread "${DRIVER}.c" -o "$DRIVER" \
    -I"$REPO/fhe_precompiles_tpu/native" \
    -L"$(dirname "$OUT3")" -l:"$(basename "$OUT3")" \
    -Wl,-rpath,"$(dirname "$OUT3")" -lpthread
FHE_TPU_NATIVE_DATA="$REPO/fhe_precompiles_tpu/data" \
TSAN_OPTIONS="halt_on_error=1" "$DRIVER"
