"""Three-stack BYTE-differential fuzz consensus: golden / jax / native ABI.

Round-4 VERDICT item 2: the fuzz consensus tests compared native-vs-golden
only -- the JAX engine (the TPU serving stack) was never in the fuzz
differential, which is exactly how the t-gamma decrypt split survived.
These tests replay the checked-in C++ fuzz corpus and adversarial
constructions through ALL THREE stacks -- the golden Python app, the
JAX-engine app, and the pure-C++ ABI (libc_fhe_native.so) -- asserting
identical (code, payload bytes), not just codes.

Consensus is bytes, not codes (reference fhe.rs:2101-2119); pack.rs:153-266
defines the error paths the corpus exercises.
"""
import hashlib
import os
import shutil
import subprocess

import numpy as np
import pytest

from fhe_precompiles_tpu import pack
from fhe_precompiles_tpu.app import _CT_CODEC, PRECOMPILE_NAMES, FheApp
from fhe_precompiles_tpu.bfv.golden import Ciphertext
from fhe_precompiles_tpu.encoding import PLAIN_TYPES
from fhe_precompiles_tpu.params import TESTNET_ONE
from fhe_precompiles_tpu.testnet import one

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")

FHE = one.FHE          # golden engine
P = TESTNET_ONE
K = len(P.ct_moduli)
N = P.n

SEED_DIR = os.path.join(os.path.dirname(os.path.abspath(
    __import__("fhe_precompiles_tpu").__file__)), "native", "fuzz_seeds")


@pytest.fixture(scope="module")
def jax_app():
    return FheApp(P, engine="jax")


@pytest.fixture(scope="module")
def native():
    from fhe_precompiles_tpu.native import NativeFhe
    d = os.path.join(os.path.dirname(
        os.path.abspath(__import__("fhe_precompiles_tpu").__file__)), "native")
    subprocess.run(["make", "-C", d, "libc_fhe_native.so"], check=True,
                   capture_output=True)
    return NativeFhe(os.path.join(d, "libc_fhe_native.so"))


def _three_way(jax_app, native, name, data, label):
    got = {
        "golden": FHE.call(name, data),
        "jax": jax_app.call(name, data),
        "native-abi": native.call(name, data),
    }
    distinct = {v for v in got.values()}
    assert len(distinct) == 1, (
        f"three-stack split on {label} ({name}): "
        + "; ".join(f"{s}: code={c} len={len(p)} sha={hashlib.sha256(p).hexdigest()[:12]}"
                    for s, (c, p) in got.items()))
    return got["golden"]


# ---------------------------------------------------------------------------
# checked-in fuzz corpus replay (seed format: [op index][calldata],
# tools/make_fuzz_corpus.py; the coverage-guided fuzzer grows this set)
# ---------------------------------------------------------------------------

def test_corpus_replay_three_stacks(jax_app, native):
    seeds = sorted(os.listdir(SEED_DIR))
    assert len(seeds) > 50, "fuzz corpus missing"
    for fname in seeds:
        with open(os.path.join(SEED_DIR, fname), "rb") as f:
            raw = f.read()
        if not raw:
            continue
        name = PRECOMPILE_NAMES[raw[0] % len(PRECOMPILE_NAMES)]
        _three_way(jax_app, native, name, raw[1:], f"corpus {fname}")


# ---------------------------------------------------------------------------
# adversarial constructions (the class that slipped through code-only diffs)
# ---------------------------------------------------------------------------

def _const_poly_ct(x: int) -> Ciphertext:
    data = np.zeros((2, K, N), dtype=np.uint64)
    for j, p in enumerate(P.ct_moduli):
        data[0, j, 0] = x % p
    return Ciphertext(P, data)


def test_c1_zero_boundary_through_native_abi(jax_app, native):
    """The native ABI (precompiles.cpp's own C++ decrypt) on the boundary
    dots too -- C validators and TPU servers must agree byte-for-byte."""
    q, t = P.q, P.t
    xs = [6341038794891017812]
    for m in (0, 1, t // 2, t - 1, t):
        xs.append((m * q - q // 2) // t % q)
        xs.append(((m * q - q // 2) // t + 1) % q)
    for x in xs:
        blob = _const_poly_ct(x).to_bytes()
        calldata = pack.pack_one_argument(blob, pack.BYTES)
        for tname in ("i64", "frac64"):
            _three_way(jax_app, native, f"decrypt_{tname}", calldata,
                       f"boundary dot {x}")


def test_mutated_ciphertext_three_stacks(jax_app, native):
    data = pack.pack_two_arguments(12, pack.U256, b"\x01", pack.BYTES)
    _, ct = FHE.call("encrypt_u256", data)
    rng = np.random.default_rng(31)
    for _ in range(24):
        pos = int(rng.integers(0, len(ct)))
        mutated = bytearray(ct)
        mutated[pos] ^= 1 << int(rng.integers(0, 8))
        calldata = pack.pack_one_argument(bytes(mutated), pack.BYTES)
        _three_way(jax_app, native, "decrypt_u256", calldata,
                   f"bit flip at {pos}")


def test_random_bytes_three_stacks(jax_app, native):
    rng = np.random.default_rng(5)
    for name in PRECOMPILE_NAMES:
        for size in (0, 9, 120):
            data = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
            _three_way(jax_app, native, name, data, f"random[{size}]")


def test_framing_variants_three_stacks(jax_app, native):
    """Wire framing edge cases accepted by the parser must behave
    identically everywhere: an UNCOMPRESSED (compr=0) inner SEAL stream,
    and mutated scale/correction header fields (BFV ignores them; outputs
    are rebuilt with canonical defaults on every stack)."""
    import struct
    from fhe_precompiles_tpu.serialization import keyio
    from fhe_precompiles_tpu.serialization.bincode import Reader, Writer
    from fhe_precompiles_tpu.serialization.seal import (SealCiphertextBlob,
                                                        wrap_stream)
    ct = FHE.ctx.encrypt(PLAIN_TYPES["u64"].encode(21, P), FHE.public_key,
                         hashlib.sha512(b"fv").digest())
    r = Reader(ct.to_bytes())
    params = keyio.read_params(r)
    r.u64()
    sb = SealCiphertextBlob.from_stream(r.byte_vec())

    # uncompressed inner stream
    w = Writer()
    keyio.write_params(w, params)
    w.u64(1)
    w.byte_vec(sb.to_stream(compress=False))
    blob_nc = w.getvalue()
    _three_way(jax_app, native, "decrypt_u64",
               pack.pack_one_argument(blob_nc, pack.BYTES), "COMPR_NONE ct")

    # scale/correction mutated (layout: parms_id 32 | is_ntt 1 | size 8 |
    # n 8 | k 8 | scale f64 | corr 8)
    members = bytearray(sb.members())
    struct.pack_into("<d", members, 57, 3.75)
    struct.pack_into("<Q", members, 65, 9)
    w = Writer()
    keyio.write_params(w, params)
    w.u64(1)
    w.byte_vec(wrap_stream(bytes(members)))
    blob_sc = w.getvalue()
    _three_way(jax_app, native, "decrypt_u64",
               pack.pack_one_argument(blob_sc, pack.BYTES),
               "scale/corr mutated ct")
    # raw-spliced into binary-op calldata (no canonical re-serialization)
    ct2 = FHE.ctx.encrypt(PLAIN_TYPES["u64"].encode(2, P), FHE.public_key,
                          hashlib.sha512(b"fv2").digest())
    pk_bytes = FHE.public_key_bytes()
    b_bytes = ct2.to_bytes()
    off1 = 8 + len(pk_bytes)
    off2 = off1 + len(blob_sc)
    calldata = (struct.pack(">II", off1, off2) + pk_bytes + blob_sc
                + b_bytes)
    code, _ = _three_way(jax_app, native, "add_cipheru64_cipheru64",
                         calldata, "raw-spliced scale-mutated add")
    assert code == 0


def test_noise_exhaustion_chain_three_stacks(jax_app, native):
    """Squaring chain through and PAST noise exhaustion: every intermediate
    ciphertext and decrypt output must stay byte-identical on all three
    stacks even when the plaintext has degraded to garbage (VERDICT item 7
    chain requirement; depth capacity documented in ARCHITECTURE.md)."""
    seed = hashlib.sha512(b"exhaust").digest()
    ct = FHE.ctx.encrypt(PLAIN_TYPES["u64"].encode(3, P), FHE.public_key,
                         seed)
    blob = ct.to_bytes()
    correct = []
    for depth in range(1, 5):
        c = Ciphertext.from_bytes(blob)
        calldata = pack.pack_binary_operation(FHE.public_key, c, _CT_CODEC,
                                              c, _CT_CODEC)
        code, blob = _three_way(jax_app, native, "mul_cipheru64_cipheru64",
                                calldata, f"square depth {depth}")
        assert code == 0
        dec_in = pack.pack_one_argument(blob, pack.BYTES)
        dcode, dout = _three_way(jax_app, native, "decrypt_u64", dec_in,
                                 f"decrypt at depth {depth}")
        _three_way(jax_app, native, "decrypt_frac64", dec_in,
                   f"frac64 decrypt at depth {depth}")
        correct.append(dcode == 0 and
                       int.from_bytes(dout, "big") == 3 ** (2 ** depth))
    # the chain must actually cross exhaustion for the test to mean anything:
    # early depths decrypt correctly, the final one has degraded to garbage
    # (still byte-identical across stacks, asserted above)
    assert correct[0], "depth-1 square should still decrypt correctly"
    assert not correct[-1], "chain never exhausted the noise budget"
