"""Native C++ host engine (native/host_engine.cpp) vs the golden model.

The native engine is the framework's SEAL analog: standalone C++ BFV
kernels for CPU validators, required to be bit-identical to bfv/golden.py
on every op.  These tests pin that contract op-by-op on random data,
including the non-default n=8192 / BENCH_N1024 presets (the engine derives
all BEHZ/CRT constants itself, so preset coverage exercises its derivation
code, not just TESTNET_ONE's baked values).

Reference analog: SEAL's own evaluator tests; fhe.rs:1024-2338 breadth.
"""
import numpy as np
import pytest

from fhe_precompiles_tpu.bfv.golden import BfvContext
from fhe_precompiles_tpu.native.engine import NativeEngine
from fhe_precompiles_tpu.params import BENCH_N1024, BENCH_N8192, TESTNET_ONE


@pytest.fixture(scope="module")
def setup():
    ctx = BfvContext(TESTNET_ONE)
    eng = NativeEngine(TESTNET_ONE, golden=ctx)
    pk, sk = ctx.generate_keys()
    rng = np.random.default_rng(42)
    m = [rng.integers(0, ctx.t, ctx.n, dtype=np.uint64) for _ in range(3)]
    cts = [ctx.encrypt(mi, pk, bytes([i]) * 64) for i, mi in enumerate(m)]
    return ctx, eng, pk, sk, m, cts


def _eq(a, b):
    return (np.asarray(a) == np.asarray(b)).all()


def test_add_sub_neg(setup):
    ctx, eng, pk, sk, m, (c0, c1, _) = setup
    assert _eq(eng.add(c0, c1).data, ctx.add(c0, c1).data)
    assert _eq(eng.sub(c0, c1).data, ctx.sub(c0, c1).data)
    assert _eq(eng.negate(c0).data, ctx.negate(c0).data)


def test_plain_ops(setup):
    ctx, eng, pk, sk, m, (c0, c1, _) = setup
    p = m[2]
    assert _eq(eng.add_plain(c0, p).data, ctx.add_plain(c0, p).data)
    assert _eq(eng.sub_plain(c0, p).data, ctx.sub_plain(c0, p).data)
    assert _eq(eng.plain_sub(p, c0).data, ctx.plain_sub(p, c0).data)
    assert _eq(eng.mul_plain(c0, p).data, ctx.mul_plain(c0, p).data)


def test_multiply_relinearize(setup):
    ctx, eng, pk, sk, m, (c0, c1, _) = setup
    g3 = ctx.multiply(c0, c1)
    n3 = eng.multiply(c0, c1)
    assert _eq(n3.data, g3.data)
    assert _eq(eng.relinearize(n3, pk.relin).data,
               ctx.relinearize(g3, pk.relin).data)
    assert _eq(eng.mul_relin(c0, c1, pk.relin).data,
               ctx.mul_relin(c0, c1, pk.relin).data)


def test_encrypt_decrypt(setup):
    ctx, eng, pk, sk, m, cts = setup
    seed = b"\x07" * 64
    ce = eng.encrypt(m[0], pk, seed)
    assert _eq(ce.data, ctx.encrypt(m[0], pk, seed).data)
    for ct in cts:
        assert _eq(eng.decrypt(ct, sk), ctx.decrypt(ct, sk))
    # decrypt after deep circuit (size-3 path exercised via relin output)
    prod = eng.mul_relin(cts[0], cts[1], pk.relin)
    assert _eq(eng.decrypt(prod, sk), ctx.decrypt(prod, sk))


def test_decrypt_size3(setup):
    ctx, eng, pk, sk, m, (c0, c1, _) = setup
    c3 = ctx.multiply(c0, c1)
    assert _eq(eng.decrypt(c3, sk), ctx.decrypt(c3, sk))


def test_wrong_key_decrypt_garbage_matches(setup):
    # Exact equality must hold even on garbage polys (decrypt's exact
    # wide-arithmetic scale-and-round, host_engine.cpp decrypt notes).
    ctx, eng, pk, sk, m, (c0, _, _) = setup
    _, sk2 = ctx.generate_keys()
    assert _eq(eng.decrypt(c0, sk2), ctx.decrypt(c0, sk2))


@pytest.mark.parametrize("params", [BENCH_N1024, BENCH_N8192],
                         ids=["n1024", "n8192"])
def test_other_presets_bitexact(params):
    ctx = BfvContext(params)
    eng = NativeEngine(params, golden=ctx)
    pk, sk = ctx.generate_keys()
    rng = np.random.default_rng(7)
    m1 = rng.integers(0, ctx.t, ctx.n, dtype=np.uint64)
    m2 = rng.integers(0, ctx.t, ctx.n, dtype=np.uint64)
    c1 = ctx.encrypt(m1, pk, b"\x01" * 64)
    c2 = ctx.encrypt(m2, pk, b"\x02" * 64)
    assert _eq(eng.encrypt(m1, pk, b"\x03" * 64).data,
               ctx.encrypt(m1, pk, b"\x03" * 64).data)
    assert _eq(eng.add(c1, c2).data, ctx.add(c1, c2).data)
    assert _eq(eng.decrypt(c1, sk), ctx.decrypt(c1, sk))
    if pk.relin is not None:  # BENCH_N1024 is add-only (no special prime)
        g = ctx.mul_relin(c1, c2, pk.relin)
        v = eng.mul_relin(c1, c2, pk.relin)
        assert _eq(v.data, g.data)
        assert _eq(eng.decrypt(v, sk), ctx.decrypt(v, sk))


@pytest.mark.parametrize("params", [TESTNET_ONE, BENCH_N1024, BENCH_N8192],
                         ids=["testnet1", "n1024", "n8192"])
def test_native_keygen_bitexact(params):
    """he_keygen == golden.generate_keys per seed: same secret/public/relin
    keys bit-for-bit (shared uniform + error XOF streams sequenced across
    pk and relin draws exactly like golden's xof_a/xof_e)."""
    ctx = BfvContext(params)
    eng = NativeEngine(params, golden=ctx)
    seed = bytes(range(64))
    pk_g, sk_g = ctx.generate_keys(seed=seed)
    pk_n, sk_n = eng.generate_keys(seed=seed)
    assert _eq(sk_g.s_ntt, sk_n.s_ntt)
    assert _eq(pk_g.data, pk_n.data)
    if pk_g.relin is not None:
        assert pk_n.relin is not None
        assert _eq(pk_g.relin.data, pk_n.relin.data)
    else:
        assert pk_n.relin is None
    # keys work end-to-end through the engine
    rng = np.random.default_rng(3)
    m = rng.integers(0, ctx.t, ctx.n, dtype=np.uint64)
    c = eng.encrypt(m, pk_n, b"\x05" * 64)
    assert _eq(eng.decrypt(c, sk_n), m)
    if pk_n.relin is not None:
        v = eng.mul_relin(c, c, pk_n.relin)
        assert _eq(eng.decrypt(v, sk_n), ctx.decrypt(v, sk_n))
    # relin=False strips relin keys like the reference strips galois
    pk2, _ = eng.generate_keys(seed=seed, relin=False)
    assert pk2.relin is None


def test_native_samplers_match_python(setup):
    """C++ BLAKE2b XOF + ternary/CBD samplers == sampling.py streams.

    The native engine samples encryption randomness in C++
    (host_engine.cpp he_sample_*); consensus requires the exact byte
    streams of sampling.Blake2Xof / sample_ternary / sample_cbd.
    """
    import ctypes

    from fhe_precompiles_tpu.native.engine import _i64p, _load
    from fhe_precompiles_tpu.sampling import (
        CBD_K, DOMAIN_ERROR, DOMAIN_TERNARY, Blake2Xof, sample_cbd,
        sample_ternary)

    lib = _load()
    for n in (1024, 4096, 8192):
        for seed in (b"\x00" * 64, bytes(range(64)), b"\xff" * 64):
            u = np.empty(n, dtype=np.int64)
            e0 = np.empty(n, dtype=np.int64)
            e1 = np.empty(n, dtype=np.int64)
            lib.he_sample_ternary(seed, DOMAIN_TERNARY, n, _i64p(u))
            lib.he_sample_cbd_pair(seed, DOMAIN_ERROR, n, CBD_K,
                                   _i64p(e0), _i64p(e1))
            assert _eq(u, sample_ternary(Blake2Xof(seed, DOMAIN_TERNARY), n))
            xof = Blake2Xof(seed, DOMAIN_ERROR)
            assert _eq(e0, sample_cbd(xof, n))
            assert _eq(e1, sample_cbd(xof, n))


def test_error_codes_through_native_app():
    """Engine-reached error families return the reference codes under
    engine="native" (parser-level codes 1/3 never reach the engine and are
    pinned engine-independently in test_error_code_matrix.py)."""
    import hashlib

    from fhe_precompiles_tpu import FheApp, pack
    from fhe_precompiles_tpu.app import _CT_CODEC
    from fhe_precompiles_tpu.encoding import PLAIN_TYPES
    from fhe_precompiles_tpu.testnet import one

    FHE = one.FHE
    app = FheApp(FHE.params, engine="native")
    pk, sk = FHE.generate_keys()          # user keys, not the network key

    # wrong-key decrypt -> FailedDecryption (5); fhe.rs:644
    ct = FHE.ctx.encrypt(PLAIN_TYPES["u64"].encode(3, FHE.params), pk,
                         hashlib.sha512(b"w").digest())
    data = pack.pack_one_argument(ct, _CT_CODEC)
    assert app.call("decrypt_u64", data)[0] == 5

    # decode overflow after a valid decrypt -> 5 (fhe.rs:696 catch-all)
    big = FHE.ctx.encrypt(
        PLAIN_TYPES["u256"].encode((1 << 200), FHE.params),
        FHE.public_key, hashlib.sha512(b"o").digest())
    data = pack.pack_one_argument(big, _CT_CODEC)
    assert app.call("decrypt_u64", data)[0] == 5

    # mul with a relin-less pk -> SunscreenError (7); add still fine
    import dataclasses
    pk_norelin = dataclasses.replace(pk, relin=None)
    a = FHE.ctx.encrypt(PLAIN_TYPES["u64"].encode(2, FHE.params), pk,
                        hashlib.sha512(b"a").digest())
    data = pack.pack_binary_operation(pk_norelin, a, _CT_CODEC, a, _CT_CODEC)
    assert app.call("mul_cipheru64_cipheru64", data)[0] == 7
    assert app.call("add_cipheru64_cipheru64", data)[0] == 0


def test_concurrent_ops_bit_exact(setup):
    """4 threads hammer mul_relin/encrypt/decrypt concurrently; outputs must
    equal the single-threaded golden results (the C++ engine's per-thread
    scratch arena and const context make it thread-safe by design)."""
    from concurrent.futures import ThreadPoolExecutor

    ctx, eng, pk, sk, m, (c0, c1, _) = setup
    want_mul = ctx.mul_relin(c0, c1, pk.relin).data
    want_enc = ctx.encrypt(m[0], pk, b"\x09" * 64).data
    want_dec = ctx.decrypt(c0, sk)

    def worker(i):
        for _ in range(5):
            assert _eq(eng.mul_relin(c0, c1, pk.relin).data, want_mul)
            assert _eq(eng.encrypt(m[0], pk, b"\x09" * 64).data, want_enc)
            assert _eq(eng.decrypt(c0, sk), want_dec)
        return True

    with ThreadPoolExecutor(max_workers=4) as ex:
        assert all(ex.map(worker, range(4)))


def test_randomized_mul_chain(setup):
    """Depth-2 chain: engine outputs feed back in, staying bit-exact."""
    ctx, eng, pk, sk, m, (c0, c1, c2) = setup
    g = ctx.mul_relin(ctx.mul_relin(c0, c1, pk.relin), c2, pk.relin)
    v = eng.mul_relin(eng.mul_relin(c0, c1, pk.relin), c2, pk.relin)
    assert _eq(v.data, g.data)
    assert _eq(eng.decrypt(v, sk), ctx.decrypt(v, sk))


def test_concurrent_byte_path_consensus():
    """4 threads hammer the FULL byte path (unpack -> zstd -> compute ->
    repack) under engine="native"; every thread must emit the exact
    single-threaded bytes.  Covers the thread-local zstd context cache in
    serialization/seal.py on top of the engine's per-thread scratch."""
    import hashlib
    from concurrent.futures import ThreadPoolExecutor

    from fhe_precompiles_tpu import FheApp, pack
    from fhe_precompiles_tpu.app import _CT_CODEC
    from fhe_precompiles_tpu.encoding import PLAIN_TYPES
    from fhe_precompiles_tpu.testnet import one

    FHE = one.FHE
    app = FheApp(FHE.params, engine="native")
    pk, _sk = FHE.generate_keys()
    enc = PLAIN_TYPES["u64"].encode
    a = FHE.ctx.encrypt(enc(16, FHE.params), pk, hashlib.sha512(b"a").digest())
    b = FHE.ctx.encrypt(enc(4, FHE.params), pk, hashlib.sha512(b"b").digest())
    mul_in = pack.pack_binary_operation(pk, a, _CT_CODEC, b, _CT_CODEC)
    add_in = pack.pack_binary_operation(pk, a, _CT_CODEC, b, _CT_CODEC)
    net = FHE.ctx.encrypt(enc(7, FHE.params), FHE.public_key,
                          hashlib.sha512(b"n").digest())
    re_in = pack.pack_binary_operation(FHE.public_key, net, _CT_CODEC,
                                       b"ctx", pack.BYTES)
    jobs = [("mul_cipheru64_cipheru64", mul_in),
            ("add_cipheru64_cipheru64", add_in),
            ("reencrypt_u64", re_in)]
    want = {name: app.call(name, data) for name, data in jobs}
    assert all(code == 0 for code, _ in want.values())

    def worker(i):
        for name, data in jobs * 3:
            assert app.call(name, data) == want[name]
        return True

    with ThreadPoolExecutor(max_workers=4) as ex:
        assert all(ex.map(worker, range(4)))
