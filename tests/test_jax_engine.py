"""Bit-exactness of the JAX/TPU engine vs the golden CPU model.

These are the consensus-critical tests: a TPU validator and a CPU validator
must produce identical ciphertext bytes for every operation.
"""
import numpy as np
import pytest

from fhe_precompiles_tpu.bfv import BfvContext
from fhe_precompiles_tpu.encoding import decode_unsigned, encode_unsigned
from fhe_precompiles_tpu.ops.engine import JaxEngine
from fhe_precompiles_tpu.params import TESTNET_ONE


@pytest.fixture(scope="module")
def ctx():
    return BfvContext(TESTNET_ONE)


@pytest.fixture(scope="module", params=["stage", "pair"])
def eng(ctx, request):
    """Every bit-exactness assertion runs under both the u64 stage backend
    (CPU default) and the u32-pair backend (TPU default)."""
    return JaxEngine(TESTNET_ONE, golden=ctx, ntt_backend=request.param)


@pytest.fixture(scope="module")
def keys(ctx):
    return ctx.generate_keys(seed=b"\x91" * 64)


@pytest.fixture(scope="module")
def cts(ctx, keys):
    pk, _ = keys
    a = ctx.encrypt(encode_unsigned(16, TESTNET_ONE, 256), pk, b"\x92" * 64)
    b = ctx.encrypt(encode_unsigned(4, TESTNET_ONE, 256), pk, b"\x93" * 64)
    return a, b


def test_add_sub_neg_bitexact(ctx, eng, cts):
    a, b = cts
    assert np.array_equal(eng.add(a, b).data, ctx.add(a, b).data)
    assert np.array_equal(eng.sub(a, b).data, ctx.sub(a, b).data)
    assert np.array_equal(eng.negate(a).data, ctx.negate(a).data)


def test_plain_ops_bitexact(ctx, eng, cts):
    a, _ = cts
    m = encode_unsigned(4, TESTNET_ONE, 256)
    assert np.array_equal(eng.add_plain(a, m).data, ctx.add_plain(a, m).data)
    assert np.array_equal(eng.sub_plain(a, m).data, ctx.sub_plain(a, m).data)
    assert np.array_equal(eng.plain_sub(m, a).data, ctx.plain_sub(m, a).data)
    assert np.array_equal(eng.mul_plain(a, m).data, ctx.mul_plain(a, m).data)


def test_multiply_bitexact(ctx, eng, cts):
    a, b = cts
    got = eng.multiply(a, b)
    want = ctx.multiply(a, b)
    assert np.array_equal(got.data, want.data)


def test_relinearize_and_mul_relin_bitexact(ctx, eng, cts, keys):
    pk, sk = keys
    a, b = cts
    ct3 = ctx.multiply(a, b)
    got = eng.relinearize(ct3, pk.relin)
    want = ctx.relinearize(ct3, pk.relin)
    assert np.array_equal(got.data, want.data)
    got2 = eng.mul_relin(a, b, pk.relin)
    assert np.array_equal(got2.data, want.data)
    assert decode_unsigned(ctx.decrypt(got2, sk), TESTNET_ONE, 256) == 64


def test_encrypt_batch_bitexact(ctx, eng, keys):
    pk, sk = keys
    B = 3
    plains = np.stack([encode_unsigned(v, TESTNET_ONE, 64)
                       for v in (5, 7, 11)])
    seeds = [bytes([i + 1]) * 64 for i in range(B)]
    batch = np.asarray(eng.encrypt_batch(plains, pk, seeds))
    for i, v in enumerate((5, 7, 11)):
        want = ctx.encrypt(plains[i], pk, seeds[i])
        assert np.array_equal(batch[i], want.data)
        from fhe_precompiles_tpu.bfv.golden import Ciphertext
        assert decode_unsigned(
            ctx.decrypt(Ciphertext(TESTNET_ONE, batch[i]), sk),
            TESTNET_ONE, 64) == v


def test_batched_mul_relin_matches_per_element(ctx, eng, keys):
    pk, sk = keys
    import jax.numpy as jnp
    B = 2
    plains_a = [encode_unsigned(v, TESTNET_ONE, 64) for v in (3, 9)]
    plains_b = [encode_unsigned(v, TESTNET_ONE, 64) for v in (5, 6)]
    cts_a = [ctx.encrypt(p, pk, bytes([0xa0 + i]) * 64)
             for i, p in enumerate(plains_a)]
    cts_b = [ctx.encrypt(p, pk, bytes([0xb0 + i]) * 64)
             for i, p in enumerate(plains_b)]
    batch_a = jnp.asarray(np.stack([c.data for c in cts_a]))
    batch_b = jnp.asarray(np.stack([c.data for c in cts_b]))
    out = np.asarray(eng._mul_relin(batch_a, batch_b,
                                    jnp.asarray(pk.relin.data)))
    for i in range(B):
        want = ctx.mul_relin(cts_a[i], cts_b[i], pk.relin)
        assert np.array_equal(out[i], want.data)


def test_device_decrypt_matches_golden(ctx, eng, keys, cts):
    pk, sk = keys
    a, b = cts
    batch = np.stack([a.data, b.data])
    out = np.asarray(eng.decrypt_batch(batch, sk))
    assert np.array_equal(out[0], ctx.decrypt(a, sk))
    assert np.array_equal(out[1], ctx.decrypt(b, sk))
    # post-multiplication noise profile too
    prod = ctx.mul_relin(a, b, pk.relin)
    out2 = np.asarray(eng.decrypt_batch(prod.data[None], sk))[0]
    assert np.array_equal(out2, ctx.decrypt(prod, sk))
    assert decode_unsigned(out2, TESTNET_ONE, 256) == 64


@pytest.mark.parametrize("backend", ["stage", "pair"])
def test_mul_relin_bitexact_at_n8192_preset(backend):
    """Pin the engine op-reduction bounds (csub steps, t-scaled INTT, pair
    lazy-accumulation widths) on a 3-ct-limb / larger-t parameter set, not
    just testnet-one."""
    from fhe_precompiles_tpu.bfv.golden import Ciphertext
    from fhe_precompiles_tpu.params import BENCH_N8192
    ctx8 = BfvContext(BENCH_N8192)
    eng8 = JaxEngine(BENCH_N8192, golden=ctx8, ntt_backend=backend)
    pk8, _ = ctx8.generate_keys(seed=b"\x53" * 64)
    rng = np.random.default_rng(5)
    mk = lambda s: Ciphertext(BENCH_N8192, np.stack([
        np.stack([rng.integers(0, p, size=(BENCH_N8192.n,), dtype=np.uint64)
                  for p in ctx8.q_mods]) for _ in range(s)]))
    a, b = mk(2), mk(2)
    want = ctx8.mul_relin(a, b, pk8.relin)
    got = eng8.mul_relin(a, b, pk8.relin)
    assert np.array_equal(got.data, want.data)


def test_relin_shoup_table_bitexact(ctx, eng, keys, cts):
    """The per-key Shoup table path (relin_shoup + rk_ws argument) is
    byte-identical to the general-modmul relin path on both backends.

    The single-item API passes rk_ws automatically; here both jit
    signatures are exercised explicitly, plus the prepared-operand path.
    """
    import jax.numpy as jnp
    pk, _ = keys
    a, b = cts
    rk = jnp.asarray(pk.relin.data)
    rk_ws_np = eng.relin_shoup(pk.relin.data)
    # exactness of the host table itself
    p = np.asarray(ctx.key_mods, dtype=np.uint64).reshape(1, 1, -1, 1)
    i = (0, 1, 2, 7)
    assert int(rk_ws_np[0, 1, 2, 7]) == (
        int(pk.relin.data[i]) << 64) // int(p[0, 0, 2, 0])
    # cache hit returns the same array
    assert eng.relin_shoup(pk.relin.data) is rk_ws_np
    rk_ws = jnp.asarray(rk_ws_np)
    aj = jnp.asarray(a.data)[None]
    bj = jnp.asarray(b.data)[None]
    base = np.asarray(eng._mul_relin(aj, bj, rk))
    fast = np.asarray(eng._mul_relin(aj, bj, rk, rk_ws))
    assert np.array_equal(base, fast)
    ct3 = jnp.asarray(ctx.multiply(a, b).data)[None]
    assert np.array_equal(np.asarray(eng._relinearize(ct3, rk)),
                          np.asarray(eng._relinearize(ct3, rk, rk_ws)))
    fa, fb = eng._prepare(aj), eng._prepare(bj)
    assert np.array_equal(
        np.asarray(eng._mul_relin_prepared(fa, fb, rk)),
        np.asarray(eng._mul_relin_prepared(fa, fb, rk, rk_ws)))


def test_prepared_multiply_bitexact(ctx, eng, keys, cts):
    """prepare + _mul_relin_prepared == direct mul_relin, bit-for-bit."""
    import jax.numpy as jnp
    pk, _ = keys
    a, b = cts
    direct = eng.mul_relin(a, b, pk.relin)
    fa = eng._prepare(jnp.asarray(a.data)[None])
    fb = eng._prepare(jnp.asarray(b.data)[None])
    prepped = np.asarray(eng._mul_relin_prepared(
        fa, fb, jnp.asarray(pk.relin.data)))[0]
    assert np.array_equal(prepped, direct.data)
