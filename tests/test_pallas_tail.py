"""Bit-exactness of the fused Pallas BEHZ-tail kernels (interpret mode on
CPU) against the XLA pair formulation of ops/behz_pair.py, segment by
segment and end-to-end through the engine."""
import numpy as np
import pytest

import jax.numpy as jnp

from fhe_precompiles_tpu.bfv import BfvContext
from fhe_precompiles_tpu.ops import pair as pr
from fhe_precompiles_tpu.ops.engine import JaxEngine
from fhe_precompiles_tpu.params import TESTNET_ONE

G = BfvContext(TESTNET_ONE)
RNG = np.random.default_rng(17)


@pytest.fixture(scope="module")
def engines():
    e_xla = JaxEngine(TESTNET_ONE, golden=G, ntt_backend="pair",
                      pair_tail="xla")
    e_pal = JaxEngine(TESTNET_ONE, golden=G, ntt_backend="pair",
                      pair_tail="pallas-interpret")
    return e_xla, e_pal


def _rand_rows(shape, mods):
    out = np.empty(shape + (G.n,), dtype=np.uint64)
    for idx in np.ndindex(shape[:-1]):
        for li, p in enumerate(mods):
            out[idx + (li,)] = RNG.integers(0, p, size=G.n, dtype=np.uint64)
    return out


def _eq(a: pr.Pair, b: pr.Pair) -> bool:
    return (np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
            and np.array_equal(np.asarray(a[1]), np.asarray(b[1])))


def test_to_bsk_ext(engines):
    e_xla, e_pal = engines
    pbx, pbp = e_xla._pairk, e_pal._pairk
    a = pr.to_pair(jnp.asarray(_rand_rows((2, 2, pbx.k), G.q_mods)))
    want_lo = jnp.concatenate(
        [a[0], pbx.to_bsk(a)[0]], axis=-2), jnp.concatenate(
        [a[1], pbx.to_bsk(a)[1]], axis=-2)
    got = pbp.tail.to_bsk_ext(a)
    assert _eq(got, want_lo)


def test_dyadic(engines):
    e_xla, e_pal = engines
    pbx, pbp = e_xla._pairk, e_pal._pairk
    mods = G.q_mods + G.Bsk
    fa = pr.to_pair(jnp.asarray(_rand_rows((3, 2, pbx.nb), mods)))
    fb = pr.to_pair(jnp.asarray(_rand_rows((3, 2, pbx.nb), mods)))
    tpa = pbx.tp_all
    import fhe_precompiles_tpu.ops.behz_pair as bz
    fa0, fa1 = bz._ix(fa, np.s_[:, 0]), bz._ix(fa, np.s_[:, 1])
    fb0, fb1 = bz._ix(fb, np.s_[:, 0]), bz._ix(fb, np.s_[:, 1])
    pa, mua, c64a = tpa.p, tpa.mu, tpa.c64
    t0 = pr.mulmod(fa0, fb0, pa, mua, c64a)
    t2 = pr.mulmod(fa1, fb1, pa, mua, c64a)
    cross = pr.mulmod(pr.addmod(fa0, fa1, pa), pr.addmod(fb0, fb1, pa),
                      pa, mua, c64a)
    t1 = pr.submod(pr.submod(cross, t0, pa), t2, pa)
    want = bz._stack([t0, t1, t2], axis=1)
    got = pbp.tail.dyadic(fa, fb)
    assert _eq(got, want)


def test_floor_sk(engines):
    e_xla, e_pal = engines
    pbx, pbp = e_xla._pairk, e_pal._pairk
    mods = G.q_mods + G.Bsk
    k = pbx.k
    tq = pr.to_pair(jnp.asarray(_rand_rows((2, 3, pbx.nb), mods)))
    import fhe_precompiles_tpu.ops.behz_pair as bz
    y = bz._ix(tq, np.s_[..., :k, :])
    conv = pbx._fastbconv(y, pbx.q_hat_mod_bsk, pbx.bsk, pbx.mu_bsk32, k)
    num = pr.submod(bz._ix(tq, np.s_[..., k:, :]), conv, pbx.bsk)
    floor_bsk = pr.mulmod_shoup(num, *pbx.inv_q_mod_bsk, pbx.bsk)
    want = pbx.fastbconv_sk(floor_bsk)
    got = pbp.tail.floor_sk(tq)
    assert _eq(got, want)


def test_mul_relin_end_to_end(engines):
    e_xla, e_pal = engines
    pk, sk = G.generate_keys(seed=b"\x21" * 64)
    rk = jnp.asarray(pk.relin.data)
    B = 1      # interpret mode simulates per-element; keep CI time sane
    a = jnp.asarray(_rand_rows((B, 2, G.k), G.q_mods))
    b = jnp.asarray(_rand_rows((B, 2, G.k), G.q_mods))
    out_x = np.asarray(e_xla._mul_relin(a, b, rk))
    out_p = np.asarray(e_pal._mul_relin(a, b, rk))
    assert np.array_equal(out_x, out_p)


def test_relin_dot_and_mod_down(engines):
    e_xla, e_pal = engines
    pbx, pbp = e_xla._pairk, e_pal._pairk
    import fhe_precompiles_tpu.ops.behz_pair as bz
    k, k_key = pbx.k, pbx.k_key
    km = [int(p) for p in G.key_mods]
    B = 2
    d_ntt = pr.to_pair(jnp.asarray(_rand_rows((B, k, k_key), km)))
    rk = pr.to_pair(jnp.asarray(_rand_rows((k, 2, k_key), km)))
    tpk = pbx.tp_key
    accs = []
    for comp in range(2):
        acc = pr.mulmod(bz._ix(d_ntt, np.s_[:, 0]), bz._ix(rk, np.s_[0, comp]),
                        tpk.p, tpk.mu, tpk.c64, lazy=True)
        for j in range(1, k):
            acc = pr.add_pair(acc, pr.mulmod(
                bz._ix(d_ntt, np.s_[:, j]), bz._ix(rk, np.s_[j, comp]),
                tpk.p, tpk.mu, tpk.c64, lazy=True))
        accs.append(pr.barrett(acc, tpk.mu, tpk.p, x_max_bits=44))
    want = bz._stack(accs, axis=1)
    got = pbp.tail.relin_dot(d_ntt, rk)
    assert _eq(got, want)

    # mod_down: acc (B,2,k_key,n) canonical + ct01 (B,2,k,n)
    acc_c = pr.to_pair(jnp.asarray(_rand_rows((B, 2, k_key), km)))
    ct01 = pr.to_pair(jnp.asarray(_rand_rows((B, 2, k), G.q_mods)))
    xP = bz._ix(acc_c, np.s_[..., k_key - 1, :])
    P_scalar = (pbx.P[0][0, 0], pbx.P[1][0, 0])
    xP_half = pr.addmod(xP, (pbx.P_half[0][0, 0], pbx.P_half[1][0, 0]),
                        P_scalar)
    corr = pr.submod(
        pr.csub_reduce(bz._ix(xP_half, np.s_[..., None, :]), pbx.q_mods,
                       pbx.steps_P_mod_q),
        pbx.half_mod_q, pbx.q_mods)
    ti = pr.submod(bz._ix(acc_c, np.s_[..., :k, :]), corr, pbx.q_mods)
    res = pr.mulmod_shoup(ti, *pbx.inv_P_mod_q, pbx.q_mods)
    want2 = pr.addmod(ct01, res, pbx.q_mods)
    got2 = pbp.tail.mod_down(acc_c, ct01)
    assert _eq(got2, want2)


def test_floor_sk_n8192_preset():
    """Different limb counts (k=3, nbsk=4) exercise every unrolled loop."""
    from fhe_precompiles_tpu.params import BENCH_N8192
    g8 = BfvContext(BENCH_N8192)
    e_xla = JaxEngine(BENCH_N8192, golden=g8, ntt_backend="pair",
                      pair_tail="xla")
    e_pal = JaxEngine(BENCH_N8192, golden=g8, ntt_backend="pair",
                      pair_tail="pallas-interpret")
    pbx, pbp = e_xla._pairk, e_pal._pairk
    mods = g8.q_mods + g8.Bsk
    k = pbx.k
    rng = np.random.default_rng(23)
    tq = np.empty((1, 3, pbx.nb, g8.n), dtype=np.uint64)
    for b in range(1):
        for j in range(3):
            for li, p in enumerate(mods):
                tq[b, j, li] = rng.integers(0, p, size=g8.n,
                                            dtype=np.uint64)
    tqp = pr.to_pair(jnp.asarray(tq))
    import fhe_precompiles_tpu.ops.behz_pair as bz
    y = bz._ix(tqp, np.s_[..., :k, :])
    conv = pbx._fastbconv(y, pbx.q_hat_mod_bsk, pbx.bsk, pbx.mu_bsk32, k)
    num = pr.submod(bz._ix(tqp, np.s_[..., k:, :]), conv, pbx.bsk)
    floor_bsk = pr.mulmod_shoup(num, *pbx.inv_q_mod_bsk, pbx.bsk)
    want = pbx.fastbconv_sk(floor_bsk)
    got = pbp.tail.floor_sk(tqp)
    assert _eq(got, want)

    a = np.empty((1, 2, k, g8.n), dtype=np.uint64)
    for li, p in enumerate(g8.q_mods):
        a[0, :, li] = rng.integers(0, p, size=(2, g8.n), dtype=np.uint64)
    ap = pr.to_pair(jnp.asarray(a))
    want2 = (jnp.concatenate([ap[0], pbx.to_bsk(ap)[0]], axis=-2),
             jnp.concatenate([ap[1], pbx.to_bsk(ap)[1]], axis=-2))
    got2 = pbp.tail.to_bsk_ext(ap)
    assert _eq(got2, want2)
