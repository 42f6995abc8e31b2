"""Bit-exactness of the u32-pair arithmetic (ops/pair.py) and pair NTT.

Every primitive is checked against Python-int references over random draws
plus adversarial carry corners (operands at p-1, words at 0xFFFFFFFF,
values just below the documented input bounds).  The pair NTT must equal
the u64 stage NTT (ops/ntt.py) array-for-array.
"""
import numpy as np
import pytest

from fhe_precompiles_tpu.bfv import BfvContext
from fhe_precompiles_tpu.ops import pair as pr
from fhe_precompiles_tpu.ops.modmath import shoup_precompute
from fhe_precompiles_tpu.ops.ntt import build_tables, intt, ntt
from fhe_precompiles_tpu.ops.ntt_pair import (build_pair_tables, intt_pair,
                                              ntt_pair)
from fhe_precompiles_tpu.params import TESTNET_ONE

G = BfvContext(TESTNET_ONE)
# every modulus the hot path touches (ct, key, Bsk, m_sk, gamma)
MODULI = sorted(set(G.q_mods + G.key_mods + G.Bsk
                    + [G.m_sk, TESTNET_ONE.gamma]))
RNG = np.random.default_rng(7)


def _pairify(x):
    return pr.split64(np.asarray(x, dtype=np.uint64))


def _join(t):
    return (np.asarray(t[0], dtype=np.uint64)
            | (np.asarray(t[1], dtype=np.uint64) << np.uint64(32)))


def _draw_mod(p, size):
    """Residues < p with adversarial corners mixed in."""
    x = RNG.integers(0, p, size=size, dtype=np.uint64)
    corners = np.array([c % p for c in
                        (0, 1, p - 1, p // 2, (1 << 32) - 1, 1 << 32,
                         (1 << 32) + 1, p - (1 << 32))], dtype=np.uint64)
    x[:corners.size] = corners
    return x


@pytest.mark.parametrize("p", MODULI)
def test_pair_addsub_negmod(p):
    N = 4096
    a = _draw_mod(p, N)
    b = _draw_mod(p, N)
    pp = _pairify(np.uint64(p))
    got_add = _join(pr.addmod(_pairify(a), _pairify(b), pp))
    got_sub = _join(pr.submod(_pairify(a), _pairify(b), pp))
    got_neg = _join(pr.negmod(_pairify(a), pp))
    ref = (a.astype(object) + b.astype(object)) % p
    assert (got_add.astype(object) == ref).all()
    ref = (a.astype(object) - b.astype(object)) % p
    assert (got_sub.astype(object) == ref).all()
    ref = (-a.astype(object)) % p
    assert (got_neg.astype(object) == ref).all()


@pytest.mark.parametrize("p", MODULI + [65536])  # m_tilde included: any p<2^37
def test_pair_mulmod_shoup(p):
    N = 4096
    # a may exceed p (FastBconv feeds residues of a *different* base):
    # contract is a < 2**37
    a = _draw_mod(min(1 << 37, 1 << 37), N) % np.uint64(1 << 37)
    a[:8] = _draw_mod(p, 8)
    w = _draw_mod(p, N)
    ws = shoup_precompute(w, np.uint64(p))
    got = _join(pr.mulmod_shoup(_pairify(a), _pairify(w), _pairify(ws),
                                _pairify(np.uint64(p))))
    ref = (a.astype(object) * w.astype(object)) % p
    assert (got.astype(object) == ref).all()


@pytest.mark.parametrize("p", MODULI)
def test_pair_mulmod_shoup_lazy_bound(p):
    N = 2048
    a = _draw_mod(1 << 37, N)
    w = _draw_mod(p, N)
    ws = shoup_precompute(w, np.uint64(p))
    lazy = pr.mulmod_shoup(_pairify(a), _pairify(w), _pairify(ws),
                           _pairify(np.uint64(p)), lazy=True)
    v = _join(lazy).astype(object)
    ref = (a.astype(object) * w.astype(object)) % p
    assert ((v - ref) % p == 0).all()
    assert (v < 3 * p).all()


@pytest.mark.parametrize("p", MODULI)
@pytest.mark.parametrize("bits", [48, 62, 64])
def test_pair_barrett(p, bits):
    N = 4096
    hi = (1 << bits) - 1
    x = RNG.integers(0, hi, size=N, dtype=np.uint64) \
        if bits < 64 else RNG.integers(0, 1 << 63, size=N,
                                       dtype=np.uint64) * 2 + RNG.integers(
                                           0, 2, size=N, dtype=np.uint64)
    # corners: multiples of p +- 1, max value, carry-heavy words
    corners = np.array([hi, hi - 1, (hi // p) * p, (hi // p) * p - 1,
                        (1 << 32) - 1, (1 << 62) - 1 if bits >= 62 else 0,
                        p - 1, 0], dtype=np.uint64)
    x[:corners.size] = corners
    got = _join(pr.barrett(_pairify(x), np.uint32((1 << 64) // p),
                           _pairify(np.uint64(p)), x_max_bits=bits))
    ref = x.astype(object) % p
    assert (got.astype(object) == ref).all()


@pytest.mark.parametrize("p", MODULI)
def test_pair_mulmod_general(p):
    N = 4096
    a = _draw_mod(p, N)
    b = _draw_mod(p, N)
    c64 = _pairify(np.uint64((1 << 64) % p))
    got = _join(pr.mulmod(_pairify(a), _pairify(b),
                          _pairify(np.uint64(p)),
                          np.uint32((1 << 64) // p), c64))
    ref = (a.astype(object) * b.astype(object)) % p
    assert (got.astype(object) == ref).all()


def test_pair_mulmod_fold_overflow_corner():
    """Exercise the 2**64 carry-out branch of the three-word fold."""
    p = G.Bsk[-1]
    # maximize v0 + 2**32*v1: a*b with both near p-1 makes v1 large; scan a
    # dense grid near the top to hit the fold-overflow branch
    vals = np.arange(p - 3000, p, dtype=np.uint64)
    a = np.repeat(vals, 4)[:8192]
    b = np.tile(vals, 4)[:8192]
    c64 = _pairify(np.uint64((1 << 64) % p))
    got = _join(pr.mulmod(_pairify(a), _pairify(b),
                          _pairify(np.uint64(p)),
                          np.uint32((1 << 64) // p), c64))
    ref = (a.astype(object) * b.astype(object)) % p
    assert (got.astype(object) == ref).all()


# ----------------------------------------------------------------------
# pair NTT vs u64 stage NTT
# ----------------------------------------------------------------------

@pytest.mark.parametrize("n", [256, 4096])
@pytest.mark.parametrize("shoup_bits", [40, 64])
@pytest.mark.parametrize("radix_log2", [2, 3])
def test_pair_ntt_matches_stage(n, shoup_bits, radix_log2):
    mods = G.q_mods + G.Bsk
    L = len(mods)
    tb64 = build_tables(mods, n)
    tbp = build_pair_tables(mods, n, shoup_bits=shoup_bits)
    x = np.stack([_draw_mod(m, n) for m in mods])[None]  # (1, L, n)
    ref = np.asarray(ntt(np.asarray(x, dtype=np.uint64), tb64))
    got = _join(ntt_pair(_pairify(x), tbp, radix_log2=radix_log2))
    assert (got == ref).all()
    back = _join(intt_pair(_pairify(got), tbp, radix_log2=radix_log2))
    assert (back == x).all()
    ref_b = np.asarray(intt(np.asarray(ref, dtype=np.uint64), tb64))
    assert (back == ref_b).all()


def test_pair_ntt_tscaled_matches_scale_n_inv():
    from fhe_precompiles_tpu.ops.ntt import scale_n_inv
    n = 1024
    mods = G.q_mods + G.Bsk
    t = TESTNET_ONE.t
    tb64 = scale_n_inv(build_tables(mods, n), [t] * len(mods))
    tbp = build_pair_tables(mods, n, n_inv_factors=[t] * len(mods))
    x = np.stack([_draw_mod(m, n) for m in mods])[None]
    ref = np.asarray(intt(np.asarray(x, dtype=np.uint64), tb64))
    got = _join(intt_pair(_pairify(x), tbp))
    assert (got == ref).all()


@pytest.mark.parametrize("p", MODULI)
def test_pair_mulmod_general_lazy_bound(p):
    N = 2048
    a = _draw_mod(1 << 37, N)
    b = _draw_mod(p, N)
    c64 = _pairify(np.uint64((1 << 64) % p))
    lazy = pr.mulmod(_pairify(a), _pairify(b), _pairify(np.uint64(p)),
                     np.uint32((1 << 64) // p), c64, lazy=True)
    v = _join(lazy).astype(object)
    ref = (a.astype(object) * b.astype(object)) % p
    assert ((v - ref) % p == 0).all()
    assert (v < 2 * p).all()


@pytest.mark.parametrize("p", MODULI)
def test_pair_csub_reduce(p):
    N = 2048
    steps = 3
    x = RNG.integers(0, (steps + 1) * p, size=N, dtype=np.uint64)
    x[:2] = [(steps + 1) * p - 1, 0]
    got = _join(pr.csub_reduce(_pairify(x), _pairify(np.uint64(p)), steps))
    assert (got.astype(object) == x.astype(object) % p).all()


@pytest.mark.parametrize("p", MODULI)
def test_pair_mulmod_shoup_exact_q_harvey_contract(p):
    """exact_q: canonical result for a < 4p, and lazy bound < 2p."""
    N = 2048
    a = RNG.integers(0, 4 * p, size=N, dtype=np.uint64)
    a[:4] = [4 * p - 1, 2 * p, p, 0]
    w = _draw_mod(p, N)
    ws = shoup_precompute(w, np.uint64(p))
    args = (_pairify(a), _pairify(w), _pairify(ws), _pairify(np.uint64(p)))
    got = _join(pr.mulmod_shoup(*args, exact_q=True))
    ref = (a.astype(object) * w.astype(object)) % p
    assert (got.astype(object) == ref).all()
    v = _join(pr.mulmod_shoup(*args, exact_q=True, lazy=True)).astype(object)
    assert ((v - ref) % p == 0).all() and (v < 2 * p).all()


@pytest.mark.parametrize("p", MODULI)
def test_pair_mulmod_shoup40_harvey_contract(p):
    """beta=40 Shoup: canonical for a < 4p, lazy bound < 2p (actually
    < 1.5p by the Harvey bound with a < 2**39); identical residues to the
    64-bit exact-q path."""
    N = 2048
    a = RNG.integers(0, 4 * p, size=N, dtype=np.uint64)
    a[:4] = [4 * p - 1, 2 * p, p, 0]
    w = _draw_mod(p, N)
    ws = pr.shoup40(w, np.uint64(p))
    args = (_pairify(a), _pairify(w), _pairify(ws), _pairify(np.uint64(p)))
    ref = (a.astype(object) * w.astype(object)) % p
    got = _join(pr.mulmod_shoup40(*args))
    assert (got.astype(object) == ref).all()
    v = _join(pr.mulmod_shoup40(*args, lazy=True)).astype(object)
    assert ((v - ref) % p == 0).all() and (v < 2 * p).all()


def test_ntt_pair_hi8_boundary_bit_exact():
    """u8 hi-plane chunk boundaries (measured-negative perf probe) must
    stay bit-identical to the u32 path."""
    import numpy as np
    from fhe_precompiles_tpu.bfv import BfvContext
    from fhe_precompiles_tpu.ops.ntt_pair import (build_pair_tables,
                                                  intt_pair, ntt_pair)
    from fhe_precompiles_tpu.ops.pair import from_pair, to_pair
    from fhe_precompiles_tpu.params import TESTNET_ONE

    g = BfvContext(TESTNET_ONE)
    mods = g.q_mods + g.Bsk
    n = g.n
    rng = np.random.default_rng(5)
    x = np.stack([np.stack([rng.integers(0, p, size=(n,), dtype=np.uint64)
                            for p in mods]) for _ in range(3)])
    tb = build_pair_tables(mods, n)
    a = to_pair(x)
    f_ref = np.asarray(from_pair(ntt_pair(a, tb)))
    f_hi8 = np.asarray(from_pair(ntt_pair(a, tb, hi8=True)))
    assert (f_ref == f_hi8).all()
    b_ref = np.asarray(from_pair(intt_pair(to_pair(f_ref), tb)))
    b_hi8 = np.asarray(from_pair(intt_pair(to_pair(f_ref), tb, hi8=True)))
    assert (b_ref == b_hi8).all()
    assert (b_ref == x).all()
