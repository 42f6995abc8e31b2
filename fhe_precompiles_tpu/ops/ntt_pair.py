"""Stage (butterfly) negacyclic NTT on u32-pair residues.

Identical transform to ``ops/ntt.py`` (SEAL bit-reversed Longa-Naehrig
layout, limb-stacked), but the data lives as two uint32 planes and every
twiddle multiply uses the specialized pair arithmetic of ``ops/pair.py``
(~20 native multiplies per butterfly vs ~2-3x that when XLA emulates the
u64 version).  Bit-exact with ops/ntt.py (tests/test_pair.py).

Tables are built from the same ``get_ntt_tables`` roots as the u64 path;
all constants stay host-side numpy so XLA embeds them.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..bfv.modmath import get_ntt_tables
from .modmath import shoup_precompute
from . import pair as pr


@dataclasses.dataclass(frozen=True)
class PairNttTables:
    """Twiddle tables for a stack of L moduli as u32 planes (host numpy)."""

    n: int
    p: tuple                    # pair of (L, 1) uint32
    p2: tuple                   # pair of (L, 1): 2*p (Harvey lazy bound)
    mu: np.ndarray              # (L, 1) uint32 single-word Barrett constants
    c64: tuple                  # pair of (L, 1): 2**64 mod p
    root: tuple                 # pair of (L, n) forward twiddles (bit-rev)
    root_shoup: tuple           # pair of (L, n)
    inv_root: tuple
    inv_root_shoup: tuple
    n_inv: tuple                # pair of (L, 1)
    n_inv_shoup: tuple


def build_pair_tables(moduli: Sequence[int], n: int,
                      n_inv_factors: Sequence[int] | None = None
                      ) -> PairNttTables:
    """n_inv_factors: optional per-limb constants folded into the inverse
    transform's n^-1 twiddle (same trick as ops/ntt.scale_n_inv)."""
    tabs = [get_ntt_tables(int(p), n) for p in moduli]
    p_arr = np.array([[int(p)] for p in moduli], dtype=np.uint64)
    root = np.stack([t.root_powers for t in tabs])
    inv_root = np.stack([t.inv_root_powers for t in tabs])
    n_inv = np.array([[int(t.n_inv)] for t in tabs], dtype=np.uint64)
    if n_inv_factors is not None:
        n_inv = ((n_inv.astype(object)
                  * np.array(list(n_inv_factors), dtype=object
                             ).reshape(-1, 1))
                 % p_arr.astype(object)).astype(np.uint64)
    c64 = np.array([[(1 << 64) % int(p)] for p in moduli], dtype=np.uint64)
    return PairNttTables(
        n=n,
        p=pr.split64(p_arr),
        p2=pr.split64(p_arr * np.uint64(2)),
        mu=pr.mu32(p_arr),
        c64=pr.split64(c64),
        root=pr.split64(root),
        root_shoup=pr.split64(shoup_precompute(root, p_arr)),
        inv_root=pr.split64(inv_root),
        inv_root_shoup=pr.split64(shoup_precompute(inv_root, p_arr)),
        n_inv=pr.split64(n_inv),
        n_inv_shoup=pr.split64(shoup_precompute(n_inv, p_arr)),
    )


def _tw(tab: tuple, L: int, m: int):
    """Slice twiddles [m:2m) and shape (L, m, 1) for stage broadcasting."""
    return (tab[0][:, m:2 * m].reshape((L, m, 1)),
            tab[1][:, m:2 * m].reshape((L, m, 1)))


def ntt_pair(a: pr.Pair, tb: PairNttTables) -> pr.Pair:
    """Forward NTT over pair arrays shaped (..., L, n); natural -> bit-rev.

    Harvey lazy butterflies (SEAL's discipline): values stay < 4p between
    stages; each butterfly does ONE conditional subtract (by 2p) and an
    exact-q Shoup product < 2p with no trailing subtracts:
        u  = lo - (lo >= 2p ? 2p : 0)            [< 2p]
        t  = shoup_exact_lazy(hi, w)             [< 2p]
        lo' = u + t ; hi' = u + 2p - t           [< 4p]
    The last stage folds the final canonical reduction in, so the output
    is bit-identical to the strict transform (ops/ntt.py).
    """
    n = tb.n
    lead = a[0].shape[:-2]
    L = a[0].shape[-2]
    pp = (tb.p[0].reshape((L, 1, 1)), tb.p[1].reshape((L, 1, 1)))
    pp2 = (tb.p2[0].reshape((L, 1, 1)), tb.p2[1].reshape((L, 1, 1)))
    m, t = 1, n
    while m < n:
        t //= 2
        last = (2 * m == n)
        v = tuple(x.reshape(lead + (L, m, 2, t)) for x in a)
        w = _tw(tb.root, L, m)
        ws = _tw(tb.root_shoup, L, m)
        u = pr._csub((v[0][..., 0, :], v[1][..., 0, :]), pp2)
        tt = pr.mulmod_shoup((v[0][..., 1, :], v[1][..., 1, :]), w, ws, pp,
                             lazy=True, exact_q=True)
        s = pr.add_pair(u, tt)
        d = pr.sub_pair(pr.add_pair(u, pp2), tt)
        if last:   # canonicalize inline: values < 4p -> < p
            s = pr._csub(pr._csub(s, pp2), pp)
            d = pr._csub(pr._csub(d, pp2), pp)
        a = tuple(jnp.stack(x, axis=-2).reshape(lead + (L, n))
                  for x in zip(s, d))
        m *= 2
    return a


def intt_pair(a: pr.Pair, tb: PairNttTables) -> pr.Pair:
    """Inverse NTT over pair arrays shaped (..., L, n); bit-rev -> natural.

    Harvey lazy inverse: values stay < 2p between stages
        s = lo + hi - (>= 2p ? 2p : 0)           [< 2p]
        d = shoup_exact_lazy(lo + 2p - hi, w)    [< 2p]
    and the final n^-1 twiddle multiply canonicalizes (exact-q, one
    subtract).  Bit-identical to the strict transform.
    """
    n = tb.n
    lead = a[0].shape[:-2]
    L = a[0].shape[-2]
    pp = (tb.p[0].reshape((L, 1, 1)), tb.p[1].reshape((L, 1, 1)))
    pp2 = (tb.p2[0].reshape((L, 1, 1)), tb.p2[1].reshape((L, 1, 1)))
    m, t = n // 2, 1
    while m >= 1:
        v = tuple(x.reshape(lead + (L, m, 2, t)) for x in a)
        w = _tw(tb.inv_root, L, m)
        ws = _tw(tb.inv_root_shoup, L, m)
        lo = (v[0][..., 0, :], v[1][..., 0, :])
        hi = (v[0][..., 1, :], v[1][..., 1, :])
        s = pr._csub(pr.add_pair(lo, hi), pp2)
        d = pr.mulmod_shoup(pr.sub_pair(pr.add_pair(lo, pp2), hi), w, ws, pp,
                            lazy=True, exact_q=True)
        a = tuple(jnp.stack(x, axis=-2).reshape(lead + (L, n))
                  for x in zip(s, d))
        t *= 2
        m //= 2
    return pr.mulmod_shoup(a, tb.n_inv, tb.n_inv_shoup, tb.p, exact_q=True)


def pointwise_mulmod_pair(a: pr.Pair, b: pr.Pair,
                          tb: PairNttTables) -> pr.Pair:
    """General (data x data) product mod the stacked moduli."""
    return pr.mulmod(a, b, tb.p, tb.mu, tb.c64)
