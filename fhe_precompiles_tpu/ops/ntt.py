"""Batched negacyclic NTT for XLA/TPU, vectorized across RNS limbs.

Same transform as the golden model (``bfv/ntt.py``, SEAL bit-reversed
layout); here the limb axis is *stacked*: input shape (..., L, n) with one
twiddle table row per limb, so each of the log2(n) stages is a single fused
elementwise op over the whole tensor -- no per-limb dispatch, ideal for the
VPU.  Twiddle multiplies use Shoup precomputation (ops/modmath.py).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..bfv.modmath import get_ntt_tables
from .modmath import addmod, barrett_mu, mulmod, mulmod_shoup, shoup_precompute, submod


@dataclasses.dataclass(frozen=True)
class StackedNttTables:
    """Twiddle tables for a stack of L moduli (host constants, XLA-embedded)."""

    n: int
    p: np.ndarray               # (L, 1) uint64
    mu: np.ndarray              # (L, 1) uint64 Barrett constants
    root: np.ndarray            # (L, n) forward twiddles, bit-reversed layout
    root_shoup: np.ndarray      # (L, n)
    inv_root: np.ndarray        # (L, n)
    inv_root_shoup: np.ndarray
    n_inv: np.ndarray           # (L, 1)
    n_inv_shoup: np.ndarray     # (L, 1)


def build_tables(moduli: Sequence[int], n: int) -> StackedNttTables:
    tabs = [get_ntt_tables(int(p), n) for p in moduli]
    p_arr = np.array([[int(p)] for p in moduli], dtype=np.uint64)
    root = np.stack([t.root_powers for t in tabs])
    inv_root = np.stack([t.inv_root_powers for t in tabs])
    n_inv = np.array([[int(t.n_inv)] for t in tabs], dtype=np.uint64)
    # Tables stay host-side numpy: XLA embeds them as compile-time
    # constants (device-resident closure constants would be fetched back to
    # host at jit-lowering time -- pathological over a remote-TPU tunnel).
    return StackedNttTables(
        n=n,
        p=p_arr,
        mu=barrett_mu(p_arr),
        root=root,
        root_shoup=shoup_precompute(root, p_arr),
        inv_root=inv_root,
        inv_root_shoup=shoup_precompute(inv_root, p_arr),
        n_inv=n_inv,
        n_inv_shoup=shoup_precompute(n_inv, p_arr),
    )


def ntt(a: jnp.ndarray, tb: StackedNttTables) -> jnp.ndarray:
    """Forward NTT over shape (..., L, n); natural -> bit-reversed order."""
    n = tb.n
    lead = a.shape[:-2]
    L = a.shape[-2]
    pp = tb.p.reshape((L, 1, 1))
    m, t = 1, n
    while m < n:
        t //= 2
        v = a.reshape(lead + (L, m, 2, t))
        w = tb.root[:, m:2 * m].reshape((L, m, 1))
        ws = tb.root_shoup[:, m:2 * m].reshape((L, m, 1))
        lo = v[..., 0, :]
        hi = mulmod_shoup(v[..., 1, :], w, ws, pp)
        v = jnp.stack([addmod(lo, hi, pp), submod(lo, hi, pp)], axis=-2)
        a = v.reshape(lead + (L, n))
        m *= 2
    return a


def intt(a: jnp.ndarray, tb: StackedNttTables) -> jnp.ndarray:
    """Inverse NTT over shape (..., L, n); bit-reversed -> natural order."""
    n = tb.n
    lead = a.shape[:-2]
    L = a.shape[-2]
    m, t = n // 2, 1
    while m >= 1:
        v = a.reshape(lead + (L, m, 2, t))
        w = tb.inv_root[:, m:2 * m].reshape((L, m, 1))
        ws = tb.inv_root_shoup[:, m:2 * m].reshape((L, m, 1))
        pp = tb.p.reshape((L, 1, 1))
        lo = v[..., 0, :]
        hi = v[..., 1, :]
        v = jnp.stack([addmod(lo, hi, pp),
                       mulmod_shoup(submod(lo, hi, pp), w, ws, pp)], axis=-2)
        a = v.reshape(lead + (L, n))
        t *= 2
        m //= 2
    return mulmod_shoup(a, tb.n_inv, tb.n_inv_shoup, tb.p)


def pointwise_mulmod(a: jnp.ndarray, b: jnp.ndarray,
                     tb: StackedNttTables) -> jnp.ndarray:
    """General (data x data) product mod the stacked moduli, shape (..., L, n)."""
    return mulmod(a, b, tb.p, tb.mu)


def scale_n_inv(tb: StackedNttTables, factors: Sequence[int]
                ) -> StackedNttTables:
    """Tables whose inverse transform also multiplies by `factors[limb]`.

    Folds a constant per-limb scale (e.g. the plaintext modulus t in
    BFV's FastFloor) into the INTT's final n^-1 twiddle -- one fused
    Shoup multiply instead of a separate general modmul pass.  Exact:
    (x * n_inv mod p) * c mod p == x * (n_inv * c mod p) mod p.
    """
    import dataclasses as _dc
    p = tb.p.reshape(-1)
    n_inv = (tb.n_inv.reshape(-1).astype(object)
             * np.array(list(factors), dtype=object)) % p.astype(object)
    n_inv = n_inv.astype(np.uint64).reshape(tb.n_inv.shape)
    return _dc.replace(tb, n_inv=n_inv,
                       n_inv_shoup=shoup_precompute(n_inv, tb.p))
