"""Exact modular arithmetic on jnp uint64 -- division-free (TPU-friendly).

Same semantics as ``bfv/modmath.py`` (the golden model) but engineered for
XLA on TPU: no integer division/remainder in any hot path.  Reductions use
single-word Barrett (mu = floor(2^64/p)) and twiddle multiplies use Shoup
precomputation; both verified bit-exact vs the golden model.

Moduli are always < 2**37 (params.validate), broadcastable: `p` / `mu` may be
scalars or arrays shaped to broadcast over the data (e.g. (k, 1) to vectorize
one op across all RNS limbs at once -- the key layout trick of this engine).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# numpy scalars, not jnp: creating device values at import time would
# initialize the XLA backend before jax.distributed.initialize can run
_M32 = np.uint64(0xFFFFFFFF)
_S32 = np.uint64(32)
_S19 = np.uint64(19)
_MASK19 = np.uint64((1 << 19) - 1)


def hi64(x, y):
    """High 64 bits of the 128-bit product x*y (u64 inputs)."""
    xl, xh = x & _M32, x >> _S32
    yl, yh = y & _M32, y >> _S32
    ll = xl * yl
    m1 = xh * yl
    m2 = xl * yh
    hh = xh * yh
    carry = ((ll >> _S32) + (m1 & _M32) + (m2 & _M32)) >> _S32
    return hh + (m1 >> _S32) + (m2 >> _S32) + carry


def barrett_reduce(x, p, mu):
    """x mod p for x < 2**63, p < 2**37, mu = floor(2**64/p)."""
    q = hi64(x, mu)
    r = x - q * p
    r = jnp.where(r >= p, r - p, r)
    r = jnp.where(r >= p, r - p, r)
    return r


def addmod(a, b, p):
    s = a + b
    return jnp.where(s >= p, s - p, s)


def submod(a, b, p):
    return jnp.where(a >= b, a - b, a + (p - b))


def negmod(a, p):
    return jnp.where(a == 0, a, p - a)


def mulmod(a, b, p, mu):
    """(a*b) mod p, exact, for a,b < p < 2**37 (19-bit split + Barrett)."""
    ah = a >> _S19
    al = a & _MASK19
    m1 = barrett_reduce(ah * b, p, mu)          # ah*b < 2**55
    return barrett_reduce((m1 << _S19) + al * b, p, mu)   # < 2**57


def mulmod_shoup(a, w, w_shoup, p):
    """(a*w) mod p with precomputed w_shoup = floor(w*2**64/p); a,w < p.

    Half the cost of general mulmod -- used for every NTT twiddle multiply.
    """
    q = hi64(a, w_shoup)
    r = a * w - q * p
    return jnp.where(r >= p, r - p, r)


def shoup_precompute(w: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Host-side exact floor(w * 2**64 / p) as uint64."""
    w = np.asarray(w, dtype=np.uint64)
    p_b = np.broadcast_to(np.asarray(p, dtype=np.uint64), w.shape)
    flat_w = w.reshape(-1)
    flat_p = p_b.reshape(-1)
    out = np.array([(int(x) << 64) // int(q) for x, q in zip(flat_w, flat_p)],
                   dtype=np.uint64)
    return out.reshape(w.shape)


def barrett_mu(p) -> np.ndarray:
    """Host-side mu = floor(2**64 / p) as uint64 (elementwise)."""
    arr = np.asarray(p, dtype=np.uint64)
    flat = arr.reshape(-1)
    out = np.array([(1 << 64) // int(q) for q in flat], dtype=np.uint64)
    return out.reshape(arr.shape)


def csub_reduce(x, p, steps: int):
    """x mod p via `steps` conditional subtracts -- exact iff x < (steps+1)*p.

    For range-bounded inputs (e.g. residues < 2**37 reduced mod ~2**36
    primes) this replaces a full Barrett reduction (one 64x64 mulhi + two
    multiplies) with 1-2 compare-selects; callers compute `steps` host-side
    from the proven input bound.
    """
    # broadcast against the modulus stack even when steps == 0 (callers
    # rely on barrett_reduce's implicit limb-axis broadcast)
    x = jnp.broadcast_to(x, jnp.broadcast_shapes(jnp.shape(x), np.shape(p)))
    for _ in range(steps):
        x = jnp.where(x >= p, x - p, x)
    return x
