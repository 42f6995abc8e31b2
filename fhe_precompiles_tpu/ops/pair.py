"""u32-pair modular arithmetic specialized for p < 2**37 (TPU-native).

The stage NTT / BEHZ pipeline originally ran on jnp.uint64, which XLA
emulates on TPU as u32 pairs with *generic* 64-bit semantics: every u64
multiply costs a full 64x64 low-product (and ``hi64`` costs four of them)
even though our values never exceed 2**38.  This module keeps residues as
explicit (lo, hi) uint32 planes and exploits the range facts the emulation
cannot see:

  * residues, moduli, twiddles are < 2**37  ->  hi words < 2**5 (16-bit
    multiplies suffice for every cross term)
  * Barrett mu = floor(2**64/p) < 2**28    ->  a SINGLE u32 word
  * intermediate r < 4p < 2**39            ->  the subtraction a*w - q*p
    is exact on (lo, hi) pairs with plain wrapping arithmetic

Bit-exact with ops/modmath.py (tests/test_pair.py proves it exhaustively
against Python ints, including adversarial carry corners).

Conventions: a "pair" is a tuple (lo, hi) of equal-shaped uint32 arrays;
constants come from :func:`split64` (host numpy) so XLA embeds them.
Reference capability: SEAL's Harvey/Barrett 64-bit kernels
(SURVEY.md section 2.2 "Modular multiply primitives").
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

_M16 = np.uint32(0xFFFF)
_S16 = np.uint32(16)
_U32 = np.uint64(0xFFFFFFFF)
_S32 = np.uint64(32)

Pair = Tuple[jnp.ndarray, jnp.ndarray]


# ----------------------------------------------------------------------
# host-side helpers (numpy, compile-time constants)
# ----------------------------------------------------------------------

def split64(x) -> Tuple[np.ndarray, np.ndarray]:
    """Host numpy uint64 -> (lo, hi) uint32 planes."""
    a = np.asarray(x, dtype=np.uint64)
    return ((a & _U32).astype(np.uint32), (a >> _S32).astype(np.uint32))


def mu32(p) -> np.ndarray:
    """Single-word Barrett constant floor(2**64/p); requires p > 2**36 is
    NOT needed -- only mu < 2**32, i.e. p > 2**32 (true for all supported
    ct/key moduli, asserted)."""
    arr = np.asarray(p, dtype=np.uint64).reshape(-1)
    out = np.array([(1 << 64) // int(q) for q in arr], dtype=np.uint64)
    assert (out >> 32 == 0).all(), "pair path requires moduli > 2**32"
    return out.astype(np.uint32).reshape(np.shape(p))


# ----------------------------------------------------------------------
# device-side conversions
# ----------------------------------------------------------------------

def to_pair(x: jnp.ndarray) -> Pair:
    """jnp uint64 -> (lo, hi) u32 (jit-boundary conversion; fuses away)."""
    return ((x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
            (x >> jnp.uint64(32)).astype(jnp.uint32))


def from_pair(a: Pair) -> jnp.ndarray:
    return (a[0].astype(jnp.uint64)
            | (a[1].astype(jnp.uint64) << jnp.uint64(32)))


# ----------------------------------------------------------------------
# word-level multiplies (each jnp.uint32 multiply is one native VPU op)
# ----------------------------------------------------------------------

def _umulhi32(a, b):
    """High 32 bits of a*b (u32 inputs) -- 4 native multiplies."""
    a0, a1 = a & _M16, a >> _S16
    b0, b1 = b & _M16, b >> _S16
    ll = a0 * b0
    m1 = a1 * b0
    m2 = a0 * b1
    # mid column fits u32: (ll>>16) + 2*(2^16-1)^2>>0 ... each term < 2^16|2^32
    mid = (ll >> _S16) + (m1 & _M16) + (m2 & _M16)
    return a1 * b1 + (m1 >> _S16) + (m2 >> _S16) + (mid >> _S16)


def _mul_full(a, b) -> Pair:
    """Exact 32x32 -> 64 product as (lo, hi) -- 4 native multiplies."""
    a0, a1 = a & _M16, a >> _S16
    b0, b1 = b & _M16, b >> _S16
    ll = a0 * b0
    m1 = a1 * b0
    m2 = a0 * b1
    hh = a1 * b1
    t1 = ll + (m1 << _S16)
    c1 = (t1 < ll).astype(jnp.uint32)
    t2 = t1 + (m2 << _S16)
    c2 = (t2 < t1).astype(jnp.uint32)
    return t2, hh + (m1 >> _S16) + (m2 >> _S16) + c1 + c2


def _mul_small(a, s) -> Pair:
    """a (u32) times s < 2**16 -> exact 48-bit product pair; 2 multiplies."""
    t0 = (a & _M16) * s
    t1 = (a >> _S16) * s
    u = t1 << _S16
    lo = t0 + u
    c = (lo < u).astype(jnp.uint32)
    return lo, (t1 >> _S16) + c


# ----------------------------------------------------------------------
# pair add/sub/compare
# ----------------------------------------------------------------------

def add_pair(a: Pair, b: Pair) -> Pair:
    """a + b mod 2**64 (callers guarantee no meaningful overflow)."""
    lo = a[0] + b[0]
    c = (lo < b[0]).astype(jnp.uint32)
    return lo, a[1] + b[1] + c


def sub_pair(a: Pair, b: Pair) -> Pair:
    """a - b mod 2**64 (exact when a >= b)."""
    lo = a[0] - b[0]
    br = (a[0] < b[0]).astype(jnp.uint32)
    return lo, a[1] - b[1] - br


def ge_pair(a: Pair, b: Pair):
    return (a[1] > b[1]) | ((a[1] == b[1]) & (a[0] >= b[0]))


def _csub(r: Pair, p: Pair) -> Pair:
    """One conditional subtract: r - p if r >= p else r."""
    ge = ge_pair(r, p)
    d = sub_pair(r, p)
    return jnp.where(ge, d[0], r[0]), jnp.where(ge, d[1], r[1])


# ----------------------------------------------------------------------
# modular ops (all operands < p < 2**37 unless stated)
# ----------------------------------------------------------------------

def addmod(a: Pair, b: Pair, p: Pair) -> Pair:
    return _csub(add_pair(a, b), p)


def submod(a: Pair, b: Pair, p: Pair) -> Pair:
    ge = ge_pair(a, b)
    d = sub_pair(a, b)
    e = sub_pair(add_pair(a, p), b)
    return jnp.where(ge, d[0], e[0]), jnp.where(ge, d[1], e[1])


def negmod(a: Pair, p: Pair) -> Pair:
    z = (a[0] | a[1]) == 0
    d = sub_pair(p, a)
    return jnp.where(z, a[0], d[0]), jnp.where(z, a[1], d[1])


def mulmod_shoup(a: Pair, w: Pair, ws: Pair, p: Pair, *,
                 lazy: bool = False, exact_q: bool = False) -> Pair:
    """(a*w) mod p; ws = floor(w * 2**64 / p) as a full 64-bit pair.

    w < p < 2**37; a < 2**39 (need not be canonical -- FastBconv feeds
    residues of a different base, lazy NTT butterflies feed < 4p values).
    20 native multiplies (the XLA-emulated u64 version costs ~6 generic
    64-bit multiplies, i.e. 2-3x the native ops).

    By default q is UNDERESTIMATED by <= 1 (we drop hi32(a0*ws0), the
    cheapest-to-lose term) so the remainder lands in [0, 3p); two
    conditional subtracts finish, or none with ``lazy=True``.
    ``exact_q=True`` spends 4 more multiplies on the dropped term so the
    remainder lands in [0, 2p) -- the Harvey-butterfly contract
    (lazy -> < 2p with no subtracts, else one subtract to canonical).
    """
    a0, a1 = a
    w0, w1 = w
    s0, s1 = ws
    # ---- q = floor(a * ws / 2**64) ------------------------------------
    ma = _mul_full(a0, s1)             # a0 * ws1            (4 mul)
    mb = _mul_small(s0, a1)            # a1 * ws0, a1 < 2**7 (2 mul)
    t1 = ma[0] + mb[0]
    c1 = (t1 < mb[0]).astype(jnp.uint32)
    u1 = ma[1] + mb[1]
    d1 = (u1 < mb[1]).astype(jnp.uint32)
    if exact_q:
        h = _umulhi32(a0, s0)          # the otherwise-dropped term (4 mul)
        t2 = t1 + h
        c1 = c1 + (t2 < h).astype(jnp.uint32)
    u2 = u1 + c1
    d2 = (u2 < u1).astype(jnp.uint32)
    shi, scarry = u2, d1 + d2          # floor(S/2**32) = shi + 2**32*sc
    qa = _mul_small(s1, a1)            # a1 * ws1            (2 mul)
    q0 = qa[0] + shi
    cq = (q0 < shi).astype(jnp.uint32)
    q1 = qa[1] + cq + scarry           # q < 2**39
    # ---- r = a*w - q*p  (exact on pairs: true r < 3p < 2**39) ---------
    aw = _mul_full(a0, w0)             # (4 mul)
    aw_hi = aw[1] + a0 * w1 + a1 * w0  # wrapping mid terms  (2 mul)
    qp = _mul_full(q0, p[0])           # (4 mul)
    qp_hi = qp[1] + q0 * p[1] + q1 * p[0]                  # (2 mul)
    r_lo = aw[0] - qp[0]
    br = (aw[0] < qp[0]).astype(jnp.uint32)
    r = (r_lo, aw_hi - qp_hi - br)
    if exact_q:
        return r if lazy else _csub(r, p)
    if lazy:
        return r
    return _csub(_csub(r, p), p)


def shoup40(w, p) -> np.ndarray:
    """Host precompute floor(w * 2**40 / p) for :func:`mulmod_shoup40`.

    Fits 40 bits (w < p), so the pair's hi word is < 2**8.
    """
    w = np.asarray(w, dtype=np.uint64).astype(object)
    p = np.broadcast_to(np.asarray(p, dtype=np.uint64), w.shape).astype(object)
    return ((w << 40) // p).astype(np.uint64)


def mulmod_shoup40(a: Pair, w: Pair, ws: Pair, p: Pair, *,
                   lazy: bool = False) -> Pair:
    """(a*w) mod p with a 40-bit Shoup constant: ws = floor(w*2**40/p).

    Harvey's bound with beta=40: r < p*(1 + a/2**40), so for a < 4p < 2**39
    the remainder is < 1.5p -- the same exact-q lazy contract as
    ``mulmod_shoup(..., exact_q=True)`` at 21 native multiplies instead of
    24 (ws has only 8 hi bits, so q = floor(a*ws/2**40) needs one full
    32x32 product instead of two).  The NTT butterfly path lives here;
    general (a < 2**39, 64-bit ws) call sites keep :func:`mulmod_shoup`.
    """
    a0, a1 = a
    w0, w1 = w
    s0, s1 = ws
    # ---- S = a * ws exactly (< 2**79), three 32-bit columns ----------
    l00, h00 = _mul_full(a0, s0)       # (4 mul)
    l01, h01 = _mul_small(a0, s1)      # s1 < 2**8   (2 mul)
    l10, h10 = _mul_small(s0, a1)      # a1 < 2**7   (2 mul)
    p11 = a1 * s1                      # < 2**15     (1 mul)
    m1 = h00 + l01
    c1 = (m1 < l01).astype(jnp.uint32)
    m1b = m1 + l10
    c2 = (m1b < l10).astype(jnp.uint32)
    m2 = h01 + h10 + p11 + c1 + c2     # < 2**17
    # ---- q = floor(S / 2**40) (exact; carries already propagated) ----
    q0 = (m1b >> jnp.uint32(8)) | (m2 << jnp.uint32(24))
    q1 = m2 >> jnp.uint32(8)           # q < 2**39
    # ---- r = a*w - q*p exact on low 64 bits (true r < 2p < 2**38) ----
    aw = _mul_full(a0, w0)             # (4 mul)
    aw_hi = aw[1] + a0 * w1 + a1 * w0  # wrapping mid terms  (2 mul)
    qp = _mul_full(q0, p[0])           # (4 mul)
    qp_hi = qp[1] + q0 * p[1] + q1 * p[0]                  # (2 mul)
    r_lo = aw[0] - qp[0]
    br = (aw[0] < qp[0]).astype(jnp.uint32)
    r = (r_lo, aw_hi - qp_hi - br)
    return r if lazy else _csub(r, p)


def barrett(x: Pair, mu, p: Pair, *, x_max_bits: int = 62,
            lazy: bool = False) -> Pair:
    """x mod p for x < 2**x_max_bits (<= 64); mu = floor(2**64/p) single u32.

    13 native multiplies.  q = floor(x*mu / 2**64) is computed EXACTLY
    (the fractional column of x0*mu cannot carry), so the only slack is
    Barrett's own: r < p + x*(2**64 mod p)/2**64 < p + x/2**27, giving
    r < 2p for x < 2**62 and r < 3p up to 2**64 -- hence 1 or 2
    conditional subtracts from the static bound (one fewer when lazy).
    """
    x0, x1 = x
    h = _umulhi32(x0, mu)              # (4 mul)
    xm = _mul_full(x1, mu)             # (4 mul)
    s_lo = xm[0] + h
    c = (s_lo < h).astype(jnp.uint32)
    q = xm[1] + c                      # = floor((x1*mu + h)/2**32), one word
    qp = _mul_full(q, p[0])            # (4 mul)
    qp_hi = qp[1] + q * p[1]           # (1 mul)
    r_lo = x0 - qp[0]
    br = (x0 < qp[0]).astype(jnp.uint32)
    r = (r_lo, x1 - qp_hi - br)
    n_sub = (1 if x_max_bits <= 62 else 2) - (1 if lazy else 0)
    for _ in range(n_sub):
        r = _csub(r, p)
    return r                       # < p, or < 2p when lazy


def mulmod(a: Pair, b: Pair, p: Pair, mu, c64: Pair, *,
           lazy: bool = False) -> Pair:
    """General (a*b) mod p for a, b < 2**37 (canonicity NOT required);
    mu single-word Barrett constant, c64 = 2**64 mod p (host pair).
    25 native multiplies vs ~2x that for the XLA-emulated 19-bit-split
    u64 version.  ``lazy=True`` skips the final conditional subtracts
    (result < 2p < 2**38) for callers that accumulate before reducing.
    """
    a0, a1 = a
    b0, b1 = b
    v = _mul_full(a0, b0)                         # (4 mul)
    mida = _mul_small(b0, a1)                     # (2 mul)
    midb = _mul_small(a0, b1)                     # (2 mul)
    mid = add_pair(mida, midb)                    # < 2**38
    v2 = a1 * b1 + mid[1]                         # (1 mul) third word < 2**11
    m_lo = v[1] + mid[0]
    cm = (m_lo < mid[0]).astype(jnp.uint32)
    v = (v[0], m_lo)
    v2 = v2 + cm
    # fold the third word: x = (v0, v1) + v2 * (2**64 mod p)
    z = _mul_small(c64[0], v2)                    # (2 mul) v2 < 2**16
    z = (z[0], z[1] + v2 * c64[1])                # (1 mul)
    x_lo = v[0] + z[0]
    cx = (x_lo < z[0]).astype(jnp.uint32)
    x_hi = v[1] + z[1] + cx
    ov = (x_hi < v[1]) | ((cx == 1) & (x_hi == v[1]))   # carry into 2**64
    # a carried 2**64 folds to + c64 once more (result then < 2**48 + 2**37)
    f_lo = x_lo + c64[0]
    cf = (f_lo < c64[0]).astype(jnp.uint32)
    f_hi = x_hi + c64[1] + cf
    x = (jnp.where(ov, f_lo, x_lo), jnp.where(ov, f_hi, x_hi))
    return barrett(x, mu, p, lazy=lazy)           # (13 mul)


def csub_reduce(x: Pair, p: Pair, steps: int) -> Pair:
    """x mod p via `steps` conditional subtracts -- exact iff
    x < (steps+1)*p (pair analog of ops/modmath.csub_reduce)."""
    shp = jnp.broadcast_shapes(jnp.shape(x[0]), jnp.shape(p[0]))
    x = (jnp.broadcast_to(x[0], shp), jnp.broadcast_to(x[1], shp))
    for _ in range(steps):
        x = _csub(x, p)
    return x
