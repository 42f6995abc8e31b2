"""Fused Pallas TPU kernel for the four-step negacyclic NTT.

One kernel instance transforms a tile of TB polynomials for one RNS limb,
entirely in VMEM:

  digitize -> MXU matmul (phase A) -> recombine -> twiddle grid ->
  digitize -> MXU matmul (phase B) -> recombine

The matmul formulation (ops/mxu_ntt.py) has no lane-crossing butterflies --
all data movement is matrix multiplication, which the MXU does natively; the
VPU only does the base-256 digit split and the modular recombination, written
in pure uint32 pair arithmetic (Mosaic has no 64-bit integers).

Bit-exact with ops/ntt.py and the golden model (tests/test_pallas_ntt.py).

Layout notes:
  * inputs/outputs are uint32 (lo, hi) planes of the uint64 residues
  * data enters as (R, TB*C): row-major matrices side by side, so both
    matmuls are plain jnp.dot calls with >= 128-wide operands
  * per-limb constants (digit planes of A / B0^T, twiddle grid, scalars)
    are selected by the grid's limb index via BlockSpec index maps
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .mxu_ntt import NDIG, MxuNttTables, build_mxu_tables



# ----------------------------------------------------------------------
# uint32-pair arithmetic (values < 2**64 as (lo, hi))
# ----------------------------------------------------------------------

def _mul32x32(a, b):
    """Exact 32x32 -> 64 product as (lo, hi) uint32."""
    m16, s16 = jnp.uint32(0xFFFF), jnp.uint32(16)
    a0, a1 = a & m16, a >> s16
    b0, b1 = b & m16, b >> s16
    ll = a0 * b0
    m1 = a1 * b0
    m2 = a0 * b1
    hh = a1 * b1
    t1 = ll + (m1 << s16)
    c1 = (t1 < ll).astype(jnp.uint32)
    t2 = t1 + (m2 << s16)
    c2 = (t2 < t1).astype(jnp.uint32)
    hi = hh + (m1 >> s16) + (m2 >> s16) + c1 + c2
    return t2, hi


def _add64(a, b):
    lo = a[0] + b[0]
    carry = (lo < a[0]).astype(jnp.uint32)
    return lo, a[1] + b[1] + carry


def _sub64(a, b):
    lo = a[0] - b[0]
    borrow = (a[0] < b[0]).astype(jnp.uint32)
    return lo, a[1] - b[1] - borrow


def _ge64(a, b):
    return (a[1] > b[1]) | ((a[1] == b[1]) & (a[0] >= b[0]))


def _mul64_low(a, b):
    """Low 64 bits of (a * b) for 64-bit pairs."""
    lo, hi = _mul32x32(a[0], b[0])
    return lo, hi + a[0] * b[1] + a[1] * b[0]


def _hi64(a, b):
    """High 64 bits of the 128-bit product of 64-bit pairs a, b."""
    p00_lo, p00_hi = _mul32x32(a[0], b[0])
    p01_lo, p01_hi = _mul32x32(a[0], b[1])
    p10_lo, p10_hi = _mul32x32(a[1], b[0])
    p11_lo, p11_hi = _mul32x32(a[1], b[1])
    # middle word: p00_hi + p01_lo + p10_lo, collect carries into bit 64
    m1 = p00_hi + p01_lo
    c1 = (m1 < p00_hi).astype(jnp.uint32)
    m2 = m1 + p10_lo
    c2 = (m2 < m1).astype(jnp.uint32)
    # high word accumulation (64-bit)
    t = p01_hi + p10_hi
    c3 = (t < p01_hi).astype(jnp.uint32)
    t2 = t + p11_lo
    c4 = (t2 < t).astype(jnp.uint32)
    t3 = t2 + c1 + c2
    c5 = (t3 < t2).astype(jnp.uint32)
    return t3, p11_hi + c3 + c4 + c5


def _cond_sub(r, p):
    ge = _ge64(r, p)
    d = _sub64(r, p)
    return (jnp.where(ge, d[0], r[0]), jnp.where(ge, d[1], r[1]))


def _shoup_mulmod(a, w, ws, p):
    """(a * w) mod p; a < p, w < p, ws = floor(w*2^64/p); all u32 pairs."""
    q = _hi64(a, ws)
    aw = _mul64_low(a, w)
    qp = _mul64_low(q, p)
    r = _sub64(aw, qp)                 # in [0, 2p)
    return _cond_sub(r, p)


def _barrett(v, mu, p):
    """v mod p for v < 2**62 (u32 pair), mu = floor(2^64/p)."""
    q = _hi64(v, mu)
    qp = _mul64_low(q, p)
    r = _sub64(v, qp)                  # < 3p
    r = _cond_sub(r, p)
    return _cond_sub(r, p)


# ----------------------------------------------------------------------
# kernel body
# ----------------------------------------------------------------------

def _digit_planes_from_pair(lo, hi):
    m = jnp.uint32(0xFF)
    planes = [lo & m, (lo >> jnp.uint32(8)) & m, (lo >> jnp.uint32(16)) & m,
              (lo >> jnp.uint32(24)) & m, hi & m]
    return [p.astype(jnp.float32).astype(jnp.bfloat16) for p in planes]


def _matmul_recombine(w_stack_ref, d_planes, scal, left: bool):
    """One digit matmul phase + exact modular recombination.

    w_stack: (NDIG*K, K) bf16 when left else (K, NDIG*K) -- passed as VALUE.
    d_planes: NDIG bf16 operands shaped (K, N) / (N, K).
    Returns result as u32 pair, each (K, N) / (N, K).
    """
    p, mu, pw40, pw40s = scal
    w = w_stack_ref
    K = w.shape[0] // NDIG if left else w.shape[0]
    v_lo = v_hi = None
    for db in range(NDIG):
        if left:
            acc = jnp.dot(w, d_planes[db],
                          preferred_element_type=jnp.float32)
        else:
            acc = jnp.dot(d_planes[db], w,
                          preferred_element_type=jnp.float32)
        accu = acc.astype(jnp.uint32)
        for da in range(NDIG):
            if left:
                piece = accu[da * K:(da + 1) * K, :]
            else:
                piece = accu[:, da * K:(da + 1) * K]
            s = da + db
            sh = 8 * (s if s < NDIG else s - NDIG)
            if sh == 0:
                contrib = (piece, jnp.zeros_like(piece))
            elif sh < 32:
                contrib = (piece << jnp.uint32(sh),
                           piece >> jnp.uint32(32 - sh))
            else:
                contrib = (jnp.zeros_like(piece),
                           piece << jnp.uint32(sh - 32))
            if s < NDIG:
                v_lo = contrib if v_lo is None else _add64(v_lo, contrib)
            else:
                v_hi = contrib if v_hi is None else _add64(v_hi, contrib)
    r_lo = _barrett(v_lo, mu, p)
    r_hi = _barrett(v_hi, mu, p)
    shifted = _shoup_mulmod(r_hi, pw40, pw40s, p)
    out = _add64(r_lo, shifted)
    return _cond_sub(out, p)


def _ntt_kernel(scal_ref, a_ref, b0t_ref, t_ref, ts_ref, xlo_ref, xhi_ref,
                olo_ref, ohi_ref):
    """Forward NTT for one limb tile: x as (R, TBC) u32 pairs."""
    def sc(i):
        return (jnp.full((1, 1), scal_ref[0, 0, 2 * i], jnp.uint32),
                jnp.full((1, 1), scal_ref[0, 0, 2 * i + 1], jnp.uint32))
    scal = tuple(sc(i) for i in range(4))   # p, mu, pw40, pw40s

    x_lo, x_hi = xlo_ref[0], xhi_ref[0]
    tg, tgs = t_ref[0], ts_ref[0]

    # phase A: columns transform = A_stack @ M
    d = _digit_planes_from_pair(x_lo, x_hi)
    y = _matmul_recombine(a_ref[0], d, scal, left=True)

    # twiddle grid: T is (R, C) broadcast across the TB tile
    R, TBC = x_lo.shape
    C = tg.shape[1]
    TB = TBC // C
    t_pair = (jnp.tile(tg[:R, :], (1, TB)), jnp.tile(tg[R:, :], (1, TB)))
    ts_pair = (jnp.tile(tgs[:R, :], (1, TB)), jnp.tile(tgs[R:, :], (1, TB)))
    y = _shoup_mulmod(y, t_pair, ts_pair, scal[0])

    # phase B: per-row transform = Y_rows @ B0^T (digit-stacked on the right)
    d2 = _digit_planes_from_pair(y[0], y[1])
    # rows of the (R, TB*C) layout are already matrix rows; the right matmul
    # contracts the C axis, so reorganize (R, TB, C) -> (R*TB, C)
    d2 = [q.reshape(R, TB, C).reshape(R * TB, C) for q in d2]
    z = _matmul_recombine(b0t_ref[0], d2, scal, left=False)
    olo_ref[0] = z[0].reshape(R, TB, C).reshape(R, TBC)
    ohi_ref[0] = z[1].reshape(R, TB, C).reshape(R, TBC)


def _intt_kernel(scal_ref, ai_ref, b0it_ref, ti_ref, tis_ref, xlo_ref,
                 xhi_ref, olo_ref, ohi_ref):
    """Inverse NTT (diag-left factorization: grid after the row matmul)."""
    def sc(i):
        return (jnp.full((1, 1), scal_ref[0, 0, 2 * i], jnp.uint32),
                jnp.full((1, 1), scal_ref[0, 0, 2 * i + 1], jnp.uint32))
    scal = tuple(sc(i) for i in range(4))

    x_lo, x_hi = xlo_ref[0], xhi_ref[0]
    tg, tgs = ti_ref[0], tis_ref[0]
    R, TBC = x_lo.shape
    C = tg.shape[1]
    TB = TBC // C

    # phase 1: per-row transform M @ B0i^T (contraction over c)
    d = _digit_planes_from_pair(x_lo, x_hi)
    d = [q.reshape(R, TB, C).reshape(R * TB, C) for q in d]
    z = _matmul_recombine(b0it_ref[0], d, scal, left=False)
    z = (z[0].reshape(R, TB, C).reshape(R, TBC),
         z[1].reshape(R, TB, C).reshape(R, TBC))

    # twiddle grid (diag-left: applied on the matmul output)
    t_pair = (jnp.tile(tg[:R, :], (1, TB)), jnp.tile(tg[R:, :], (1, TB)))
    ts_pair = (jnp.tile(tgs[:R, :], (1, TB)), jnp.tile(tgs[R:, :], (1, TB)))
    z = _shoup_mulmod(z, t_pair, ts_pair, scal[0])

    # phase 2: cross-row transform Ai @ Z (n^-1 already folded into Ai)
    d2 = _digit_planes_from_pair(z[0], z[1])
    out = _matmul_recombine(ai_ref[0], d2, scal, left=True)
    olo_ref[0] = out[0]
    ohi_ref[0] = out[1]


# ----------------------------------------------------------------------
# host-side wrapper
# ----------------------------------------------------------------------

def _pair_split(arr64: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    a = np.asarray(arr64, dtype=np.uint64)
    return ((a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (a >> np.uint64(32)).astype(np.uint32))


class PallasNtt:
    """Fused-kernel NTT/iNTT for a stack of moduli; (..., L, n) uint64 API.

    Bit-exact with ops.ntt; batch must be a multiple of `tb` (the wrapper
    pads internally).
    """

    def __init__(self, moduli: Tuple[int, ...], n: int, C: int = 64,
                 tb: int = 16, interpret: bool = False):
        mtb: MxuNttTables = build_mxu_tables(tuple(int(m) for m in moduli), n,
                                             C)
        self.mtb = mtb
        self.n, self.R, self.C = n, mtb.R, mtb.C
        self.L = len(moduli)
        self.tb = tb
        self.interpret = interpret

        L, R, Cc = self.L, self.R, self.C
        self.a_stack = np.ascontiguousarray(
            mtb.A_dig.reshape(L, NDIG * R, R))
        self.b0t_stack = np.ascontiguousarray(
            np.asarray(mtb.B0T_dig).transpose(0, 2, 1, 3)
        ).reshape(L, Cc, NDIG * Cc)
        self.ai_stack = np.ascontiguousarray(
            mtb.Ai_dig.reshape(L, NDIG * R, R))
        self.b0it_stack = np.ascontiguousarray(
            np.asarray(mtb.B0iT_dig).transpose(0, 2, 1, 3)
        ).reshape(L, Cc, NDIG * Cc)
        assert mtb.diag_left, "inverse kernel assumes diag-left factorization"

        def grid_pair(x):  # (L, R, C) u64 -> (L, 2R, C) u32 stacked lo/hi
            lo, hi = _pair_split(x)
            return np.concatenate([lo, hi], axis=1)

        self.t_pair = grid_pair(mtb.T)
        self.ts_pair = grid_pair(mtb.T_shoup)
        self.ti_pair = grid_pair(mtb.Ti)
        self.tis_pair = grid_pair(mtb.Ti_shoup)

        scal = np.zeros((L, 1, 8), dtype=np.uint32)
        for i, col in enumerate([mtb.p[:, 0], mtb.mu[:, 0],
                                 mtb.pow_dig[:, NDIG, 0, 0],
                                 mtb.pow_dig_shoup[:, NDIG, 0, 0]]):
            scal[:, 0, 2 * i] = (col & 0xFFFFFFFF).astype(np.uint32)
            scal[:, 0, 2 * i + 1] = (col >> 32).astype(np.uint32)
        self.scal = scal

    def _call(self, x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        lead = x.shape[:-2]
        L, n, R, C, tb = self.L, self.n, self.R, self.C, self.tb
        B = int(np.prod(lead)) if lead else 1
        xb = x.reshape(B, L, n)
        pad = (-B) % tb
        if pad:
            xb = jnp.concatenate(
                [xb, jnp.zeros((pad, L, n), dtype=xb.dtype)], axis=0)
        Bp = B + pad
        # (Bp, L, n) -> (L, R, Bp*C)
        m = xb.reshape(Bp, L, R, C).transpose(1, 2, 0, 3).reshape(L, R, Bp * C)
        x_lo = (m & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        x_hi = (m >> jnp.uint64(32)).astype(jnp.uint32)

        kern = _intt_kernel if inverse else _ntt_kernel
        wa = self.ai_stack if inverse else self.a_stack
        wb = self.b0it_stack if inverse else self.b0t_stack
        tp = self.ti_pair if inverse else self.t_pair
        tsp = self.tis_pair if inverse else self.ts_pair

        grid = (L, Bp // tb)
        const = lambda shape: pl.BlockSpec(
            (1,) + shape, lambda l, bt: (l, 0, 0))
        data_spec = pl.BlockSpec((1, R, tb * C), lambda l, bt: (l, 0, bt))
        out_lo, out_hi = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                const((1, 8)),                      # scal
                const((NDIG * R, R)),               # left matrix digits
                const((C, NDIG * C)),               # right matrix digits
                const((2 * R, C)),                  # twiddle grid pairs
                const((2 * R, C)),                  # twiddle shoup pairs
                data_spec, data_spec,
            ],
            out_specs=[data_spec, data_spec],
            out_shape=[
                jax.ShapeDtypeStruct((L, R, Bp * C), jnp.uint32),
                jax.ShapeDtypeStruct((L, R, Bp * C), jnp.uint32),
            ],
            interpret=self.interpret,
        )(self.scal, wa, wb, tp, tsp, x_lo, x_hi)

        out = out_lo.astype(jnp.uint64) | (out_hi.astype(jnp.uint64)
                                           << jnp.uint64(32))
        out = out.reshape(L, R, Bp, C).transpose(2, 0, 1, 3).reshape(
            Bp, L, n)[:B]
        return out.reshape(lead + (L, n))

    def ntt(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._call(x, inverse=False)

    def intt(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._call(x, inverse=True)
