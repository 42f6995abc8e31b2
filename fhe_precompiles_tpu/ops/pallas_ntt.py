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
    # Mosaic has no u32->f32 cast; digits are < 256, so bitcast through i32.
    return [jax.lax.bitcast_convert_type(q, jnp.int32)
            .astype(jnp.float32).astype(jnp.bfloat16) for q in planes]


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
        # f32 -> i32 is supported; values < 2**23 so the bitcast to u32 is
        # value-preserving
        accu = jax.lax.bitcast_convert_type(acc.astype(jnp.int32), jnp.uint32)
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


def _phase_kernel_factory(grid_mode: str):
    """Kernel: optional twiddle grid + one digit matmul phase (left).

    grid_mode: "none" | "pre" (grid before matmul) | "post" (after).
    Data layout inside: (K_in, TB*J) u32 pairs; weights (NDIG*K_out, K_in).
    """

    def kernel(scal_ref, w_ref, g_ref, gs_ref, xlo_ref, xhi_ref,
               olo_ref, ohi_ref):
        def sc(i):
            return (jnp.full((1, 1), scal_ref[0, 0, 2 * i], jnp.uint32),
                    jnp.full((1, 1), scal_ref[0, 0, 2 * i + 1], jnp.uint32))
        scal = tuple(sc(i) for i in range(4))   # p, mu, pw40, pw40s

        x = (xlo_ref[0], xhi_ref[0])
        g = g_ref[0]
        gs = gs_ref[0]
        J = g.shape[1]

        def apply_grid(v):
            K = v[0].shape[0]
            TB = v[0].shape[1] // J
            g_pair = (jnp.tile(g[:K, :], (1, TB)),
                      jnp.tile(g[K:, :], (1, TB)))
            gs_pair = (jnp.tile(gs[:K, :], (1, TB)),
                       jnp.tile(gs[K:, :], (1, TB)))
            return _shoup_mulmod(v, g_pair, gs_pair, scal[0])

        if grid_mode == "pre":
            x = apply_grid(x)
        d = _digit_planes_from_pair(x[0], x[1])
        out = _matmul_recombine(w_ref[0], d, scal, left=True)
        if grid_mode == "post":
            out = apply_grid(out)
        olo_ref[0] = out[0]
        ohi_ref[0] = out[1]

    return kernel


_KERNELS = {mode: _phase_kernel_factory(mode)
            for mode in ("none", "pre", "post")}


def _block_transpose(v, J_in: int):
    """(K, TB*J_in) -> (J_in, TB*K): transpose each (K, J_in) block in place.

    Uses Mosaic's native 2D transpose per block; TB is static.
    """
    K, TBJ = v.shape
    TB = TBJ // J_in
    parts = [v[:, i * J_in:(i + 1) * J_in].T for i in range(TB)]
    return jnp.concatenate(parts, axis=1)


def _fused_kernel_factory(inverse: bool):
    """Single-kernel four-step NTT: both matmul phases + the in-between
    layout transpose fused in VMEM (no HBM roundtrip between phases).

    Forward: A-phase on (R, TB*C) -> transpose -> grid -> B-phase on
    (C, TB*R) -> transpose back.  Inverse mirrors it (diag-left grid).
    """

    def kernel(scal_ref, wa_ref, wb_ref, g_ref, gs_ref, xlo_ref, xhi_ref,
               olo_ref, ohi_ref):
        def sc(i):
            return (jnp.full((1, 1), scal_ref[0, 0, 2 * i], jnp.uint32),
                    jnp.full((1, 1), scal_ref[0, 0, 2 * i + 1], jnp.uint32))
        scal = tuple(sc(i) for i in range(4))
        g = g_ref[0]
        gs = gs_ref[0]
        J = g.shape[1]          # grid second dim (R for fwd, R for inv)

        def apply_grid(v):
            K = v[0].shape[0]
            TB = v[0].shape[1] // J
            g_pair = (jnp.tile(g[:K, :], (1, TB)),
                      jnp.tile(g[K:, :], (1, TB)))
            gs_pair = (jnp.tile(gs[:K, :], (1, TB)),
                       jnp.tile(gs[K:, :], (1, TB)))
            return _shoup_mulmod(v, g_pair, gs_pair, scal[0])

        x = (xlo_ref[0], xhi_ref[0])
        R_in = x[0].shape[0]

        if not inverse:
            # phase A in (R, TB*C)
            d = _digit_planes_from_pair(x[0], x[1])
            y = _matmul_recombine(wa_ref[0], d, scal, left=True)
            C = wb_ref[0].shape[0] // NDIG
            y = (_block_transpose(y[0], C), _block_transpose(y[1], C))
            y = apply_grid(y)
            d2 = _digit_planes_from_pair(y[0], y[1])
            z = _matmul_recombine(wb_ref[0], d2, scal, left=True)
            z = (_block_transpose(z[0], R_in), _block_transpose(z[1], R_in))
        else:
            # inverse: B'-phase first in transposed layout, grid after
            C = wb_ref[0].shape[0] // NDIG
            xT = (_block_transpose(x[0], C), _block_transpose(x[1], C))
            d = _digit_planes_from_pair(xT[0], xT[1])
            z1 = _matmul_recombine(wb_ref[0], d, scal, left=True)
            z1 = apply_grid(z1)
            z1 = (_block_transpose(z1[0], R_in), _block_transpose(z1[1], R_in))
            d2 = _digit_planes_from_pair(z1[0], z1[1])
            z = _matmul_recombine(wa_ref[0], d2, scal, left=True)
        olo_ref[0] = z[0]
        ohi_ref[0] = z[1]

    return kernel


_FUSED_KERNELS = {False: _fused_kernel_factory(False),
                  True: _fused_kernel_factory(True)}


# ----------------------------------------------------------------------
# host-side wrapper
# ----------------------------------------------------------------------

def _pair_split(arr64: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    a = np.asarray(arr64, dtype=np.uint64)
    return ((a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (a >> np.uint64(32)).astype(np.uint32))


class PallasNtt:
    """Fused-kernel NTT/iNTT for a stack of moduli; (..., L, n) uint64 API.

    Two Pallas launches per transform (phase A matmul, phase B matmul with
    the twiddle grid folded in), with a device-side layout transpose between
    them -- Mosaic cannot re-tile the lane axis inside a kernel.  Bit-exact
    with ops.ntt.
    """

    def __init__(self, moduli: Tuple[int, ...], n: int, C: int = 64,
                 tb: int = 16, interpret: bool = False, fused: bool = True):
        mtb: MxuNttTables = build_mxu_tables(tuple(int(m) for m in moduli), n,
                                             C)
        self.mtb = mtb
        self.n, self.R, self.C = n, mtb.R, mtb.C
        self.L = len(moduli)
        self.tb = tb
        self.interpret = interpret
        self.fused = fused
        assert mtb.diag_left, "inverse kernels assume diag-left factorization"

        L, R, Cc = self.L, self.R, self.C
        self.a_stack = np.ascontiguousarray(
            mtb.A_dig.reshape(L, NDIG * R, R))
        # phase B runs on the transposed layout (C, TB*R): left-multiply by
        # the digit planes of B0 itself (out_cols = B0 @ Y^T)
        b0 = np.asarray(mtb.B0T_dig).transpose(0, 1, 3, 2)  # B0[i, c]
        self.b0_stack = np.ascontiguousarray(b0.reshape(L, NDIG * Cc, Cc))
        self.ai_stack = np.ascontiguousarray(
            mtb.Ai_dig.reshape(L, NDIG * R, R))
        b0i = np.asarray(mtb.B0iT_dig).transpose(0, 1, 3, 2)
        self.b0i_stack = np.ascontiguousarray(b0i.reshape(L, NDIG * Cc, Cc))

        def grid_pair(x):  # (L, X, Y) u64 -> (L, 2X, Y) u32 stacked lo/hi
            lo, hi = _pair_split(x)
            return np.ascontiguousarray(np.concatenate([lo, hi], axis=1))

        # grids in the transposed layout (C, R): G[c, r] = T[r, c]
        self.tT_pair = grid_pair(np.asarray(mtb.T).transpose(0, 2, 1))
        self.tsT_pair = grid_pair(np.asarray(mtb.T_shoup).transpose(0, 2, 1))
        # inverse grid applies post-matmul in transposed layout: Ti[r, i]
        # -> out layout rows = i: G[i, r] = Ti[r, i]
        self.tiT_pair = grid_pair(np.asarray(mtb.Ti).transpose(0, 2, 1))
        self.tisT_pair = grid_pair(
            np.asarray(mtb.Ti_shoup).transpose(0, 2, 1))
        self._zero_grid_R = np.zeros((L, 2 * R, Cc), dtype=np.uint32)
        self._zero_grid_C = np.zeros((L, 2 * Cc, R), dtype=np.uint32)

        scal = np.zeros((L, 1, 8), dtype=np.uint32)
        for i, col in enumerate([mtb.p[:, 0], mtb.mu[:, 0],
                                 mtb.pow_dig[:, NDIG, 0, 0],
                                 mtb.pow_dig_shoup[:, NDIG, 0, 0]]):
            scal[:, 0, 2 * i] = (col & 0xFFFFFFFF).astype(np.uint32)
            scal[:, 0, 2 * i + 1] = (col >> 32).astype(np.uint32)
        self.scal = scal

    def _phase(self, mode: str, weights, grid, grid_s, x_lo, x_hi,
               K_in: int, K_out: int, J: int, Bp: int):
        """One pallas launch: (L, K_in, Bp*J) pairs -> (L, K_out, Bp*J)."""
        L, tb = self.L, self.tb
        kern = _KERNELS[mode]
        # note: 0*l keeps index literals in i32 under jax_enable_x64
        const = lambda shape: pl.BlockSpec(
            (1,) + shape, lambda l, bt: (l, 0 * l, 0 * l))
        in_spec = pl.BlockSpec((1, K_in, tb * J),
                               lambda l, bt: (l, 0 * l, bt))
        out_spec = pl.BlockSpec((1, K_out, tb * J),
                                lambda l, bt: (l, 0 * l, bt))
        out_lo, out_hi = pl.pallas_call(
            kern,
            grid=(L, Bp // tb),
            in_specs=[
                const((1, 8)),
                const((NDIG * K_out, K_in)),
                const(grid.shape[1:]),
                const(grid_s.shape[1:]),
                in_spec, in_spec,
            ],
            out_specs=[out_spec, out_spec],
            out_shape=[
                jax.ShapeDtypeStruct((L, K_out, Bp * J), jnp.uint32),
                jax.ShapeDtypeStruct((L, K_out, Bp * J), jnp.uint32),
            ],
            interpret=self.interpret,
        )(self.scal, weights, grid, grid_s, x_lo, x_hi)
        return out_lo, out_hi

    @staticmethod
    def _to_pairs(m):
        return ((m & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
                (m >> jnp.uint64(32)).astype(jnp.uint32))

    @staticmethod
    def _from_pairs(lo, hi):
        return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64)
                                        << jnp.uint64(32))

    def _transpose_RC(self, lo, hi, Bp, K_from, K_to):
        """(L, K_from, Bp*K_to) -> (L, K_to, Bp*K_from) per-matrix transpose."""
        L = self.L

        def t(x):
            v = x.reshape(L, K_from, Bp, K_to)
            return v.transpose(0, 3, 2, 1).reshape(L, K_to, Bp * K_from)
        return t(lo), t(hi)

    def _fused_call(self, x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        """Single-kernel path: both phases + transposes fused in VMEM."""
        lead = x.shape[:-2]
        L, n, R, C, tb = self.L, self.n, self.R, self.C, self.tb
        B = int(np.prod(lead)) if lead else 1
        xb = x.reshape(B, L, n)
        pad = (-B) % tb
        if pad:
            xb = jnp.concatenate(
                [xb, jnp.zeros((pad, L, n), dtype=xb.dtype)], axis=0)
        Bp = B + pad
        m = xb.reshape(Bp, L, R, C).transpose(1, 2, 0, 3).reshape(L, R, Bp * C)
        lo, hi = self._to_pairs(m)

        wa = self.ai_stack if inverse else self.a_stack
        wb = self.b0i_stack if inverse else self.b0_stack
        grid_c = self.tiT_pair if inverse else self.tT_pair
        grid_s = self.tisT_pair if inverse else self.tsT_pair

        kern = _FUSED_KERNELS[inverse]
        const = lambda shape: pl.BlockSpec(
            (1,) + shape, lambda l, bt: (l, 0 * l, 0 * l))
        dspec = pl.BlockSpec((1, R, tb * C), lambda l, bt: (l, 0 * l, bt))
        out_lo, out_hi = pl.pallas_call(
            kern,
            grid=(L, Bp // tb),
            in_specs=[
                const((1, 8)),
                const((NDIG * R, R)),
                const((NDIG * C, C)),
                const(grid_c.shape[1:]),
                const(grid_s.shape[1:]),
                dspec, dspec,
            ],
            out_specs=[dspec, dspec],
            out_shape=[
                jax.ShapeDtypeStruct((L, R, Bp * C), jnp.uint32),
                jax.ShapeDtypeStruct((L, R, Bp * C), jnp.uint32),
            ],
            interpret=self.interpret,
        )(self.scal, wa, wb, grid_c, grid_s, lo, hi)
        out = self._from_pairs(out_lo, out_hi)
        out = out.reshape(L, R, Bp, C).transpose(2, 0, 1, 3).reshape(
            Bp, L, n)[:B]
        return out.reshape(lead + (L, n))

    def _call(self, x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        if self.fused:
            return self._fused_call(x, inverse)
        lead = x.shape[:-2]
        L, n, R, C, tb = self.L, self.n, self.R, self.C, self.tb
        B = int(np.prod(lead)) if lead else 1
        xb = x.reshape(B, L, n)
        pad = (-B) % tb
        if pad:
            xb = jnp.concatenate(
                [xb, jnp.zeros((pad, L, n), dtype=xb.dtype)], axis=0)
        Bp = B + pad

        if not inverse:
            # layout (L, R, Bp*C)
            m = xb.reshape(Bp, L, R, C).transpose(1, 2, 0, 3).reshape(
                L, R, Bp * C)
            lo, hi = self._to_pairs(m)
            lo, hi = self._phase("none", self.a_stack, self._zero_grid_R,
                                 self._zero_grid_R, lo, hi, R, R, C, Bp)
            # transpose to (L, C, Bp*R) for the row phase
            lo, hi = self._transpose_RC(lo, hi, Bp, R, C)
            lo, hi = self._phase("pre", self.b0_stack, self.tT_pair,
                                 self.tsT_pair, lo, hi, C, C, R, Bp)
            out = self._from_pairs(lo, hi)
            # back to natural layout: (L, C, Bp, R) -> (Bp, L, R, C)
            out = out.reshape(L, C, Bp, R).transpose(2, 0, 3, 1).reshape(
                Bp, L, n)[:B]
        else:
            # inverse: start in transposed layout (L, C, Bp*R)
            m = xb.reshape(Bp, L, R, C).transpose(1, 3, 0, 2).reshape(
                L, C, Bp * R)
            lo, hi = self._to_pairs(m)
            lo, hi = self._phase("post", self.b0i_stack, self.tiT_pair,
                                 self.tisT_pair, lo, hi, C, C, R, Bp)
            lo, hi = self._transpose_RC(lo, hi, Bp, C, R)
            lo, hi = self._phase("none", self.ai_stack, self._zero_grid_R,
                                 self._zero_grid_R, lo, hi, R, R, C, Bp)
            out = self._from_pairs(lo, hi)
            out = out.reshape(L, R, Bp, C).transpose(2, 0, 1, 3).reshape(
                Bp, L, n)[:B]
        return out.reshape(lead + (L, n))

    def ntt(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._call(x, inverse=False)

    def intt(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._call(x, inverse=True)
