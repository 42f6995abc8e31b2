"""MXU (matmul) negacyclic NTT: the speed-of-light TPU formulation.

The bit-reversed Longa-Naehrig NTT of size n = R*C factors exactly as

    NTT(x)  = (T (*) (A @ M)) @ B0^T          M = x.reshape(R, C)
    iNTT(y) = A' @ (T' (*) (N @ B0'^T))       (n^-1 folded into A')

where A (R x R) is the shared cross-row stage matrix, B0 (C x C) the shared
in-row stage matrix, and T (R x C) a per-row twiddle diagonal grid -- all
derived numerically per modulus from the golden stage loop (verified
factorization; see tests).  The two matmuls run on the MXU via 8-bit digit
decomposition: every uint64 residue splits into base-256 digits held in
bf16; digit-pair products accumulate exactly in f32 (bounds: <= 64-length
contractions x 255^2 < 2^24, contraction chunked when longer), then digit
buckets recombine mod p on the VPU with Shoup multiplies.

Bit-exact with ops/ntt.py (and therefore with the golden model): all
arithmetic is exact integer math.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..bfv.modmath import get_ntt_tables, invmod
from .modmath import (addmod, barrett_mu, barrett_reduce, mulmod_shoup,
                      shoup_precompute)

NDIG = 5          # base-256 digits per <2**37 residue
CHUNK = 64        # max exact bf16/f32 contraction length


def _apply_stages(a: np.ndarray, tb, m_start: int, m_end: int,
                  inverse: bool) -> np.ndarray:
    """Golden stage loop over a batch (B, n) for stages m_start..m_end."""
    from ..bfv.modmath import addmod as nadd, mulmod as nmul, submod as nsub
    p = np.uint64(tb.p)
    n = tb.n
    a = a.copy()
    B = a.shape[0]
    if not inverse:
        m = m_start
        while m <= m_end:
            t = n // (2 * m)
            v = a.reshape(B, m, 2, t)
            w = tb.root_powers[m:2 * m].reshape(m, 1)
            lo = v[:, :, 0, :].copy()
            hi = nmul(v[:, :, 1, :], w, p)
            v[:, :, 0, :] = nadd(lo, hi, p)
            v[:, :, 1, :] = nsub(lo, hi, p)
            m *= 2
    else:
        m = m_start
        while m >= m_end:
            t = n // (2 * m)
            v = a.reshape(B, m, 2, t)
            w = tb.inv_root_powers[m:2 * m].reshape(m, 1)
            lo = v[:, :, 0, :].copy()
            hi = v[:, :, 1, :].copy()
            v[:, :, 0, :] = nadd(lo, hi, p)
            v[:, :, 1, :] = nmul(nsub(lo, hi, p), w, p)
            m //= 2
    return a


def _derive_matrices(p: int, n: int, C: int):
    """Numerically derive (A, B0, T, Ai, B0i, Ti) mod p for the R*C split."""
    R = n // C
    tb = get_ntt_tables(p, n)

    # ---- forward ----
    # A: cross-row stages (m = 1..R/2) act as a shared column transform.
    basis_rows = np.zeros((R, n), dtype=np.uint64)
    basis_rows[np.arange(R), np.arange(R) * C] = 1
    outA = _apply_stages(basis_rows, tb, 1, R // 2, inverse=False)
    A = outA.reshape(R, R, C)[:, :, 0].T.copy()          # A[i, r]

    # B_r columns: inputs with a 1 at (r, c) for every r simultaneously.
    basis_cols = np.zeros((C, n), dtype=np.uint64)
    for c in range(C):
        basis_cols[c, np.arange(R) * C + c] = 1
    outB = _apply_stages(basis_cols, tb, R, n // 2, inverse=False)
    # outB[c].reshape(R, C)[r, i] = B_r[i, c]
    Ball = outB.reshape(C, R, C)                          # [c, r, i]
    B0 = Ball[:, 0, :].T.copy()                           # B_0[i, c]
    # T[r, c] = B_r[i0, c] / B_0[i0, c] for any i0 with B_0[i0, c] != 0
    T = np.empty((R, C), dtype=np.uint64)
    for c in range(C):
        i0 = int(np.nonzero(B0[:, c])[0][0])
        inv = invmod(int(B0[i0, c]), p)
        T[:, c] = (Ball[c, :, i0].astype(object) * inv % p).astype(np.uint64)
    assert np.all(T[0] == 1)

    # ---- inverse ----
    # in-row stages first (m = n/2 .. R), then cross-row (m = R/2 .. 1).
    outBi = _apply_stages(basis_cols, tb, n // 2, R, inverse=True)
    Bialla = outBi.reshape(C, R, C)                       # [c, r, i] = B'_r[i, c]
    B0i = Bialla[:, 0, :].T.copy()                        # B'_0[i, c]

    def _ratio(num: int, den: int) -> int:
        return num * invmod(den, p) % p

    # Hypothesis L (diag on output): B'_r[i, c] = e_r[i] * B'_0[i, c]
    Ti_L = np.empty((R, C), dtype=np.uint64)
    for i in range(C):
        c0 = int(np.nonzero(B0i[i, :])[0][0])
        inv = invmod(int(B0i[i, c0]), p)
        Ti_L[:, i] = (Bialla[c0, :, i].astype(object) * inv % p
                      ).astype(np.uint64)
    ok_L = all(
        np.array_equal(
            Bialla[:, r, :].T,
            (B0i.astype(object) * Ti_L[r][:, None].astype(object) % p
             ).astype(np.uint64))
        for r in (1, R // 2, R - 1))

    # Hypothesis R (diag on input): B'_r[i, c] = B'_0[i, c] * d_r[c]
    Ti_R = np.empty((R, C), dtype=np.uint64)
    for c in range(C):
        i0 = int(np.nonzero(B0i[:, c])[0][0])
        inv = invmod(int(B0i[i0, c]), p)
        Ti_R[:, c] = (Bialla[c, :, i0].astype(object) * inv % p
                      ).astype(np.uint64)
    ok_R = all(
        np.array_equal(
            Bialla[:, r, :].T,
            (B0i.astype(object) * Ti_R[r][None, :].astype(object) % p
             ).astype(np.uint64))
        for r in (1, R // 2, R - 1))

    if ok_L:
        diag_left, Ti = True, Ti_L
    elif ok_R:
        diag_left, Ti = False, Ti_R
    else:  # pragma: no cover - factorization is structural
        raise AssertionError("inverse NTT per-row matrices do not factor")

    # Ai: cross-row inverse stages + fold in n^-1
    outAi = _apply_stages(basis_rows, tb, R // 2, 1, inverse=True)
    Ai = outAi.reshape(R, R, C)[:, :, 0].T.copy()
    n_inv = int(tb.n_inv)
    Ai = (Ai.astype(object) * n_inv % p).astype(np.uint64)
    return A, B0, T, Ai, B0i, Ti, diag_left


def _digits(m: np.ndarray) -> np.ndarray:
    """Host: (X, Y) uint64 -> (NDIG, X, Y) bf16 digit planes."""
    planes = [((m >> np.uint64(8 * d)) & np.uint64(0xFF)).astype(np.float32)
              for d in range(NDIG)]
    return np.stack(planes).astype(jnp.bfloat16)


@dataclasses.dataclass(frozen=True)
class MxuNttTables:
    """Per-moduli-stack four-step tables (host constants, XLA-embedded)."""

    n: int
    R: int
    C: int
    p: np.ndarray                # (L, 1)
    mu: np.ndarray               # (L, 1)
    # forward
    A_dig: np.ndarray            # (L, NDIG, R, R) bf16
    B0T_dig: np.ndarray          # (L, NDIG, C, C) bf16  (transposed: [c, i])
    T: np.ndarray                # (L, R, C) u64 + shoup
    T_shoup: np.ndarray
    # inverse
    Ai_dig: np.ndarray           # (L, NDIG, R, R)
    B0iT_dig: np.ndarray         # (L, NDIG, C, C)
    Ti: np.ndarray               # (L, R, C)
    Ti_shoup: np.ndarray
    diag_left: bool
    # digit recombination: 256^s mod p, s = 0..2*NDIG-2
    pow_dig: np.ndarray          # (L, 2*NDIG-1, 1, 1)
    pow_dig_shoup: np.ndarray


@functools.lru_cache(maxsize=None)
def build_mxu_tables(moduli: Tuple[int, ...], n: int,
                     C: int = 64) -> MxuNttTables:
    R = n // C
    assert R * C == n and R >= 2 and C >= 2
    L = len(moduli)
    p_arr = np.array([[int(p)] for p in moduli], dtype=np.uint64)

    A_l, B0T_l, T_l, Ai_l, B0iT_l, Ti_l = [], [], [], [], [], []
    diag_left = None
    for p in moduli:
        A, B0, T, Ai, B0i, Ti, dl = _derive_matrices(int(p), n, C)
        if diag_left is None:
            diag_left = dl
        else:
            assert diag_left == dl
        A_l.append(_digits(A))
        B0T_l.append(_digits(B0.T.copy()))
        T_l.append(T)
        Ai_l.append(_digits(Ai))
        B0iT_l.append(_digits(B0i.T.copy()))
        Ti_l.append(Ti)

    T_arr = np.stack(T_l)
    Ti_arr = np.stack(Ti_l)
    pows = np.stack([
        np.array([pow(256, s, int(p)) for s in range(2 * NDIG - 1)],
                 dtype=np.uint64)
        for p in moduli])[..., None, None]
    return MxuNttTables(
        n=n, R=R, C=C, p=p_arr, mu=barrett_mu(p_arr),
        A_dig=np.stack(A_l), B0T_dig=np.stack(B0T_l),
        T=T_arr, T_shoup=shoup_precompute(T_arr, p_arr[:, :, None]),
        Ai_dig=np.stack(Ai_l), B0iT_dig=np.stack(B0iT_l),
        Ti=Ti_arr, Ti_shoup=shoup_precompute(Ti_arr, p_arr[:, :, None]),
        diag_left=bool(diag_left),
        pow_dig=pows,
        pow_dig_shoup=shoup_precompute(pows, p_arr[:, :, None, None]),
    )


def _traced_digits(x: jnp.ndarray) -> list:
    """(..., X, Y) u64 -> NDIG bf16 planes (traced)."""
    out = []
    for d in range(NDIG):
        plane = (x >> jnp.uint64(8 * d)) & jnp.uint64(0xFF)
        out.append(plane.astype(jnp.float32).astype(jnp.bfloat16))
    return out


def _digit_matmul_left(w_dig: np.ndarray, x: jnp.ndarray,
                       tb: MxuNttTables) -> jnp.ndarray:
    """Exact (W @ M) mod p on the MXU.  w_dig: (L, NDIG, R, R) host;
    x: (..., L, R, C) u64 traced.  Returns (..., L, R, C) u64 < p.

    The NDIG lhs digit planes are stacked into one (NDIG*R, R) operand so
    each rhs digit plane needs a single big matmul; digit-pair products are
    then shift-accumulated into two u64 words (see _recombine2).
    """
    xd = _traced_digits(x)
    L, _, R, _ = w_dig.shape
    w_stack = w_dig.reshape(L, NDIG * R, R)
    v_lo = v_hi = None
    for db in range(NDIG):
        acc32 = None
        for j0 in range(0, R, CHUNK):
            part = jnp.einsum(
                "lkj,...ljc->...lkc",
                jnp.asarray(w_stack[:, :, j0:j0 + CHUNK]),
                xd[db][..., j0:j0 + CHUNK, :],
                preferred_element_type=jnp.float32)
            piece = part.astype(jnp.uint32)
            acc32 = piece if acc32 is None else acc32 + piece
        for da in range(NDIG):
            v = acc32[..., da * R:(da + 1) * R, :].astype(jnp.uint64)
            s = da + db
            if s < NDIG:
                v_lo = (v << jnp.uint64(8 * s)) if v_lo is None \
                    else v_lo + (v << jnp.uint64(8 * s))
            else:
                sh = jnp.uint64(8 * (s - NDIG))
                v_hi = (v << sh) if v_hi is None else v_hi + (v << sh)
    return _recombine2(v_lo, v_hi, tb)


def _digit_matmul_right(x: jnp.ndarray, wT_dig: np.ndarray,
                        tb: MxuNttTables) -> jnp.ndarray:
    """Exact (M @ W^T) mod p: x (..., L, R, C), wT_dig (L, NDIG, C, C) with
    wT[c, i] = W[i, c], contracting over c."""
    xd = _traced_digits(x)
    L, _, C, _ = wT_dig.shape
    w_stack = np.ascontiguousarray(
        wT_dig.transpose(0, 2, 1, 3)).reshape(L, C, NDIG * C)
    v_lo = v_hi = None
    for db in range(NDIG):
        acc32 = None
        for j0 in range(0, C, CHUNK):
            part = jnp.einsum(
                "...lrj,ljk->...lrk",
                xd[db][..., :, j0:j0 + CHUNK],
                jnp.asarray(w_stack[:, j0:j0 + CHUNK, :]),
                preferred_element_type=jnp.float32)
            piece = part.astype(jnp.uint32)
            acc32 = piece if acc32 is None else acc32 + piece
        for da in range(NDIG):
            v = acc32[..., da * C:(da + 1) * C].astype(jnp.uint64)
            s = da + db
            if s < NDIG:
                v_lo = (v << jnp.uint64(8 * s)) if v_lo is None \
                    else v_lo + (v << jnp.uint64(8 * s))
            else:
                sh = jnp.uint64(8 * (s - NDIG))
                v_hi = (v << sh) if v_hi is None else v_hi + (v << sh)
    return _recombine2(v_lo, v_hi, tb)


def _recombine2(v_lo, v_hi, tb: MxuNttTables) -> jnp.ndarray:
    """value = v_lo + v_hi * 2**(8*NDIG) mod p, with v_lo < 2**60.

    Bounds: v_lo accumulates digit-sums (< 2**25) shifted by at most
    8*(NDIG-1)=32 bits, times <= NDIG pair-contributions -> < 2**60; v_hi
    shifted by at most 24 bits -> < 2**52.  Two Barrett reductions + one
    Shoup multiply replace the former 9 bucket multiplies.
    """
    p = tb.p[..., None]
    mu = tb.mu[..., None]
    r_lo = barrett_reduce(v_lo, p, mu)
    r_hi = barrett_reduce(v_hi, p, mu)
    shifted = mulmod_shoup(r_hi, tb.pow_dig[:, NDIG],
                           tb.pow_dig_shoup[:, NDIG], p)
    return addmod(r_lo, shifted, p)


def ntt(x: jnp.ndarray, tb: MxuNttTables) -> jnp.ndarray:
    """Forward four-step NTT: (..., L, n) u64, bit-exact with ops.ntt.ntt."""
    lead = x.shape[:-1]
    m = x.reshape(lead + (tb.R, tb.C))
    y = _digit_matmul_left(tb.A_dig, m, tb)
    y = mulmod_shoup(y, tb.T, tb.T_shoup, tb.p[..., None])
    z = _digit_matmul_right(y, tb.B0T_dig, tb)
    return z.reshape(lead + (tb.n,))


def intt(y: jnp.ndarray, tb: MxuNttTables) -> jnp.ndarray:
    """Inverse four-step NTT: bit-exact with ops.ntt.intt (n^-1 folded)."""
    lead = y.shape[:-1]
    m = y.reshape(lead + (tb.R, tb.C))
    if tb.diag_left:      # B'_r = diag(e_r) @ B0': grid after the row matmul
        z = _digit_matmul_right(m, tb.B0iT_dig, tb)
        z = mulmod_shoup(z, tb.Ti, tb.Ti_shoup, tb.p[..., None])
    else:                 # B'_r = B0' @ diag(d_r): grid before
        z = mulmod_shoup(m, tb.Ti, tb.Ti_shoup, tb.p[..., None])
        z = _digit_matmul_right(z, tb.B0iT_dig, tb)
    x = _digit_matmul_left(tb.Ai_dig, z, tb)
    return x.reshape(lead + (tb.n,))
