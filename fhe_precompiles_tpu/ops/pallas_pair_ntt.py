"""VMEM-resident Pallas NTT on u32-pair residues (all stages in one kernel).

MEASURED NEGATIVE RESULT (round 3, interleaved A/B on v5e): 444k vs 963k
transforms/s = 0.46x the XLA radix-4 pair path, even with the beta=40
Shoup product and a transpose-free full-sublane-utilization layout.  The
analysis closes the question:

  * the XLA radix-4 path at 963k tr/s moves ~786KB HBM per transform
    (6 read+write passes) = ~756 GB/s, ~92% of v5e's 819 GB/s peak --
    it already runs at the memory-bandwidth speed-of-light;
  * this kernel removes 5 of the 6 passes but pays the SIMD select-both
    penalty: the Shoup product is computed at EVERY lane and discarded at
    the lo half (no Mosaic primitive compacts butterfly halves without a
    lane-axis reshape), so it does 12 products/point vs the XLA path's 6
    -- exactly the measured 2x slowdown, now compute-bound;
  * ergo further NTT gains must cut BYTES PER PASS (see the u8 hi-plane
    scheme in ops/ntt_pair.py), not passes.

Kept with tests as the documented ceiling probe for the fused-kernel
direction.

The XLA pair path (ops/ntt_pair.py) materializes the array to HBM between
radix-4 butterfly chunks -- 6 read+write passes for n=4096.  This kernel
keeps a (tb*L, n) row tile resident in VMEM across ALL log2(n) stages:
one HBM read, one write.  Butterfly partner exchange is a lane-axis ``pltpu.roll``
(partners sit i +- t apart in the flat coefficient axis); both butterfly
outputs are computed everywhere and selected by an iota parity mask -- a
full-width Shoup product per stage (2x the arithmetic minimum), paid for
by the 6x HBM-pass reduction.

Two lessons from the round-3 version of this kernel (which measured ~1.0x
the XLA path and is superseded here):

  * it used the 24-mul exact-q 64-bit Shoup product; this one uses the
    21-mul beta=40 product (pair.mulmod_shoup40) applied to the RAW lazy
    input (< 4p is within the beta=40 bound), which also decouples the
    multiply from the conditional-subtract dependency chain;
  * its wrapper ``moveaxis``-ed (B, L, n) data into modulus-major rows --
    a materialized transpose on BOTH sides of the kernel, i.e. 2 of the 6
    saved HBM passes immediately spent.  This version reshapes (B, L, n)
    to (B*L, n) rows -- contiguous, so the reshape is free -- and tiles
    the (L, n) twiddle rows across each 8*L-row block inside the kernel
    (row r belongs to modulus r % L).  The kernel stays 2D, every sublane
    carries real data, and no transpose exists anywhere.

Same Harvey lazy discipline and bit-exact contract as ops/ntt_pair.py
(SEAL bit-reversed Longa-Naehrig layout; tests/test_pallas_pair_ntt.py).

Mosaic notes honored: no 64-bit ints (u32 pairs), no lane-axis reshapes
in-kernel (the unit modulus axis is sliced away, the lane axis is never
reshaped), index_map literals stay i32 via the 0*l trick, iota is 2D.

Reference capability: SEAL's NTT (SURVEY.md section 2.2); the fused
formulation is TPU-native design, no reference counterpart.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bfv.modmath import get_ntt_tables
from .modmath import shoup_precompute
from . import pair as pr


def _position_twiddles(powers: np.ndarray, n: int, inverse: bool
                       ) -> np.ndarray:
    """(S, n) table: w_pos[s, i] = twiddle of the butterfly containing
    position i at stage s (forward stage order m = 1,2,...,n/2; inverse
    m = n/2,...,1)."""
    stages = []
    ms = ([1 << s for s in range(int(np.log2(n)))] if not inverse
          else [n >> (s + 1) for s in range(int(np.log2(n)))])
    idx = np.arange(n)
    for m in ms:
        t = n // (2 * m)
        stages.append(powers[m + idx // (2 * t)])
    return np.stack(stages)


def _kernel_factory(inverse: bool, nstage: int, shoup_bits: int):
    if shoup_bits == 40:
        mul_lazy = lambda a, w, ws, p: pr.mulmod_shoup40(a, w, ws, p,
                                                         lazy=True)
        mul_canon = lambda a, w, ws, p: pr.mulmod_shoup40(a, w, ws, p)
    else:
        mul_lazy = lambda a, w, ws, p: pr.mulmod_shoup(
            a, w, ws, p, lazy=True, exact_q=True)
        mul_canon = lambda a, w, ws, p: pr.mulmod_shoup(
            a, w, ws, p, exact_q=True)

    def kernel(scal_ref, wlo_ref, whi_ref, slo_ref, shi_ref,
               xlo_ref, xhi_ref, olo_ref, ohi_ref):
        R = xlo_ref.shape[0]                       # rows = g * L
        L = scal_ref.shape[0]
        g = R // L

        def tile(v):
            # (L, ...) -> (g*L, ...): row r of the result belongs to
            # modulus r % L, matching the (B*L, n) row layout.  A
            # sublane-axis concat only -- the lane axis is untouched.
            return v if g == 1 else jnp.concatenate([v] * g, axis=0)

        def sc(i):
            return (tile(scal_ref[:, 2 * i:2 * i + 1]),
                    tile(scal_ref[:, 2 * i + 1:2 * i + 2]))
        p, p2, n_inv, n_inv_s = sc(0), sc(1), sc(2), sc(3)
        x = (xlo_ref[...], xhi_ref[...])           # (R, n)
        n = x[0].shape[1]
        lanes = jax.lax.broadcasted_iota(jnp.uint32, (R, n), 1)
        for s in range(nstage):
            t = (n >> (s + 1)) if not inverse else (1 << s)
            w = (tile(wlo_ref[:, s, :]), tile(whi_ref[:, s, :]))  # (R, n)
            ws = (tile(slo_ref[:, s, :]), tile(shi_ref[:, s, :]))
            log2t = int(np.log2(t))
            is_lo = ((lanes >> jnp.uint32(log2t)) & jnp.uint32(1)) == 0
            if not inverse:
                # Harvey CT: u = csub2p(lo); t' = w*hi < 2p
                # lo' = u + t' ; hi' = u + 2p - t'   (both < 4p)
                # The product takes the RAW value (< 4p is within the
                # beta=40 bound) so it does not wait on the csub.
                u = pr._csub(x, p2)
                tt = mul_lazy(x, w, ws, p)
                # shifts must stay i32 under jax_enable_x64 (Mosaic op)
                tp = tuple(pltpu.roll(v, np.int32(n - t), axis=1)
                           for v in tt)
                up = tuple(pltpu.roll(v, np.int32(t), axis=1) for v in u)
                out_lo = pr.add_pair(u, tp)
                out_hi = pr.sub_pair(pr.add_pair(up, p2), tt)
            else:
                # Harvey GS: lo' = csub2p(lo + hi); hi' = w*(lo + 2p - hi)
                xp_m = tuple(pltpu.roll(v, np.int32(n - t), axis=1)
                             for v in x)
                xp_p = tuple(pltpu.roll(v, np.int32(t), axis=1) for v in x)
                out_lo = pr._csub(pr.add_pair(x, xp_m), p2)
                out_hi = mul_lazy(
                    pr.sub_pair(pr.add_pair(xp_p, p2), x), w, ws, p)
            x = (jnp.where(is_lo, out_lo[0], out_hi[0]),
                 jnp.where(is_lo, out_lo[1], out_hi[1]))
        if not inverse:     # values < 4p -> canonical
            x = pr._csub(pr._csub(x, p2), p)
        else:               # n^-1 twiddle canonicalizes from < 2p
            x = mul_canon(x, n_inv, n_inv_s, p)
        olo_ref[...] = x[0]
        ohi_ref[...] = x[1]
    return kernel


class PairPallasNtt:
    """Fused-kernel pair NTT/iNTT for a stack of moduli.

    API mirrors ops/ntt_pair.py: ``ntt``/``intt`` over pair arrays shaped
    (..., L, n); bit-exact with the stage transforms.
    """

    def __init__(self, moduli: Sequence[int], n: int, tb: int = 8,
                 n_inv_factors: Sequence[int] | None = None,
                 interpret: bool = False, shoup_bits: int = 40):
        self.n, self.tb, self.interpret = n, tb, interpret
        self.L = len(moduli)
        self.nstage = int(np.log2(n))
        self.shoup_bits = shoup_bits
        tabs = [get_ntt_tables(int(p), n) for p in moduli]
        p_arr = np.array([[int(p)] for p in moduli], dtype=np.uint64)
        sp = (shoup_precompute if shoup_bits == 64
              else lambda w, p: pr.shoup40(w, p))

        def build(powers_name: str, inverse: bool):
            grids = np.stack([
                _position_twiddles(np.asarray(getattr(t, powers_name)),
                                   n, inverse) for t in tabs])   # (L, S, n)
            gs = sp(grids, p_arr.reshape(self.L, 1, 1))
            glo, ghi = pr.split64(grids)
            slo, shi = pr.split64(gs)
            return glo, ghi, slo, shi

        self.fwd_tables = build("root_powers", False)
        self.inv_tables = build("inv_root_powers", True)

        n_inv = np.array([[int(t.n_inv)] for t in tabs], dtype=np.uint64)
        if n_inv_factors is not None:
            n_inv = ((n_inv.astype(object)
                      * np.array(list(n_inv_factors), dtype=object
                                 ).reshape(-1, 1))
                     % p_arr.astype(object)).astype(np.uint64)
        n_inv_s = sp(n_inv, p_arr)
        scal = np.zeros((self.L, 8), dtype=np.uint32)
        for i, col in enumerate([p_arr[:, 0], 2 * p_arr[:, 0],
                                 n_inv[:, 0], n_inv_s[:, 0]]):
            scal[:, 2 * i] = (col & 0xFFFFFFFF).astype(np.uint32)
            scal[:, 2 * i + 1] = (col >> 32).astype(np.uint32)
        self.scal = scal

    def _call(self, a: pr.Pair, inverse: bool) -> pr.Pair:
        n, L, tb = self.n, self.L, self.tb
        lead = a[0].shape[:-2]
        B = int(np.prod(lead)) if lead else 1
        pad = (-B) % tb              # whole ciphertexts, keeps r % L
        Bp = B + pad
        R = tb * L                   # rows per block

        def to_rows(x):
            x = x.reshape(B * L, n)  # contiguous: reshape is free
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((pad * L, n), dtype=x.dtype)], axis=0)
            return x
        rows = tuple(to_rows(x) for x in a)

        kern = _kernel_factory(inverse, self.nstage, self.shoup_bits)
        tables = self.inv_tables if inverse else self.fwd_tables
        nb = Bp // tb
        c2 = pl.BlockSpec((L, 8), lambda bt: (0 * bt, 0 * bt))
        c3 = pl.BlockSpec((L, self.nstage, n),
                          lambda bt: (0 * bt, 0 * bt, 0 * bt))
        dspec = pl.BlockSpec((R, n), lambda bt: (bt, 0 * bt))
        out_lo, out_hi = pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[c2] + [c3] * 4 + [dspec, dspec],
            out_specs=[dspec, dspec],
            out_shape=[jax.ShapeDtypeStruct((Bp * L, n), jnp.uint32)] * 2,
            interpret=self.interpret,
            # the unrolled 12-stage body peaks above Mosaic's default 16MB
            # scoped-vmem stack; v5e has 128MB VMEM
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(self.scal, *tables, *rows)

        def from_rows(x):
            return x[:B * L].reshape(lead + (L, n))
        return tuple(from_rows(x) for x in (out_lo, out_hi))

    def ntt(self, a: pr.Pair) -> pr.Pair:
        return self._call(a, inverse=False)

    def intt(self, a: pr.Pair) -> pr.Pair:
        return self._call(a, inverse=True)
