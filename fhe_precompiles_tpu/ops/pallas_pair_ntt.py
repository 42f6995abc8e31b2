"""VMEM-resident Pallas NTT on u32-pair residues (all stages in one kernel).

The XLA stage path (ops/ntt_pair.py) materializes the array to HBM between
butterfly stages (~25us per stage at n=4096/B=128 against ~55us compute:
measured additive, benchmarks/RESULTS.md roofline).  This kernel keeps a
(TB, n) tile resident in VMEM across ALL log2(n) stages: one HBM read, one
write.  Butterfly partner exchange is a lane-axis ``pltpu.roll`` (partners
sit i +- t apart in the flat coefficient axis); both butterfly outputs are
computed everywhere and selected by an iota parity mask -- that costs a
full-width Shoup product per stage (2x the arithmetic minimum) but the
kernel is memory-bound enough that VMEM residency dominates.

Same Harvey lazy discipline and bit-exact contract as ops/ntt_pair.py
(SEAL bit-reversed Longa-Naehrig layout; tests/test_pallas_pair_ntt.py).

Mosaic notes honored: no 64-bit ints (u32 pairs), no lane-axis reshapes
in-kernel (the wrapper pre-flattens to (L*B, n) rows), index_map literals
stay i32 via the 0*l trick, iota is 2D.
"""
from __future__ import annotations

from typing import Sequence, Tuple

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


def _kernel_factory(inverse: bool, nstage: int):
    def kernel(scal_ref, wlo_ref, whi_ref, slo_ref, shi_ref,
               xlo_ref, xhi_ref, olo_ref, ohi_ref):
        def sc(i):
            return (jnp.full((1, 1), scal_ref[0, 0, 2 * i], jnp.uint32),
                    jnp.full((1, 1), scal_ref[0, 0, 2 * i + 1], jnp.uint32))
        p, p2, n_inv, n_inv_s = sc(0), sc(1), sc(2), sc(3)
        x = (xlo_ref[...], xhi_ref[...])            # (TB, n)
        TB, n = x[0].shape
        lanes = jax.lax.broadcasted_iota(jnp.uint32, (TB, n), 1)
        for s in range(nstage):
            t = (n >> (s + 1)) if not inverse else (1 << s)
            w = (wlo_ref[0, s:s + 1, :], whi_ref[0, s:s + 1, :])
            ws = (slo_ref[0, s:s + 1, :], shi_ref[0, s:s + 1, :])
            log2t = int(np.log2(t))
            is_lo = ((lanes >> jnp.uint32(log2t)) & jnp.uint32(1)) == 0
            if not inverse:
                # Harvey CT: u = csub2p(lo); t' = w*hi < 2p
                # lo' = u + t' ; hi' = u + 2p - t'   (both < 4p)
                u = pr._csub(x, p2)
                tt = pr.mulmod_shoup(u, w, ws, p, lazy=True, exact_q=True)
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
                out_hi = pr.mulmod_shoup(
                    pr.sub_pair(pr.add_pair(xp_p, p2), x), w, ws, p,
                    lazy=True, exact_q=True)
            x = (jnp.where(is_lo, out_lo[0], out_hi[0]),
                 jnp.where(is_lo, out_lo[1], out_hi[1]))
        if not inverse:     # values < 4p -> canonical
            x = pr._csub(pr._csub(x, p2), p)
        else:               # n^-1 twiddle (exact-q) canonicalizes from < 2p
            x = pr.mulmod_shoup(x, n_inv, n_inv_s, p, exact_q=True)
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
                 interpret: bool = False):
        self.n, self.tb, self.interpret = n, tb, interpret
        self.L = len(moduli)
        self.nstage = int(np.log2(n))
        tabs = [get_ntt_tables(int(p), n) for p in moduli]
        p_arr = np.array([[int(p)] for p in moduli], dtype=np.uint64)

        def build(powers_name: str, inverse: bool):
            grids = np.stack([
                _position_twiddles(np.asarray(getattr(t, powers_name)),
                                   n, inverse) for t in tabs])   # (L, S, n)
            gs = shoup_precompute(
                grids, p_arr.reshape(self.L, 1, 1))
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
        n_inv_s = shoup_precompute(n_inv, p_arr)
        scal = np.zeros((self.L, 1, 8), dtype=np.uint32)
        for i, col in enumerate([p_arr[:, 0], 2 * p_arr[:, 0],
                                 n_inv[:, 0], n_inv_s[:, 0]]):
            scal[:, 0, 2 * i] = (col & 0xFFFFFFFF).astype(np.uint32)
            scal[:, 0, 2 * i + 1] = (col >> 32).astype(np.uint32)
        self.scal = scal

    def _call(self, a: pr.Pair, inverse: bool) -> pr.Pair:
        n, L, tb = self.n, self.L, self.tb
        lead = a[0].shape[:-2]
        B = int(np.prod(lead)) if lead else 1
        pad = (-B) % tb
        Bp = B + pad

        def to_rows(x):
            x = x.reshape(B, L, n)
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((pad, L, n), dtype=x.dtype)], axis=0)
            return jnp.moveaxis(x, 1, 0).reshape(L * Bp, n)
        rows = tuple(to_rows(x) for x in a)

        kern = _kernel_factory(inverse, self.nstage)
        tables = self.inv_tables if inverse else self.fwd_tables
        nb = Bp // tb
        const = lambda shape: pl.BlockSpec(
            (1,) + shape, lambda l, bt: (l, 0 * l, 0 * l))
        dspec = pl.BlockSpec((tb, n), lambda l, bt: (l * nb + bt, 0 * l))
        out_lo, out_hi = pl.pallas_call(
            kern,
            grid=(L, nb),
            in_specs=[const((1, 8))] + [const((self.nstage, n))] * 4
            + [dspec, dspec],
            out_specs=[dspec, dspec],
            out_shape=[jax.ShapeDtypeStruct((L * Bp, n), jnp.uint32)] * 2,
            interpret=self.interpret,
        )(self.scal, *tables, *rows)

        def from_rows(x):
            x = jnp.moveaxis(x.reshape(L, Bp, n), 0, 1)[:B]
            return x.reshape(lead + (L, n))
        return tuple(from_rows(x) for x in (out_lo, out_hi))

    def ntt(self, a: pr.Pair) -> pr.Pair:
        return self._call(a, inverse=False)

    def intt(self, a: pr.Pair) -> pr.Pair:
        return self._call(a, inverse=True)
