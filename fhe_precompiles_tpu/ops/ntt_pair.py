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
    inv_last: tuple             # pair of (L, 1): inv_root[1] * n_inv mod p
    inv_last_shoup: tuple
    shoup_bits: int = 64        # 40 -> mulmod_shoup40 butterflies


def build_pair_tables(moduli: Sequence[int], n: int,
                      n_inv_factors: Sequence[int] | None = None,
                      shoup_bits: int = 40) -> PairNttTables:
    """n_inv_factors: optional per-limb constants folded into the inverse
    transform's n^-1 twiddle (same trick as ops/ntt.scale_n_inv).

    shoup_bits: twiddle Shoup precision.  40 (default) uses the 21-mul
    beta=40 butterflies of pair.mulmod_shoup40; 64 keeps the 24-mul
    exact-q path (same bit-exact results either way).
    """
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
    sp = (shoup_precompute if shoup_bits == 64 else pr.shoup40)
    # n^-1 folded into the final inverse stage's single twiddle (SEAL's
    # "inverse NTT with scalar"): the last level's odd output multiplies
    # by inv_root[1]*n_inv, the even one by n_inv -- no trailing pass.
    inv_last = ((inv_root[:, 1:2].astype(object) * n_inv.astype(object))
                % p_arr.astype(object)).astype(np.uint64)
    return PairNttTables(
        n=n,
        p=pr.split64(p_arr),
        p2=pr.split64(p_arr * np.uint64(2)),
        mu=pr.mu32(p_arr),
        c64=pr.split64(c64),
        root=pr.split64(root),
        root_shoup=pr.split64(sp(root, p_arr)),
        inv_root=pr.split64(inv_root),
        inv_root_shoup=pr.split64(sp(inv_root, p_arr)),
        n_inv=pr.split64(n_inv),
        n_inv_shoup=pr.split64(sp(n_inv, p_arr)),
        inv_last=pr.split64(inv_last),
        inv_last_shoup=pr.split64(sp(inv_last, p_arr)),
        shoup_bits=shoup_bits,
    )


def _tw(tab: tuple, L: int, m: int):
    """Slice twiddles [m:2m) and shape (L, m, 1) for stage broadcasting."""
    return (tab[0][:, m:2 * m].reshape((L, m, 1)),
            tab[1][:, m:2 * m].reshape((L, m, 1)))


def _tw_strided(tab: tuple, L: int, m: int, step_log2: int, sub: int):
    """Twiddles for fused-chunk level: root[(m<<l) + (g<<l) + sub] over
    g in [0, m), shaped (L, m, 1).  Host numpy slicing (tables are numpy),
    so XLA embeds each chunk's twiddles as constants."""
    idx = (m << step_log2) + (np.arange(m) << step_log2) + sub
    return (tab[0][:, idx].reshape((L, m, 1)),
            tab[1][:, idx].reshape((L, m, 1)))


RADIX_LOG2 = 2   # stages fused per HBM pass (radix-4); measured best on v5e


def _shoup_lazy(tb: PairNttTables):
    """Butterfly twiddle multiply (< 2p lazy) for the table's precision."""
    if tb.shoup_bits == 40:
        return lambda a, w, ws, p: pr.mulmod_shoup40(a, w, ws, p, lazy=True)
    return lambda a, w, ws, p: pr.mulmod_shoup(a, w, ws, p,
                                               lazy=True, exact_q=True)


def _hi_dtype(blocks, final: bool, hi8: bool):
    """hi8 chunk-boundary packing: the hi plane of every inter-chunk value
    fits in 8 bits (lazy bounds < 4p < 2**39 forward, < 2p inverse), so
    storing it as uint8 cuts the materialized HBM traffic per boundary
    from 8 to 5 bytes per residue; exact by the documented width bounds.
    Final outputs stay u32 (public Pair contract).

    MEASURED NEGATIVE (round 3, interleaved A/B on v5e, three variants):
    0.89x with a post-stack astype (separate un-fused pass), 0.96x with
    this pre-stack form -- the VPU cost of (32,128)-tile u8 pack/unpack
    exceeds the 3 bytes/residue saved.  With the radix-4 u32 path already
    at ~95% of HBM peak (1.03M transforms/s x 786KB), the NTT is at
    speed-of-light for this formulation; kept off by default (hi8=False)
    as the documented probe.

    Each block converts BEFORE the boundary stack so the butterfly fusion
    itself writes u8 (a post-stack astype was measured as a separate
    un-fused HBM pass: 0.89x instead of a win).  The caller additionally
    flattens the stacked u8 plane to 2D (rows, n): TPU tiles u8 as
    (32, 128) on the two minor dims, so a (B, L, n) rank-3 u8 buffer
    would pad L -> 32 and inflate the plane ~6x."""
    if hi8 and not final:
        return [(lo, hi.astype(jnp.uint8)) for lo, hi in blocks]
    return blocks


def _unpack_hi(blocks):
    """Chunk-entry convert: hi planes arrive as u8 (packed boundary) or
    u32 (external input); butterflies always compute in u32."""
    return [(lo, hi.astype(jnp.uint32)) for lo, hi in blocks]


def ntt_pair(a: pr.Pair, tb: PairNttTables,
             radix_log2: int = RADIX_LOG2, hi8: bool = False) -> pr.Pair:
    """Forward NTT over pair arrays shaped (..., L, n); natural -> bit-rev.

    Inputs must be CANONICAL (< p) -- true for every engine call site; it
    lets the very first stage skip its conditional subtract (x < p < 2p
    makes it the identity, but XLA cannot know that at compile time).

    Harvey lazy butterflies (SEAL's discipline): values stay < 4p between
    stages; each butterfly does ONE conditional subtract (by 2p) and an
    exact-q Shoup product < 2p with no trailing subtracts:
        u  = lo - (lo >= 2p ? 2p : 0)            [< 2p]
        t  = shoup_exact_lazy(hi, w)             [< 2p]
        lo' = u + t ; hi' = u + 2p - t           [< 4p]
    ``radix_log2`` consecutive stages are written as ONE elementwise
    expression over 2**R strided slices -- no intermediate stack/reshape,
    so XLA fuses the chunk into a single HBM pass (the per-stage
    materialization was ~1/3 of stage cost; the radix-4 attempt on the
    u64 path failed exactly because its two sub-stages were sequential
    ops XLA rematerialized between).  The last chunk folds the canonical
    reduction in; output is bit-identical to the strict transform.
    """
    n = tb.n
    lead = a[0].shape[:-2]
    L = a[0].shape[-2]
    pp = (tb.p[0].reshape((L, 1, 1)), tb.p[1].reshape((L, 1, 1)))
    pp2 = (tb.p2[0].reshape((L, 1, 1)), tb.p2[1].reshape((L, 1, 1)))
    shoup = _shoup_lazy(tb)
    nstage = int(np.log2(n))
    s_done, m, t = 0, 1, n
    while s_done < nstage:
        R = min(radix_log2, nstage - s_done)
        nbl = 1 << R
        t //= nbl
        v = tuple(x.reshape(lead + (L, m, nbl, t)) for x in a)
        blocks = _unpack_hi([(v[0][..., i, :], v[1][..., i, :])
                             for i in range(nbl)])
        for lv in range(R):
            d = 1 << (R - 1 - lv)
            for i in range(nbl):
                if i & d:
                    continue
                sub = i >> (R - lv)          # high lv bits of the index
                w = _tw_strided(tb.root, L, m, lv, sub)
                ws = _tw_strided(tb.root_shoup, L, m, lv, sub)
                u = (blocks[i] if s_done + lv == 0    # canonical input < 2p
                     else pr._csub(blocks[i], pp2))
                tt = shoup(blocks[i + d], w, ws, pp)
                blocks[i] = pr.add_pair(u, tt)
                blocks[i + d] = pr.sub_pair(pr.add_pair(u, pp2), tt)
        s_done += R
        m <<= R
        if s_done == nstage:   # canonicalize inline: values < 4p -> < p
            blocks = [pr._csub(pr._csub(b, pp2), pp) for b in blocks]
        blocks = _hi_dtype(blocks, s_done == nstage, hi8)
        a = tuple(jnp.stack([b[pl] for b in blocks], axis=-2
                            ).reshape(lead + (L, n)) for pl in range(2))
        if hi8 and s_done < nstage:
            a = (a[0], a[1].reshape(-1, n))   # unpadded u8 tiling
    return a


def intt_pair(a: pr.Pair, tb: PairNttTables,
              radix_log2: int = RADIX_LOG2, hi8: bool = False) -> pr.Pair:
    """Inverse NTT over pair arrays shaped (..., L, n); bit-rev -> natural.

    Harvey lazy inverse (values stay < 2p between stages):
        s = lo + hi - (>= 2p ? 2p : 0)           [< 2p]
        d = shoup_exact_lazy(lo + 2p - hi, w)    [< 2p]
    with the same single-HBM-pass chunking as :func:`ntt_pair`; the final
    n^-1 twiddle multiply canonicalizes.  Bit-identical to the strict
    transform.
    """
    n = tb.n
    lead = a[0].shape[:-2]
    L = a[0].shape[-2]
    pp = (tb.p[0].reshape((L, 1, 1)), tb.p[1].reshape((L, 1, 1)))
    pp2 = (tb.p2[0].reshape((L, 1, 1)), tb.p2[1].reshape((L, 1, 1)))
    shoup = _shoup_lazy(tb)
    if tb.shoup_bits == 40:
        canon = lambda x, w, ws: pr.mulmod_shoup40(x, w, ws, pp)
    else:
        canon = lambda x, w, ws: pr.mulmod_shoup(x, w, ws, pp, exact_q=True)
    r3 = lambda f: (f[0].reshape((L, 1, 1)), f[1].reshape((L, 1, 1)))
    nstage = int(np.log2(n))
    s_done, m, t = 0, n // 2, 1
    while s_done < nstage:
        R = min(radix_log2, nstage - s_done)
        nbl = 1 << R
        m_last = m >> (R - 1)
        v = tuple(x.reshape(lead + (L, m_last, nbl, t)) for x in a)
        blocks = _unpack_hi([(v[0][..., i, :], v[1][..., i, :])
                             for i in range(nbl)])
        for lv in range(R):
            d = 1 << lv
            # final global stage (m_lv == 1): fold n^-1 into both outputs
            # (one NEW multiply on the even side, a pre-scaled twiddle on
            # the odd side) and canonicalize -- removes the trailing
            # full-array n^-1 pass entirely
            last = s_done + lv + 1 == nstage
            for i in range(nbl):
                if i & d:
                    continue
                sub = i >> (lv + 1)          # high bits above the pair bit
                # stage modulus count: m_lv = m_last << (R - 1 - lv)
                lo, hi = blocks[i], blocks[i + d]
                s = pr._csub(pr.add_pair(lo, hi), pp2)
                df = pr.sub_pair(pr.add_pair(lo, pp2), hi)
                if last:
                    blocks[i] = canon(s, r3(tb.n_inv), r3(tb.n_inv_shoup))
                    blocks[i + d] = canon(df, r3(tb.inv_last),
                                          r3(tb.inv_last_shoup))
                else:
                    w = _tw_strided(tb.inv_root, L, m_last, R - 1 - lv, sub)
                    ws = _tw_strided(tb.inv_root_shoup, L, m_last,
                                     R - 1 - lv, sub)
                    blocks[i] = s
                    blocks[i + d] = shoup(df, w, ws, pp)
        s_done += R
        m >>= R
        t <<= R
        blocks = _hi_dtype(blocks, s_done == nstage, hi8)
        a = tuple(jnp.stack([b[pl] for b in blocks], axis=-2
                            ).reshape(lead + (L, n)) for pl in range(2))
        if hi8 and s_done < nstage:
            a = (a[0], a[1].reshape(-1, n))   # unpadded u8 tiling
    return a


def pointwise_mulmod_pair(a: pr.Pair, b: pr.Pair,
                          tb: PairNttTables) -> pr.Pair:
    """General (data x data) product mod the stacked moduli."""
    return pr.mulmod(a, b, tb.p, tb.mu, tb.c64)
