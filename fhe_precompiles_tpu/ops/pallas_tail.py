"""VMEM-resident Pallas kernels for the BEHZ multiply tail.

WHY: the mul_relin HLO materializes ~7 GB of fusion outputs per 128-batch
(measured by ENTRY-op byte ranking, round 3) against a ~1.5 GB structural
minimum.  The tail's pair arithmetic (ops/pair.py) expands every modular
multiply into dozens of 16-bit-split HLO ops, so XLA's fusion size caps
split the elementwise chains into MULTIPLE passes, each re-materializing
full (B, polys, limbs, n) pair tensors.  Unlike the NTT (where a fused
kernel pays the SIMD select-both penalty, ops/pallas_pair_ntt.py), the
tail has NO cross-lane communication at all -- a Pallas kernel computes
each segment in VMEM with exactly one HBM read per input and one write
per output.

Each kernel covers one inter-NTT segment of ops/behz_pair.py and is
bit-exact with it (tests/test_pallas_tail.py; the math and bounds are
identical, only the scheduling differs):

  * ``to_bsk_ext``   -- prepare()'s base extension q -> q u Bsk (+ the
                        identity copy of the q limbs for the concat)
  * ``dyadic``       -- mul_core()'s Karatsuba tensor product
  * ``floor_sk``     -- mul_core()'s FastFloor + Shenoy-Kumaresan tail
  * ``relin_dot``    -- relinearize()'s key inner product (NTT domain)
  * ``mod_down``     -- relinearize()'s special-prime division + add

Per-limb constants are baked into the kernel as Python immediates (limb
loops are unrolled at trace time), so no scalar operands are streamed.
Reference capability: SEAL Evaluator BEHZ tail (SURVEY.md section 2.2);
the fused formulation is TPU-native design with no reference counterpart.

MEASURED NEGATIVE (v5e, tools/ab_bench.py tailpallas, interleaved,
bit-exact on device): 0.823x end-to-end vs the XLA tail (10,020 vs
12,178 mul+relin/s at n=4096/B=128).  The HBM passes saved are real,
but Mosaic lowers every u32-pair cross-multiply to full-width 32x32
products (no 16x16 narrowing like XLA's fusion of the split arithmetic),
making the tail segment ~1.5x slower in compute than the multi-pass XLA
version is in bandwidth -- the same structural penalty that closed the
VMEM NTT (ops/pallas_pair_ntt.py).  Kept as an opt-in
(``JaxEngine(pair_tail="pallas")``) with full bit-exactness tests; the
default stays "xla".  Do not retry without a Mosaic narrowing primitive.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pair as pr

_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _u32(x) -> np.uint32:
    """Any 1-element host array/scalar -> a TRUE numpy scalar, so the
    kernel closure embeds an immediate (pallas rejects captured (1,)
    arrays as constants)."""
    return np.uint32(int(np.asarray(x).reshape(-1)[0]))


def _sc(pair_arr, i) -> tuple:
    """Host (lo, hi) (L, 1) uint32 planes -> python-immediate pair."""
    return (_u32(pair_arr[0][i]), _u32(pair_arr[1][i]))


def _sc_shoup(ws, i) -> tuple:
    """Engine ((w_lo,w_hi),(ws_lo,ws_hi)) rows -> immediate pairs."""
    w, s = ws
    return _sc(w, i), _sc(s, i)


def _csub_s(r, p):
    """pair._csub against an immediate scalar pair."""
    ge = (r[1] > p[1]) | ((r[1] == p[1]) & (r[0] >= p[0]))
    d = pr.sub_pair(r, p)
    return jnp.where(ge, d[0], r[0]), jnp.where(ge, d[1], r[1])


def _csub_reduce_s(x, p, steps):
    for _ in range(steps):
        x = _csub_s(x, p)
    return x


def _submod_s(a, b, p):
    ge = (a[1] > b[1]) | ((a[1] == b[1]) & (a[0] >= b[0]))
    d = pr.sub_pair(a, b)
    e = pr.sub_pair(pr.add_pair(a, p), b)
    return jnp.where(ge, d[0], e[0]), jnp.where(ge, d[1], e[1])


def _pad_rows(x, tb):
    rows = x.shape[0]
    pad = (-rows) % tb
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], dtype=x.dtype)], axis=0)
    return x, rows


class PairTailPallas:
    """Builds the five tail kernels from a PairBehz instance's constants."""

    def __init__(self, pb, n: int, tb: int = 8, interpret: bool = False):
        self.pb = pb
        self.n, self.tb, self.interpret = n, tb, interpret

    # ------------------------------------------------------------------
    # shared launch helper: every kernel maps (rows, C_in, n) pair planes
    # to (rows, C_out, n) pair planes over a 1-D batch-tile grid
    # ------------------------------------------------------------------
    def _launch(self, kern, ins, c_out: int):
        """ins: list of pair tuples shaped (rows, C_i, n)."""
        n, tb = self.n, self.tb
        flat = []
        rows0 = None
        for lo, hi in ins:
            lo, rows0 = _pad_rows(lo, tb)
            hi, _ = _pad_rows(hi, tb)
            flat += [lo, hi]
        rows_p = flat[0].shape[0]
        # index_map zeros as 0 * bt: literal 0 lowers to i64 under x64 and
        # Mosaic rejects the (i32, i64, i64) index tuple (func.return
        # legalization failure on real TPU; interpret mode never sees it)
        in_specs = [
            pl.BlockSpec((tb, x.shape[1], n), lambda bt: (bt, 0 * bt, 0 * bt))
            for x in flat]
        ospec = pl.BlockSpec((tb, c_out, n), lambda bt: (bt, 0 * bt, 0 * bt))
        out = pl.pallas_call(
            kern,
            grid=(rows_p // tb,),
            in_specs=in_specs,
            out_specs=[ospec, ospec],
            out_shape=[jax.ShapeDtypeStruct((rows_p, c_out, n),
                                            jnp.uint32)] * 2,
            interpret=self.interpret,
            compiler_params=_VMEM,
        )(*flat)
        return (out[0][:rows0], out[1][:rows0])

    # ------------------------------------------------------------------
    # prepare(): q -> q u Bsk base extension (behz_pair.to_bsk + concat)
    # ------------------------------------------------------------------
    @functools.cached_property
    def _to_bsk_kern(self):
        pb = self.pb
        k, nbsk = pb.k, pb.nb - pb.k
        mt_qh = [_sc_shoup(pb.mt_qhinv, i) for i in range(k)]
        q = [_sc(pb.q_mods, i) for i in range(k)]
        qhb_w, qhb_s = pb.q_hat_mod_bsk        # (nbsk, k) pair planes
        bskc = [_sc(pb.bsk, j) for j in range(nbsk)]
        mu_b = [_u32(pb.mu_bsk32[j]) for j in range(nbsk)]
        qmb = [_sc_shoup(pb.q_mod_bsk, j) for j in range(nbsk)]
        imtb = [_sc_shoup(pb.inv_mt_mod_bsk, j) for j in range(nbsk)]
        qh_mt = [_u32(pb.q_hat_mod_mt[i]) for i in range(k)]
        mask = np.uint32(pb.mt_mask)
        neg_inv = np.uint32(pb.neg_inv_q_mod_mt)
        mt_half = np.uint32(pb.mt // 2)
        mt_u = np.uint32(pb.mt)

        def kern(alo_ref, ahi_ref, olo_ref, ohi_ref):
            a = [(alo_ref[:, i, :], ahi_ref[:, i, :]) for i in range(k)]
            # y_i = |a_i * mt * q_hat_inv_i|_{q_i}   (one composed scalar)
            y = [pr.mulmod_shoup(a[i], *mt_qh[i], q[i]) for i in range(k)]
            # m_tilde row: power-of-two mask arithmetic on the low words
            acc_mt = (y[0][0] & mask) * qh_mt[0]
            for i in range(1, k):
                acc_mt = acc_mt + (y[i][0] & mask) * qh_mt[i]
            r = ((acc_mt & mask) * neg_inv) & mask
            big = r > mt_half
            for j in range(nbsk):
                acc = None
                for i in range(k):
                    t = pr.mulmod_shoup(
                        y[i],
                        (_u32(qhb_w[0][j, i]),
                         _u32(qhb_w[1][j, i])),
                        (_u32(qhb_s[0][j, i]),
                         _u32(qhb_s[1][j, i])),
                        bskc[j], lazy=True)
                    acc = t if acc is None else pr.add_pair(acc, t)
                c_bsk = pr.barrett(acc, mu_b[j], bskc[j], x_max_bits=44)
                # centered m_tilde correction (behz_pair.to_bsk rm):
                # rm = bsk_j - (mt - r) if r > mt/2 else r
                d = pr.sub_pair(bskc[j], (mt_u - r, jnp.zeros_like(r)))
                rm = (jnp.where(big, d[0], r),
                      jnp.where(big, d[1], jnp.zeros_like(r)))
                num = _csub_s(pr.add_pair(
                    c_bsk, pr.mulmod_shoup(rm, *qmb[j], bskc[j])), bskc[j])
                ob = pr.mulmod_shoup(num, *imtb[j], bskc[j])
                olo_ref[:, k + j, :] = ob[0]
                ohi_ref[:, k + j, :] = ob[1]
            for i in range(k):      # identity limbs of the concat
                olo_ref[:, i, :] = a[i][0]
                ohi_ref[:, i, :] = a[i][1]
        return kern

    def to_bsk_ext(self, a: pr.Pair) -> pr.Pair:
        """(..., 2, k, n) ct -> (..., 2, nb, n): [a, to_bsk(a)]."""
        pb, n = self.pb, self.n
        lead = a[0].shape[:-2]
        rows = int(np.prod(lead))
        ins = [tuple(x.reshape(rows, pb.k, n) for x in a)]
        lo, hi = self._launch(self._to_bsk_kern, ins, pb.nb)
        return (lo.reshape(lead + (pb.nb, n)),
                hi.reshape(lead + (pb.nb, n)))

    # ------------------------------------------------------------------
    # mul_core() part 1: Karatsuba tensor product (NTT domain)
    # ------------------------------------------------------------------
    @functools.cached_property
    def _dyadic_kern(self):
        pb = self.pb
        nb = pb.nb
        tpa = pb.tp_all
        mods = [_sc(tpa.p, i) for i in range(nb)]
        mus = [_u32(tpa.mu[i]) for i in range(nb)]
        c64s = [_sc(tpa.c64, i) for i in range(nb)]

        def kern(falo_ref, fahi_ref, fblo_ref, fbhi_ref, olo_ref, ohi_ref):
            for i in range(nb):
                p, mu, c64 = mods[i], mus[i], c64s[i]
                a0 = (falo_ref[:, i, :], fahi_ref[:, i, :])
                a1 = (falo_ref[:, nb + i, :], fahi_ref[:, nb + i, :])
                b0 = (fblo_ref[:, i, :], fbhi_ref[:, i, :])
                b1 = (fblo_ref[:, nb + i, :], fbhi_ref[:, nb + i, :])
                t0 = pr.mulmod(a0, b0, p, mu, c64)
                t2 = pr.mulmod(a1, b1, p, mu, c64)
                sa = _csub_s(pr.add_pair(a0, a1), p)
                sb = _csub_s(pr.add_pair(b0, b1), p)
                cross = pr.mulmod(sa, sb, p, mu, c64)
                t1 = _submod_s(_submod_s(cross, t0, p), t2, p)
                for j, t in enumerate((t0, t1, t2)):
                    olo_ref[:, j * nb + i, :] = t[0]
                    ohi_ref[:, j * nb + i, :] = t[1]
        return kern

    def dyadic(self, fa: pr.Pair, fb: pr.Pair) -> pr.Pair:
        """(B, 2, nb, n) x (B, 2, nb, n) -> (B, 3, nb, n) Karatsuba."""
        pb, n = self.pb, self.n
        B = fa[0].shape[0]
        nb = pb.nb
        ins = [tuple(x.reshape(B, 2 * nb, n) for x in fa),
               tuple(x.reshape(B, 2 * nb, n) for x in fb)]
        lo, hi = self._launch(self._dyadic_kern, ins, 3 * nb)
        return lo.reshape(B, 3, nb, n), hi.reshape(B, 3, nb, n)

    # ------------------------------------------------------------------
    # mul_core() part 2: FastFloor + Shenoy-Kumaresan (coeff domain)
    # ------------------------------------------------------------------
    @functools.cached_property
    def _floor_sk_kern(self):
        pb = self.pb
        k, nb = pb.k, pb.nb
        nbsk = nb - k
        nB = pb.nB
        q = [_sc(pb.q_mods, i) for i in range(k)]
        mu_q = [_u32(pb.mu_q32[i]) for i in range(k)]
        bskc = [_sc(pb.bsk, j) for j in range(nbsk)]
        mu_b = [_u32(pb.mu_bsk32[j]) for j in range(nbsk)]
        qhb_w, qhb_s = pb.q_hat_mod_bsk
        iqb = [_sc_shoup(pb.inv_q_mod_bsk, j) for j in range(nbsk)]
        bhi = [_sc_shoup(pb.b_hat_inv, j) for j in range(nB)]
        bhm_w, bhm_s = pb.b_hat_mod_msk          # (nB, 1)
        msk = _sc(pb.msk, 0)
        mu_msk = _u32(pb.mu_msk32[0])
        ipb = (_sc(pb.inv_prod_B_mod_msk[0], 0),
               _sc(pb.inv_prod_B_mod_msk[1], 0))
        bhq_w, bhq_s = pb.b_hat_mod_q            # (k, nB)
        msk_half = _sc(pb.msk_half_p1, 0)
        pbq = [_sc_shoup(pb.prod_B_mod_q, i) for i in range(k)]
        steps = pb.steps_msk_mod_q

        def kern(tlo_ref, thi_ref, olo_ref, ohi_ref):
            y = [(tlo_ref[:, i, :], thi_ref[:, i, :]) for i in range(k)]
            # FastFloor: conv = FastBconv(y) over Bsk; floor = (x-conv)/q
            fl = []
            for j in range(nbsk):
                acc = None
                for i in range(k):
                    t = pr.mulmod_shoup(
                        y[i],
                        (_u32(qhb_w[0][j, i]),
                         _u32(qhb_w[1][j, i])),
                        (_u32(qhb_s[0][j, i]),
                         _u32(qhb_s[1][j, i])),
                        bskc[j], lazy=True)
                    acc = t if acc is None else pr.add_pair(acc, t)
                conv = pr.barrett(acc, mu_b[j], bskc[j], x_max_bits=44)
                num = _submod_s((tlo_ref[:, k + j, :],
                                 thi_ref[:, k + j, :]), conv, bskc[j])
                fl.append(pr.mulmod_shoup(num, *iqb[j], bskc[j]))
            # Shenoy-Kumaresan exact Bsk -> q
            y2 = [pr.mulmod_shoup(fl[j], *bhi[j], bskc[j])
                  for j in range(nB)]
            x_msk = fl[nB]
            acc = None
            for j in range(nB):
                t = pr.mulmod_shoup(
                    y2[j],
                    (np.uint32(bhm_w[0][j, 0]), np.uint32(bhm_w[1][j, 0])),
                    (np.uint32(bhm_s[0][j, 0]), np.uint32(bhm_s[1][j, 0])),
                    msk, lazy=True)
                acc = t if acc is None else pr.add_pair(acc, t)
            accm = pr.barrett(acc, mu_msk, msk, x_max_bits=44)
            alpha = pr.mulmod_shoup(_submod_s(accm, x_msk, msk),
                                    ipb[0], ipb[1], msk)
            big = (alpha[1] > msk_half[1]) | ((alpha[1] == msk_half[1])
                                              & (alpha[0] >= msk_half[0]))
            m_minus_a = pr.sub_pair(msk, alpha)
            for i in range(k):
                acc = None
                for j in range(nB):
                    t = pr.mulmod_shoup(
                        y2[j],
                        (_u32(bhq_w[0][i, j]),
                         _u32(bhq_w[1][i, j])),
                        (_u32(bhq_s[0][i, j]),
                         _u32(bhq_s[1][i, j])),
                        q[i], lazy=True)
                    acc = t if acc is None else pr.add_pair(acc, t)
                accq = pr.barrett(acc, mu_q[i], q[i], x_max_bits=44)
                # alpha centering (behz_pair.fastbconv_sk): negmod of the
                # reduced (msk - alpha), i.e. q - x unless x == 0
                neg_in = _csub_reduce_s(m_minus_a, q[i], steps)
                z = (neg_in[0] | neg_in[1]) == 0
                d = pr.sub_pair(q[i], neg_in)
                neg = (jnp.where(z, neg_in[0], d[0]),
                       jnp.where(z, neg_in[1], d[1]))
                pos = _csub_reduce_s(alpha, q[i], steps)
                am = (jnp.where(big, neg[0], pos[0]),
                      jnp.where(big, neg[1], pos[1]))
                corr = pr.mulmod_shoup(am, *pbq[i], q[i])
                o = _submod_s(accq, corr, q[i])
                olo_ref[:, i, :] = o[0]
                ohi_ref[:, i, :] = o[1]
        return kern

    def floor_sk(self, tq: pr.Pair) -> pr.Pair:
        """(B, 3, nb, n) scaled tensor -> (B, 3, k, n) (behz tail)."""
        pb, n = self.pb, self.n
        B = tq[0].shape[0]
        ins = [tuple(x.reshape(B * 3, pb.nb, n) for x in tq)]
        lo, hi = self._launch(self._floor_sk_kern, ins, pb.k)
        return lo.reshape(B, 3, pb.k, n), hi.reshape(B, 3, pb.k, n)

    # ------------------------------------------------------------------
    # relinearize() part 1: key inner product (NTT domain)
    # ------------------------------------------------------------------
    @functools.cached_property
    def _relin_dot_kern(self):
        pb = self.pb
        k, k_key = pb.k, pb.k_key
        tpk = pb.tp_key
        mods = [_sc(tpk.p, l) for l in range(k_key)]
        mus = [_u32(tpk.mu[l]) for l in range(k_key)]
        c64s = [_sc(tpk.c64, l) for l in range(k_key)]

        def kern(dlo_ref, dhi_ref, rlo_ref, rhi_ref, olo_ref, ohi_ref):
            # d: (tb, k*k_key, n); rk: (1, k*2*k_key, n); out (tb, 2*k_key)
            for comp in range(2):
                for l in range(k_key):
                    p, mu, c64 = mods[l], mus[l], c64s[l]
                    acc = None
                    for j in range(k):
                        d = (dlo_ref[:, j * k_key + l, :],
                             dhi_ref[:, j * k_key + l, :])
                        r = (rlo_ref[:, (j * 2 + comp) * k_key + l, :],
                             rhi_ref[:, (j * 2 + comp) * k_key + l, :])
                        t = pr.mulmod(d, r, p, mu, c64, lazy=True)
                        acc = t if acc is None else pr.add_pair(acc, t)
                    o = pr.barrett(acc, mu, p, x_max_bits=44)
                    olo_ref[:, comp * k_key + l, :] = o[0]
                    ohi_ref[:, comp * k_key + l, :] = o[1]
        return kern

    def relin_dot(self, d_ntt: pr.Pair, rk: pr.Pair) -> pr.Pair:
        """(B, k, k_key, n) digits x (k, 2, k_key, n) key -> (B, 2, k_key, n)."""
        pb, n = self.pb, self.n
        k, k_key = pb.k, pb.k_key
        B = d_ntt[0].shape[0]
        tb = self.tb
        din = tuple(x.reshape(B, k * k_key, n) for x in d_ntt)
        # broadcast rk across the batch tile: pass as a (1, ...) const
        # block replicated by the index map
        rk2 = tuple(x.reshape(1, k * 2 * k_key, n) for x in rk)
        dlo, rows0 = _pad_rows(din[0], tb)
        dhi, _ = _pad_rows(din[1], tb)
        rows_p = dlo.shape[0]
        dspec = pl.BlockSpec((tb, k * k_key, n),
                             lambda bt: (bt, 0 * bt, 0 * bt))
        rspec = pl.BlockSpec((1, k * 2 * k_key, n),
                             lambda bt: (0 * bt, 0 * bt, 0 * bt))
        ospec = pl.BlockSpec((tb, 2 * k_key, n),
                             lambda bt: (bt, 0 * bt, 0 * bt))
        out = pl.pallas_call(
            self._relin_dot_kern,
            grid=(rows_p // tb,),
            in_specs=[dspec, dspec, rspec, rspec],
            out_specs=[ospec, ospec],
            out_shape=[jax.ShapeDtypeStruct((rows_p, 2 * k_key, n),
                                            jnp.uint32)] * 2,
            interpret=self.interpret,
            compiler_params=_VMEM,
        )(dlo, dhi, *rk2)
        return (out[0][:rows0].reshape(B, 2, k_key, n),
                out[1][:rows0].reshape(B, 2, k_key, n))

    # ------------------------------------------------------------------
    # relinearize() part 2: special-prime division + add (coeff domain)
    # ------------------------------------------------------------------
    @functools.cached_property
    def _mod_down_kern(self):
        pb = self.pb
        k, k_key = pb.k, pb.k_key
        q = [_sc(pb.q_mods, i) for i in range(k)]
        P = _sc(pb.P, 0)
        P_half = _sc(pb.P_half, 0)
        hq = [_sc(pb.half_mod_q, i) for i in range(k)]
        ipq = [_sc_shoup(pb.inv_P_mod_q, i) for i in range(k)]
        steps = pb.steps_P_mod_q

        def kern(alo_ref, ahi_ref, clo_ref, chi_ref, olo_ref, ohi_ref):
            # a: (tb, 2*k_key, n) keyswitch output; c: (tb, 2*k, n) ct01
            for comp in range(2):
                xP = (alo_ref[:, comp * k_key + k_key - 1, :],
                      ahi_ref[:, comp * k_key + k_key - 1, :])
                xP_half = _csub_s(pr.add_pair(xP, P_half), P)
                for i in range(k):
                    corr = _submod_s(_csub_reduce_s(xP_half, q[i], steps),
                                     hq[i], q[i])
                    acc_i = (alo_ref[:, comp * k_key + i, :],
                             ahi_ref[:, comp * k_key + i, :])
                    ti = _submod_s(acc_i, corr, q[i])
                    res = pr.mulmod_shoup(ti, *ipq[i], q[i])
                    ct = (clo_ref[:, comp * k + i, :],
                          chi_ref[:, comp * k + i, :])
                    o = _csub_s(pr.add_pair(ct, res), q[i])
                    olo_ref[:, comp * k + i, :] = o[0]
                    ohi_ref[:, comp * k + i, :] = o[1]
        return kern

    def mod_down(self, acc: pr.Pair, ct01: pr.Pair) -> pr.Pair:
        """(B, 2, k_key, n) + (B, 2, k, n) -> (B, 2, k, n)."""
        pb, n = self.pb, self.n
        k, k_key = pb.k, pb.k_key
        B = acc[0].shape[0]
        ins = [tuple(x.reshape(B, 2 * k_key, n) for x in acc),
               tuple(x.reshape(B, 2 * k, n) for x in ct01)]
        lo, hi = self._launch(self._mod_down_kern, ins, 2 * k)
        return lo.reshape(B, 2, k, n), hi.reshape(B, 2, k, n)
