"""BEHZ multiply + relinearization pipeline on u32-pair residues.

Pair-arithmetic port of the hot half of ``ops/engine.py`` (the BEHZ
multiply tail, Shenoy-Kumaresan conversion and SEAL-convention keyswitch
-- reference capability: SEAL Evaluator, SURVEY.md section 2.2).  All
elementwise modular work uses ``ops/pair.py`` primitives (~2x fewer native
VPU ops than the XLA-emulated u64 versions) with lazy accumulation where
the documented bounds allow:

  * FastBconv limb contractions accumulate 3p-lazy Shoup products raw and
    Barrett-reduce once per target (bounds: k terms * 3p < 2**41).
  * The relin inner product accumulates 2p-lazy general products over the
    decomposition digits, one Barrett per component.
  * The m_tilde (2**16) row of the base extension never touches Barrett:
    power-of-two modulus = low-word mask arithmetic.

Constants are SPLIT from an existing ``JaxEngine`` instance (same derived
values, zero duplicated math); bit-exactness vs the golden model is
asserted by tests/test_jax_engine.py over the "pair" backend.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import pair as pr
from .ntt_pair import PairNttTables, intt_pair, ntt_pair

Pair = pr.Pair


def _split_shoup(ws_tuple):
    """Engine (w, ws) u64 host arrays -> ((w_lo,w_hi), (ws_lo,ws_hi))."""
    w, ws = ws_tuple
    return pr.split64(np.asarray(w)), pr.split64(np.asarray(ws))


def _ix(a: Pair, sl) -> Pair:
    return a[0][sl], a[1][sl]


def _stack(parts, axis) -> Pair:
    return (jnp.stack([x[0] for x in parts], axis=axis),
            jnp.stack([x[1] for x in parts], axis=axis))


def _concat(parts, axis) -> Pair:
    return (jnp.concatenate([x[0] for x in parts], axis=axis),
            jnp.concatenate([x[1] for x in parts], axis=axis))


def _where(cond, a: Pair, b: Pair) -> Pair:
    return jnp.where(cond, a[0], b[0]), jnp.where(cond, a[1], b[1])


class PairBehz:
    """Pair-form kernels sharing a JaxEngine's derived constants."""

    def __init__(self, eng, tp_q: PairNttTables, tp_all: PairNttTables,
                 tp_all_t: PairNttTables, tp_key: PairNttTables):
        g = eng.golden
        self.k, self.nB, self.nb = eng.k, eng.nB, eng.nb
        self.k_key = eng.k_key
        self.tp_q, self.tp_all, self.tp_all_t = tp_q, tp_all, tp_all_t
        self.tp_key = tp_key
        self.radix_log2 = getattr(eng, "pair_radix_log2", 2)
        # False restores the broadcast (..., nt, k, n) contraction for
        # interleaved A/B against the per-source-limb loop (tools/ab_bench)
        self.loop_contraction = getattr(eng, "pair_loop_contraction", True)
        # "pallas" routes the inter-NTT tail segments through the fused
        # VMEM kernels of ops/pallas_tail.py (XLA splits the giant
        # elementwise pair-arithmetic chains into multiple HBM passes;
        # the kernels do one read + one write per tensor).  Bit-exact.
        self.tail = None
        tail_mode = getattr(eng, "pair_tail", "xla")
        if tail_mode in ("pallas", "pallas-interpret"):
            from .pallas_tail import PairTailPallas
            self.tail = PairTailPallas(
                self, eng.n, interpret=(tail_mode == "pallas-interpret"))

        self.q_mods = pr.split64(np.asarray(eng.q_mods))      # (k, 1)
        self.mu_q32 = pr.mu32(np.asarray(eng.q_mods))
        self.c64_q = pr.split64(np.array(
            [[(1 << 64) % int(p)] for p in g.q_mods], dtype=np.uint64))
        self.bsk = pr.split64(np.asarray(eng.bsk))            # (nBsk, 1)
        self.mu_bsk32 = pr.mu32(np.asarray(eng.bsk))
        self.b_mods = pr.split64(np.asarray(eng.b_mods))      # (nB, 1)
        self.key_mods = pr.split64(np.asarray(eng.key_mods))  # (k_key, 1)
        self.mu_key32 = pr.mu32(np.asarray(eng.key_mods))
        self.c64_key = pr.split64(np.array(
            [[(1 << 64) % int(p)] for p in g.key_mods], dtype=np.uint64))

        self.mt = int(eng.m_tilde)          # power of two
        self.mt_mask = np.uint32(self.mt - 1)
        self.neg_inv_q_mod_mt = np.uint32(eng.neg_inv_q_mod_mt)
        self.msk = pr.split64(np.array([[g.m_sk]], dtype=np.uint64))
        self.mu_msk32 = pr.mu32(np.array([[g.m_sk]], dtype=np.uint64))
        self.msk_half_p1 = pr.split64(
            np.array([[g.m_sk // 2 + 1]], dtype=np.uint64))

        # |mt * q_hat_inv|_q as ONE scalar (see to_bsk)
        q_arr = np.array(g.q_mods, dtype=np.uint64).reshape(-1, 1)
        mtqh = np.array(
            [int(g.mtilde_mod_q[i]) * int(g.q_hat_inv[i]) % int(p)
             for i, p in enumerate(g.q_mods)],
            dtype=np.uint64).reshape(-1, 1)
        from .modmath import shoup_precompute as _sp
        self.mt_qhinv = (pr.split64(mtqh), pr.split64(_sp(mtqh, q_arr)))
        # q_hat_mod_x over Bsk+[mt]: split the Bsk rows / keep the mt row
        # as plain u32 scalars for the mask path
        qhm_w, qhm_ws = (np.asarray(x) for x in eng.q_hat_mod_x)
        self.q_hat_mod_bsk = (pr.split64(qhm_w[:-1]), pr.split64(qhm_ws[:-1]))
        self.q_hat_mod_mt = qhm_w[-1].astype(np.uint32)       # (k, 1) < 2**16
        self.q_mod_bsk = _split_shoup(eng.q_mod_bsk)
        self.inv_mt_mod_bsk = _split_shoup(eng.inv_mt_mod_bsk)
        self.inv_q_mod_bsk = _split_shoup(eng.inv_q_mod_bsk)
        self.b_hat_inv = _split_shoup(eng.b_hat_inv)
        self.b_hat_mod_msk = _split_shoup(eng.b_hat_mod_msk)
        self.inv_prod_B_mod_msk = _split_shoup(eng.inv_prod_B_mod_msk)
        self.b_hat_mod_q = _split_shoup(eng.b_hat_mod_q)
        self.prod_B_mod_q = _split_shoup(eng.prod_B_mod_q)

        if eng.params.special_modulus is not None:
            self.P = pr.split64(np.array([[eng.P]], dtype=np.uint64))
            self.P_half = pr.split64(np.array([[eng.P >> 1]],
                                              dtype=np.uint64))
            self.half_mod_q = pr.split64(np.asarray(eng.half_mod_q))
            self.inv_P_mod_q = _split_shoup(eng.inv_P_mod_q)
            self.steps_P_mod_q = eng.steps_P_mod_q
        self.steps_ct_mod_key = eng.steps_ct_mod_key
        self.steps_msk_mod_q = eng.steps_msk_mod_q
        self.steps_t_mod_q = eng.steps_t_mod_q

    # ------------------------------------------------------------------
    # base conversions
    # ------------------------------------------------------------------
    def _fastbconv(self, y: Pair, targets, target_mods: Pair, mu32,
                   n_terms: int) -> Pair:
        """sum_i y_i * w[target, i] mod target, lazy-accumulated.

        y: (..., k, n) pair, already scaled by q_hat_inv (canonical).
        targets: ((nt, k, 1) w pair, ws pair); returns (..., nt, n).

        Accumulates per SOURCE limb i: each (..., nt, n) term is consumed
        by the running sum immediately, so XLA fuses the whole contraction
        into one kernel instead of materializing a (..., nt, k, n)
        broadcast tensor (measured: the op is HBM-bound; the big
        intermediate was one of the largest buffers in the mul_relin HLO).
        Identical residues: the lazy adds are exact integer adds, so the
        accumulation order cannot change the result.
        """
        w, ws = targets
        if not self.loop_contraction:     # A/B reference formulation
            yb = _ix(y, np.s_[..., None, :, :])
            tm = _ix(target_mods, np.s_[..., None, :])
            terms = pr.mulmod_shoup(yb, w, ws, tm, lazy=True)
            acc = _ix(terms, np.s_[..., 0, :])
            for i in range(1, n_terms):
                acc = pr.add_pair(acc, _ix(terms, np.s_[..., i, :]))
            return pr.barrett(acc, mu32, target_mods, x_max_bits=44)
        acc = None
        for i in range(n_terms):
            yi = _ix(y, np.s_[..., i:i + 1, :])               # (..., 1, n)
            term = pr.mulmod_shoup(yi, _ix(w, np.s_[:, i]),
                                   _ix(ws, np.s_[:, i]),
                                   target_mods, lazy=True)    # each < 3p
            acc = term if acc is None else pr.add_pair(acc, term)
        # bound: n_terms * 3p < 2**(39 + log2(n_terms)) -- comfortably < 2**44
        return pr.barrett(acc, mu32, target_mods, x_max_bits=44)

    def to_bsk(self, poly_q: Pair) -> Pair:
        """BEHZ steps 1-2 (engine._to_bsk): (..., k, n) -> (..., nBsk, n).

        The m_tilde pre-scale and the FastBconv q_hat_inv scalar compose
        into ONE per-limb Shoup constant (|x*mt*qhinv|_q == ||x*mt|_q *
        qhinv|_q), halving the scalar-multiply passes."""
        y = pr.mulmod_shoup(poly_q, *self.mt_qhinv, self.q_mods)
        c_bsk = self._fastbconv(y, self.q_hat_mod_bsk, self.bsk,
                                self.mu_bsk32, self.k)
        # m_tilde row: power-of-two modulus, low-word mask arithmetic
        acc_mt = (y[0][..., 0, :] & self.mt_mask) * self.q_hat_mod_mt[0, 0]
        for i in range(1, self.k):
            acc_mt = acc_mt + (y[0][..., i, :] & self.mt_mask) \
                * self.q_hat_mod_mt[i, 0]
        c_mt = acc_mt & self.mt_mask
        r = (c_mt * self.neg_inv_q_mod_mt) & self.mt_mask
        big = r > np.uint32(self.mt // 2)
        mt_minus_r = (np.uint32(self.mt) - r, jnp.zeros_like(r))
        rm = _where(big[..., None, :],
                    pr.sub_pair(self.bsk, _ix(mt_minus_r,
                                              np.s_[..., None, :])),
                    _ix((r, jnp.zeros_like(r)), np.s_[..., None, :]))
        num = pr.addmod(c_bsk,
                        pr.mulmod_shoup(rm, *self.q_mod_bsk, self.bsk),
                        self.bsk)
        return pr.mulmod_shoup(num, *self.inv_mt_mod_bsk, self.bsk)

    def fastbconv_sk(self, poly_bsk: Pair) -> Pair:
        """Shenoy-Kumaresan exact Bsk -> q (engine._fastbconv_sk)."""
        nB = self.nB
        xB = _ix(poly_bsk, np.s_[..., :nB, :])
        x_msk = _ix(poly_bsk, np.s_[..., nB, :])
        y = pr.mulmod_shoup(xB, *self.b_hat_inv, self.b_mods)
        # alpha via m_sk (scalar modulus; no extra target axis)
        w, ws = self.b_hat_mod_msk
        terms = pr.mulmod_shoup(y, w, ws, self.msk, lazy=True)
        acc = _ix(terms, np.s_[..., 0, :])
        for i in range(1, nB):
            acc = pr.add_pair(acc, _ix(terms, np.s_[..., i, :]))
        acc = pr.barrett(acc, self.mu_msk32[0, 0],
                         (self.msk[0][0, 0], self.msk[1][0, 0]),
                         x_max_bits=44)
        alpha = pr.mulmod_shoup(
            pr.submod(acc, x_msk, (self.msk[0][0, 0], self.msk[1][0, 0])),
            (self.inv_prod_B_mod_msk[0][0][0, 0],
             self.inv_prod_B_mod_msk[0][1][0, 0]),
            (self.inv_prod_B_mod_msk[1][0][0, 0],
             self.inv_prod_B_mod_msk[1][1][0, 0]),
            (self.msk[0][0, 0], self.msk[1][0, 0]))
        accq = self._fastbconv(y, self.b_hat_mod_q, self.q_mods,
                               self.mu_q32, nB)
        a_b = _ix(alpha, np.s_[..., None, :])
        big = pr.ge_pair(a_b, (self.msk_half_p1[0][0, 0],
                               self.msk_half_p1[1][0, 0]))
        neg_part = pr.negmod(
            pr.csub_reduce(pr.sub_pair((self.msk[0][0, 0],
                                        self.msk[1][0, 0]), a_b),
                           self.q_mods, self.steps_msk_mod_q),
            self.q_mods)
        pos_part = pr.csub_reduce(a_b, self.q_mods, self.steps_msk_mod_q)
        am = _where(big, neg_part, pos_part)
        corr = pr.mulmod_shoup(am, *self.prod_B_mod_q, self.q_mods)
        return pr.submod(accq, corr, self.q_mods)

    # ------------------------------------------------------------------
    # multiply pipeline
    # ------------------------------------------------------------------
    def mul_plain(self, ct: Pair, m: Pair) -> Pair:
        """(B, 2, k, n) ct x (B, n) mod-t plain (engine._mul_plain)."""
        tp = self.tp_q
        m_rns = pr.csub_reduce(_ix(m, np.s_[..., None, :]), self.q_mods,
                               self.steps_t_mod_q)
        m_ntt = ntt_pair(m_rns, tp, self.radix_log2)
        c_ntt = ntt_pair(ct, tp, self.radix_log2)
        out = pr.mulmod(c_ntt, _ix(m_ntt, np.s_[..., None, :, :]),
                        tp.p, tp.mu, tp.c64)
        return intt_pair(out, tp, self.radix_log2)

    def prepare(self, a: Pair) -> Pair:
        """(B, 2, k, n) ct -> (B, 2, nb, n) NTT-domain extended operand."""
        if self.tail is not None:
            ea = self.tail.to_bsk_ext(a)
        else:
            ea = _concat([a, self.to_bsk(a)], axis=-2)
        return ntt_pair(ea, self.tp_all, self.radix_log2)

    def mul_core(self, fa: Pair, fb: Pair) -> Pair:
        """Prepared x prepared -> (B, 3, k, n) scaled tensor (BEHZ tail)."""
        k = self.k
        tp = self.tp_all
        pa, mua, c64a = tp.p, tp.mu, tp.c64
        if self.tail is not None:
            stacked = self.tail.dyadic(fa, fb)
        else:
            fa0, fa1 = _ix(fa, np.s_[:, 0]), _ix(fa, np.s_[:, 1])
            fb0, fb1 = _ix(fb, np.s_[:, 0]), _ix(fb, np.s_[:, 1])
            # Karatsuba over the 2x2 tensor: 3 general modmuls not 4
            t0 = pr.mulmod(fa0, fb0, pa, mua, c64a)
            t2 = pr.mulmod(fa1, fb1, pa, mua, c64a)
            cross = pr.mulmod(pr.addmod(fa0, fa1, pa),
                              pr.addmod(fb0, fb1, pa), pa, mua, c64a)
            t1 = pr.submod(pr.submod(cross, t0, pa), t2, pa)
            stacked = _stack([t0, t1, t2], axis=1)
        # t-scale AND (ct limbs) q_hat_inv folded into the inverse n^-1
        # twiddles (engine tp_all_t): tq[:, :k] IS y, no separate pass
        tq = intt_pair(stacked, self.tp_all_t, self.radix_log2)
        if self.tail is not None:
            return self.tail.floor_sk(tq)
        y = _ix(tq, np.s_[..., :k, :])
        conv = self._fastbconv(y, self.q_hat_mod_bsk, self.bsk,
                               self.mu_bsk32, k)
        num = pr.submod(_ix(tq, np.s_[..., k:, :]), conv, self.bsk)
        floor_bsk = pr.mulmod_shoup(num, *self.inv_q_mod_bsk, self.bsk)
        return self.fastbconv_sk(floor_bsk)

    def relinearize(self, ct3: Pair, rk: Pair,
                    rk_ws: Pair | None = None) -> Pair:
        """(B, 3, k, n) + rk (k, 2, k_key, n) -> (B, 2, k, n).

        rk_ws (optional): floor(rk * 2**64 / p_key) precomputed host-side
        once per relin key (JaxEngine.relin_shoup).  With it, each inner-
        product term is a Shoup multiply (20 native muls, lazy < 3p)
        instead of a general Barrett modmul (25 muls, lazy < 2p) -- a 20%
        arithmetic cut on the relin dot at identical results (both are
        exact |d*rk|_p composed through the same lazy accumulation)."""
        k, k_key = self.k, self.k_key
        c2 = _ix(ct3, np.s_[:, 2])
        d = pr.csub_reduce(_ix(c2, np.s_[:, :, None, :]), self.key_mods,
                           self.steps_ct_mod_key)
        d_ntt = ntt_pair(d, self.tp_key, self.radix_log2)
        tpk = self.tp_key
        if self.tail is not None:
            acc_ntt = self.tail.relin_dot(d_ntt, rk)
        elif rk_ws is not None:
            accs = []
            for comp in range(2):
                acc = pr.mulmod_shoup(_ix(d_ntt, np.s_[:, 0]),
                                      _ix(rk, np.s_[0, comp]),
                                      _ix(rk_ws, np.s_[0, comp]),
                                      tpk.p, lazy=True)
                for j in range(1, k):
                    acc = pr.add_pair(acc, pr.mulmod_shoup(
                        _ix(d_ntt, np.s_[:, j]), _ix(rk, np.s_[j, comp]),
                        _ix(rk_ws, np.s_[j, comp]), tpk.p, lazy=True))
                # k lazy 3p-products: sum < 3*k*p < 2**41
                accs.append(pr.barrett(acc, tpk.mu, tpk.p, x_max_bits=44))
            acc_ntt = _stack(accs, axis=1)
        else:
            accs = []
            for comp in range(2):
                acc = pr.mulmod(_ix(d_ntt, np.s_[:, 0]),
                                _ix(rk, np.s_[0, comp]),
                                tpk.p, tpk.mu, tpk.c64, lazy=True)
                for j in range(1, k):
                    acc = pr.add_pair(acc, pr.mulmod(
                        _ix(d_ntt, np.s_[:, j]), _ix(rk, np.s_[j, comp]),
                        tpk.p, tpk.mu, tpk.c64, lazy=True))
                # k lazy 2p-products: sum < 2*k*p < 2**44
                accs.append(pr.barrett(acc, tpk.mu, tpk.p, x_max_bits=44))
            acc_ntt = _stack(accs, axis=1)
        acc = intt_pair(acc_ntt, self.tp_key, self.radix_log2)
        if self.tail is not None:
            return self.tail.mod_down(acc, _ix(ct3, np.s_[:, :2]))
        # divide by the special prime with rounding
        xP = _ix(acc, np.s_[..., k_key - 1, :])
        P_scalar = (self.P[0][0, 0], self.P[1][0, 0])
        xP_half = pr.addmod(xP, (self.P_half[0][0, 0], self.P_half[1][0, 0]),
                            P_scalar)
        corr = pr.submod(
            pr.csub_reduce(_ix(xP_half, np.s_[..., None, :]), self.q_mods,
                           self.steps_P_mod_q),
            self.half_mod_q, self.q_mods)
        ti = pr.submod(_ix(acc, np.s_[..., :k, :]), corr, self.q_mods)
        res = pr.mulmod_shoup(ti, *self.inv_P_mod_q, self.q_mods)
        return pr.addmod(_ix(ct3, np.s_[:, :2]), res, self.q_mods)
