"""JaxEngine: batched BFV operations as jitted XLA programs.

TPU-native replacement for SEAL's Evaluator (SURVEY.md section 2.2): every op
runs over stacked tensors shaped (batch, ..., L, n) where L is an RNS-limb
axis, so one fused elementwise program covers all limbs of a whole batch of
ciphertexts.  Division-free arithmetic (Barrett/Shoup) throughout.

Bit-exactness: each method reproduces ``bfv/golden.py`` arrays exactly
(asserted by tests/test_jax_engine.py); CPU and TPU validators therefore stay
in byte-level consensus.

Layouts:
  ct batch   uint64 (B, size, k, n)      coefficient form
  pk         uint64 (2, k_key, n)        NTT form
  relin keys uint64 (k, 2, k_key, n)     NTT form
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..bfv.golden import BfvContext, Ciphertext, PublicKey, RelinKeys
from ..params import Params
from ..sampling import (Blake2Xof, DOMAIN_ERROR, DOMAIN_TERNARY, sample_cbd,
                        sample_ternary)
from .modmath import (addmod, barrett_mu, csub_reduce, mulmod,
                      mulmod_shoup, negmod, shoup_precompute, submod)
from .ntt import build_tables, intt, ntt


def _const(x) -> np.ndarray:
    """Engine constants stay HOST-side numpy: XLA embeds them at compile time.

    (Device-resident closure constants would be fetched back to host during
    jit lowering -- pathological over a remote-TPU tunnel.)
    """
    return np.asarray(x, dtype=np.uint64)


def pad_rows(x: jnp.ndarray, target: int) -> jnp.ndarray:
    """Pad the leading (batch) axis to `target` by repeating row 0 ON
    DEVICE.  Batch bucketing (parallel/stream.bucket_batch) fixes jit
    shapes; doing the padding after host->device transfer keeps the
    transferred bytes at the real batch size -- on tunnel/PCIe-attached
    hosts the padded copies would otherwise ride the wire for nothing.
    Pad rows are garbage-in-garbage-out and trimmed by callers."""
    b = x.shape[0]
    if b == target:
        return x
    fill = jnp.broadcast_to(x[:1], (target - b,) + x.shape[1:])
    return jnp.concatenate([x, fill], axis=0)


def _scalar_shoup(values, mods):
    """(w, w_shoup) device pairs for per-limb scalar constants."""
    w = np.asarray(values, dtype=np.uint64)
    ws = shoup_precompute(w, np.asarray(mods, dtype=np.uint64))
    return _const(w), _const(ws)


class JaxEngine:
    """All BFV ops as jitted, batch-stacked XLA programs for one param set."""

    def __init__(self, params: Params, golden: Optional[BfvContext] = None,
                 ntt_backend: str = "auto", pair_shoup_bits: int = 40,
                 pair_radix_log2: int = 2, pair_tail: str = "auto"):
        """ntt_backend: "auto" (platform-based selection), "pair" (u32-pair
        arithmetic end-to-end: pair stage NTT + pair BEHZ/relin kernels,
        ops/{pair,ntt_pair,behz_pair}.py), "stage" (u64 fused XLA butterfly
        stages) or "pallas" (fused MXU four-step kernels; TPU-only).  All
        backends are bit-identical.

        "auto" resolves per platform: "pair" on TPU (no native u64 there --
        the hand-specialized p<2**37 pair arithmetic beats XLA's generic
        u64 emulation by ~1.2x end-to-end, measured interleaved on v5e),
        "stage" elsewhere (CPU has real u64 registers, emulating them in
        u32 pairs would be a loss).  The Pallas/MXU formulation stays a
        measured negative result (benchmarks/RESULTS.md roofline notes).

        pair_tail: "xla" (default via "auto") keeps the BEHZ tail as XLA
        elementwise programs; "pallas" routes the inter-NTT segments
        through the fused VMEM kernels of ops/pallas_tail.py (bit-exact;
        "pallas-interpret" is the CPU test mode).
        """
        if ntt_backend == "auto":
            import jax as _jax
            g0 = golden if golden is not None else BfvContext(params)
            golden = g0
            # single-word Barrett mu requires every pair-path modulus
            # above 2**32 (true for testnet/n8192; the n=1024 bench preset
            # uses a small single modulus -> u64 stage path there)
            pair_ok = min(g0.q_mods + g0.Bsk + g0.key_mods + [g0.m_sk]
                          ) > (1 << 32)
            ntt_backend = ("pair" if pair_ok
                           and _jax.default_backend() == "tpu" else "stage")
        self.params = params
        self.pair_radix_log2 = pair_radix_log2
        if pair_tail == "auto":
            # "pallas" = fused VMEM tail kernels (ops/pallas_tail.py).
            # Measured on v5e (tools/ab_bench.py tailpallas, interleaved,
            # bit-exact on device): 0.823x the XLA tail (10,020 vs 12,178
            # mul+relin/s) -- the VMEM-residency bandwidth win is eaten by
            # Mosaic lowering the u32-pair modmuls to full-width products
            # (~1.5x the tail segment time), the same penalty that closed
            # the Pallas NTT.  Auto therefore stays "xla"; the kernels are
            # kept as an opt-in measured negative with tests.
            pair_tail = "xla"
        self.pair_tail = pair_tail
        g = golden if golden is not None else BfvContext(params)
        self.golden = g
        n, k, k_key = g.n, g.k, g.k_key
        self.n, self.k, self.k_key = n, k, k_key
        self.nb = k + len(g.Bsk)

        # NTT tables per base stack
        self.tb_q = build_tables(g.q_mods, n)
        self.tb_all = build_tables(g.q_mods + g.Bsk, n)
        self.tb_key = build_tables(g.key_mods, n)
        if ntt_backend == "stage":
            from .ntt import scale_n_inv
            # INTT that also multiplies by t: the FastFloor pre-scale
            # (tq = t * prod) folded into the inverse transform's n^-1
            # twiddle -- saves one full general-modmul pass over the
            # (B, 3, nb, n) product tensor, bit-exactly.
            tb_all_t = scale_n_inv(self.tb_all,
                                   [params.t] * len(self.tb_all.p))
            self._ntt_q = lambda x: ntt(x, self.tb_q)
            self._intt_q = lambda x: intt(x, self.tb_q)
            self._ntt_all = lambda x: ntt(x, self.tb_all)
            self._intt_all = lambda x: intt(x, self.tb_all)
            self._intt_all_tscaled = lambda x: intt(x, tb_all_t)
            self._ntt_key = lambda x: ntt(x, self.tb_key)
            self._intt_key = lambda x: intt(x, self.tb_key)
        elif ntt_backend == "pair":
            from .ntt_pair import build_pair_tables, intt_pair, ntt_pair
            from .pair import from_pair, to_pair
            sb = pair_shoup_bits
            tp_q = build_pair_tables(g.q_mods, n, shoup_bits=sb)
            tp_all = build_pair_tables(g.q_mods + g.Bsk, n, shoup_bits=sb)
            # mul_core's inverse transform folds BOTH the FastFloor
            # pre-scale t AND (for the ct limbs) the FastBconv q_hat_inv
            # scalar into n^-1 -- tq[:, :k] comes out as y directly and
            # the separate (B, 3, k, n) Shoup pass disappears
            qh_t = [params.t * int(g.q_hat_inv[i]) % int(p)
                    for i, p in enumerate(g.q_mods)]
            tp_all_t = build_pair_tables(
                g.q_mods + g.Bsk, n,
                n_inv_factors=qh_t + [params.t] * len(g.Bsk),
                shoup_bits=sb)
            tp_key = build_pair_tables(g.key_mods, n, shoup_bits=sb)
            self.pair_tables = {"q": tp_q, "all": tp_all, "key": tp_key,
                                "all_t": tp_all_t}

            rl = pair_radix_log2

            def wrap(fn, tb):
                return lambda x: from_pair(fn(to_pair(x), tb, radix_log2=rl))
            self._ntt_q = wrap(ntt_pair, tp_q)
            self._intt_q = wrap(intt_pair, tp_q)
            self._ntt_all = wrap(ntt_pair, tp_all)
            self._intt_all = wrap(intt_pair, tp_all)
            self._intt_all_tscaled = wrap(intt_pair, tp_all_t)
            self._ntt_key = wrap(ntt_pair, tp_key)
            self._intt_key = wrap(intt_pair, tp_key)
        elif ntt_backend == "pallas":
            from .pallas_ntt import PallasNtt
            pq = PallasNtt(tuple(g.q_mods), n)
            pa = PallasNtt(tuple(g.q_mods + g.Bsk), n)
            pkk = PallasNtt(tuple(g.key_mods), n)
            self._ntt_q, self._intt_q = pq.ntt, pq.intt
            self._ntt_all, self._intt_all = pa.ntt, pa.intt
            self._intt_all_tscaled = None     # falls back to intt + mulmod
            self._ntt_key, self._intt_key = pkk.ntt, pkk.intt
        else:
            raise ValueError(f"unknown ntt_backend {ntt_backend!r}")
        self.ntt_backend = ntt_backend

        self.q_mods = _const(np.array(g.q_mods).reshape(k, 1))
        self.mu_q = _const(barrett_mu(np.array(g.q_mods).reshape(k, 1)))
        self.delta_mod_q = _scalar_shoup(
            g.delta_mod_q.reshape(k, 1), np.array(g.q_mods).reshape(k, 1))
        self.q_mod_t = int(g.q_mod_t)

        # ---- BEHZ constants ------------------------------------------
        bsk_mt = g.Bsk + [g.m_tilde]
        self.bsk = _const(np.array(g.Bsk).reshape(-1, 1))
        self.mu_bsk = _const(barrett_mu(np.array(g.Bsk).reshape(-1, 1)))
        self.bsk_mt_mods = _const(np.array(bsk_mt).reshape(-1, 1))
        self.m_tilde = g.m_tilde
        self.m_sk = g.m_sk

        self.mt_mod_q = _scalar_shoup(
            np.array(g.mtilde_mod_q).reshape(k, 1),
            np.array(g.q_mods).reshape(k, 1))
        self.q_hat_inv = _scalar_shoup(
            np.array(g.q_hat_inv).reshape(k, 1),
            np.array(g.q_mods).reshape(k, 1))
        # q_hat_mod_x for targets Bsk+[mt]: (nt, k) w.r.t. target moduli
        qhm = np.array([[int(g.q_hat[i]) % x for i in range(k)]
                        for x in bsk_mt], dtype=np.uint64)
        tgt = np.array(bsk_mt, dtype=np.uint64).reshape(-1, 1)
        self.q_hat_mod_x = (_const(qhm[..., None]),
                            _const(shoup_precompute(qhm[..., None],
                                                    tgt[:, None])))
        self.neg_inv_q_mod_mt = int(g.neg_inv_q_mod_mtilde)
        self.q_mod_bsk = _scalar_shoup(
            np.array([g.q_mod_x[x] for x in g.Bsk]).reshape(-1, 1),
            np.array(g.Bsk).reshape(-1, 1))
        self.inv_mt_mod_bsk = _scalar_shoup(
            np.array([g.inv_mtilde_mod_x[x] for x in g.Bsk]).reshape(-1, 1),
            np.array(g.Bsk).reshape(-1, 1))
        self.inv_q_mod_bsk = _scalar_shoup(
            np.array([g.inv_q_mod_x[x] for x in g.Bsk]).reshape(-1, 1),
            np.array(g.Bsk).reshape(-1, 1))

        nB = len(g.B)
        self.nB = nB
        self.b_mods = _const(np.array(g.B).reshape(nB, 1))
        self.b_hat_inv = _scalar_shoup(
            np.array(g.b_hat_inv).reshape(nB, 1),
            np.array(g.B).reshape(nB, 1))
        bh_q = np.array([[int(g.b_hat[i]) % p for i in range(nB)]
                         for p in g.q_mods], dtype=np.uint64)
        self.b_hat_mod_q = (_const(bh_q[..., None]),
                            _const(shoup_precompute(
                                bh_q[..., None],
                                np.array(g.q_mods, dtype=np.uint64
                                         ).reshape(-1, 1, 1))))
        bh_msk = np.array([int(h) % g.m_sk for h in g.b_hat], dtype=np.uint64)
        self.b_hat_mod_msk = _scalar_shoup(
            bh_msk.reshape(nB, 1), np.full((nB, 1), g.m_sk, dtype=np.uint64))
        self.inv_prod_B_mod_msk = _scalar_shoup(
            np.array([[g.inv_prod_B_mod_msk]]),
            np.array([[g.m_sk]]))
        self.prod_B_mod_q = _scalar_shoup(
            np.array(g.prod_B_mod_q).reshape(k, 1),
            np.array(g.q_mods).reshape(k, 1))

        # ---- RNS decryption constants (exact CRT scale-and-round) ----
        # Exact multiword rounding (ops/wide.py) replaced the t-gamma
        # approximation: decrypt bytes are part of the consensus contract
        # (fhe.rs:688-699) and must match golden on EVERY wire-valid
        # ciphertext, including attacker-constructed boundary dots
        # (tests/test_decrypt_consensus.py).
        from .wide import ExactScaleRound
        self._exact_round = ExactScaleRound(g.q_mods, params.t)
        self._decrypt_fns: dict = {}

        # ---- keyswitch constants -------------------------------------
        if params.special_modulus is not None:
            self.P = params.special_modulus
            self.key_mods = _const(np.array(g.key_mods).reshape(k_key, 1))
            self.mu_key = _const(barrett_mu(
                np.array(g.key_mods).reshape(k_key, 1)))
            self.half_mod_q = _const(
                np.array([g.P_half % p for p in g.q_mods]).reshape(k, 1))
            self.inv_P_mod_q = _scalar_shoup(
                np.array(g.inv_P_mod_q).reshape(k, 1),
                np.array(g.q_mods).reshape(k, 1))

        # range-bounded reduction step counts (see modmath.csub_reduce):
        # inputs provably < bound are reduced with `steps` conditional
        # subtracts instead of a Barrett pass
        max_ct = max(g.q_mods) - 1
        self.steps_ct_mod_key = max(max_ct // p for p in g.key_mods)
        if params.special_modulus is not None:
            self.steps_P_mod_q = max(
            (params.special_modulus - 1) // p for p in g.q_mods)
        self.steps_msk_mod_q = max((g.m_sk - 1) // p for p in g.q_mods)
        self.steps_t_mod_q = max((params.t - 1) // p for p in g.q_mods)

        # digest-keyed per-relin-key Shoup tables (see relin_shoup)
        self._relin_shoup_cache: dict = {}


    @functools.cached_property
    def _pairk(self):
        """Pair-form BEHZ kernels (ops/behz_pair.py); None off the pair
        backend.  Built lazily so all derived constants above exist."""
        if self.ntt_backend != "pair":
            return None
        from .behz_pair import PairBehz
        t = self.pair_tables
        return PairBehz(self, t["q"], t["all"], t["all_t"], t["key"])

    # ==================================================================
    # elementwise ops
    # ==================================================================
    @functools.cached_property
    def _add(self):
        return jax.jit(lambda a, b: addmod(a, b, self.q_mods))

    @functools.cached_property
    def _sub(self):
        return jax.jit(lambda a, b: submod(a, b, self.q_mods))

    @functools.cached_property
    def _neg(self):
        return jax.jit(lambda a: negmod(a, self.q_mods))

    def _scaled_plain(self, m: jnp.ndarray) -> jnp.ndarray:
        """round(q*m/t) per limb: (..., n) plain -> (..., k, n).

        Same exact identity as golden._scale_plain: (delta mod q_j)*m + fix.
        """
        t = jnp.uint64(self.params.t)
        fix = (jnp.uint64(self.q_mod_t) * m + t // jnp.uint64(2)) // t
        term = mulmod_shoup(m[..., None, :], *self.delta_mod_q, self.q_mods)
        return addmod(term, fix[..., None, :], self.q_mods)

    @functools.cached_property
    def _add_plain(self):
        def f(ct, m):
            dm = self._scaled_plain(m)
            return ct.at[..., 0, :, :].set(
                addmod(ct[..., 0, :, :], dm, self.q_mods))
        return jax.jit(f)

    @functools.cached_property
    def _sub_plain(self):
        def f(ct, m):
            dm = self._scaled_plain(m)
            return ct.at[..., 0, :, :].set(
                submod(ct[..., 0, :, :], dm, self.q_mods))
        return jax.jit(f)

    @functools.cached_property
    def _plain_sub(self):
        def f(m, ct):
            out = negmod(ct, self.q_mods)
            dm = self._scaled_plain(m)
            return out.at[..., 0, :, :].set(
                addmod(out[..., 0, :, :], dm, self.q_mods))
        return jax.jit(f)

    @functools.cached_property
    def _mul_plain(self):
        if self._pairk is not None:
            from .pair import from_pair, to_pair
            pb = self._pairk

            def fp(ct, m):
                return from_pair(pb.mul_plain(to_pair(ct), to_pair(m)))
            return jax.jit(fp)

        def f(ct, m):
            # lift plain poly mod each q_j, NTT once, multiply every component
            m_rns = csub_reduce(m[..., None, :], self.q_mods,
                                self.steps_t_mod_q)
            m_ntt = self._ntt_q(m_rns)
            c_ntt = self._ntt_q(ct)
            out = mulmod(c_ntt, m_ntt[..., None, :, :], self.q_mods, self.mu_q)
            return self._intt_q(out)
        return jax.jit(f)

    # ==================================================================
    # BEHZ multiply
    # ==================================================================
    def _fastbconv_q_to(self, poly_q, targets_w, targets_ws, target_mods):
        """FastBconv base q -> targets.  poly_q: (..., k, n).

        targets_w/ws: (nt, k, 1) scalars mod target; target_mods: (nt, 1).
        Returns (..., nt, n).
        """
        y = mulmod_shoup(poly_q, *self.q_hat_inv, self.q_mods)   # (..., k, n)
        yb = y[..., None, :, :]                                   # (..,1,k,n)
        terms = mulmod_shoup(yb, targets_w, targets_ws,
                             target_mods[..., None, :])           # (..,nt,k,n)
        acc = terms[..., 0, :]
        for i in range(1, self.k):
            acc = addmod(acc, terms[..., i, :], target_mods)
        return acc

    def _to_bsk(self, poly_q):
        """BEHZ steps 1-2: lift (..., k, n) base-q residues into Bsk."""
        mt = self.m_tilde
        scaled = mulmod_shoup(poly_q, *self.mt_mod_q, self.q_mods)
        conv = self._fastbconv_q_to(scaled, *self.q_hat_mod_x,
                                    self.bsk_mt_mods)
        c_bsk, c_mt = conv[..., :-1, :], conv[..., -1, :]
        # r = [-c_mt / q]_mt ; mt is a power of two -> mask instead of Barrett
        r = (c_mt * jnp.uint64(self.neg_inv_q_mod_mt)) & jnp.uint64(mt - 1)
        # centered lift of r modulo each Bsk prime
        r_b = r[..., None, :]
        big = r_b > jnp.uint64(mt // 2)
        rm = jnp.where(big, self.bsk - (jnp.uint64(mt) - r_b), r_b)
        num = addmod(c_bsk, mulmod_shoup(rm, *self.q_mod_bsk, self.bsk),
                     self.bsk)
        return mulmod_shoup(num, *self.inv_mt_mod_bsk, self.bsk)

    def _fastbconv_sk(self, poly_bsk):
        """Shenoy-Kumaresan exact Bsk -> q.  poly_bsk: (..., nB+1, n)."""
        nB, msk = self.nB, self.m_sk
        xB, x_msk = poly_bsk[..., :nB, :], poly_bsk[..., nB, :]
        y = mulmod_shoup(xB, *self.b_hat_inv, self.b_mods)
        # alpha via m_sk
        terms = mulmod_shoup(y, *self.b_hat_mod_msk, jnp.uint64(msk))
        acc = terms[..., 0, :]
        for i in range(1, nB):
            acc = addmod(acc, terms[..., i, :], jnp.uint64(msk))
        alpha = mulmod_shoup(submod(acc, x_msk, jnp.uint64(msk)),
                             self.inv_prod_B_mod_msk[0][0, 0],
                             self.inv_prod_B_mod_msk[1][0, 0],
                             jnp.uint64(msk))
        # conversion into q with centered alpha correction
        yb = y[..., None, :, :]                                   # (..,1,nB,n)
        w, ws = self.b_hat_mod_q
        terms_q = mulmod_shoup(yb, w, ws, self.q_mods[..., None, :])
        accq = terms_q[..., 0, :]
        for i in range(1, nB):
            accq = addmod(accq, terms_q[..., i, :], self.q_mods)
        a_b = alpha[..., None, :]
        big = a_b > jnp.uint64(msk // 2)
        am = jnp.where(
            big,
            submod(jnp.uint64(0),
                   csub_reduce(jnp.uint64(msk) - a_b, self.q_mods,
                               self.steps_msk_mod_q), self.q_mods),
            csub_reduce(a_b, self.q_mods, self.steps_msk_mod_q))
        corr = mulmod_shoup(am, *self.prod_B_mod_q, self.q_mods)
        return submod(accq, corr, self.q_mods)

    @functools.cached_property
    def _prepare(self):
        if self._pairk is not None:
            from .pair import from_pair, to_pair
            pb = self._pairk

            def fp(a):
                return from_pair(pb.prepare(to_pair(a)))
            return jax.jit(fp)

        def f(a):
            """(B, 2, k, n) ct -> (B, 2, nb, n) NTT-domain extended operand.

            The operand-independent half of the BEHZ multiply (Bsk lift +
            forward transforms over all bases).  Serving streams that
            reuse ciphertexts (a pool) prepare each one once; a general
            multiply is then just `_mul_core` -- the work a squaring
            benchmark lets XLA CSE away (~30%) becomes explicit and
            cacheable.
            """
            ea = jnp.concatenate([a, self._to_bsk(a)], axis=-2)
            return self._ntt_all(ea)
        return jax.jit(f)

    def _mul_core(self, fa, fb):
        """Prepared x prepared -> (B, 3, k, n) scaled tensor (BEHZ tail)."""
        k = self.k
        p_all, mu_all = self.tb_all.p, self.tb_all.mu
        # Karatsuba over the 2x2 tensor: 3 general modmuls instead of 4
        t0 = mulmod(fa[:, 0], fb[:, 0], p_all, mu_all)
        t2 = mulmod(fa[:, 1], fb[:, 1], p_all, mu_all)
        cross = mulmod(addmod(fa[:, 0], fa[:, 1], p_all),
                       addmod(fb[:, 0], fb[:, 1], p_all), p_all, mu_all)
        t1 = submod(submod(cross, t0, p_all), t2, p_all)
        stacked = jnp.stack([t0, t1, t2], axis=1)
        if self._intt_all_tscaled is not None:
            tq = self._intt_all_tscaled(stacked)
        else:
            tq = mulmod(self._intt_all(stacked),
                        jnp.uint64(self.params.t), p_all, mu_all)
        conv = self._fastbconv_q_to(tq[..., :k, :], *self.q_hat_mod_x,
                                    self.bsk_mt_mods)[..., :-1, :]
        num = submod(tq[..., k:, :], conv, self.bsk)
        floor_bsk = mulmod_shoup(num, *self.inv_q_mod_bsk, self.bsk)
        return self._fastbconv_sk(floor_bsk)

    @functools.cached_property
    def _mul_relin_prepared(self):
        if self._pairk is not None:
            from .pair import from_pair, to_pair
            pb = self._pairk

            def fp(fa, fb, rk, rk_ws=None):
                out = pb.relinearize(pb.mul_core(to_pair(fa), to_pair(fb)),
                                     to_pair(rk),
                                     None if rk_ws is None else
                                     to_pair(rk_ws))
                return from_pair(out)
            return jax.jit(fp)

        def f(fa, fb, rk, rk_ws=None):
            return self._relinearize.__wrapped__(self._mul_core(fa, fb), rk,
                                                 rk_ws)
        return jax.jit(f)

    @functools.cached_property
    def _multiply(self):
        if self._pairk is not None:
            from .pair import from_pair, to_pair
            pb = self._pairk

            def fp(a, b):
                return from_pair(pb.mul_core(pb.prepare(to_pair(a)),
                                             pb.prepare(to_pair(b))))
            return jax.jit(fp)

        def f(a, b):
            """(B, 2, k, n) x (B, 2, k, n) -> (B, 3, k, n) BEHZ tensor+scale."""
            return self._mul_core(self._prepare.__wrapped__(a),
                                  self._prepare.__wrapped__(b))
        return jax.jit(f)

    # ==================================================================
    # relinearization (SEAL-convention keyswitch, rk as runtime input)
    # ==================================================================
    @functools.cached_property
    def _relinearize(self):
        if self._pairk is not None:
            from .pair import from_pair, to_pair
            pb = self._pairk

            def fp(ct3, rk, rk_ws=None):
                return from_pair(pb.relinearize(
                    to_pair(ct3), to_pair(rk),
                    None if rk_ws is None else to_pair(rk_ws)))
            return jax.jit(fp)

        def f(ct3, rk, rk_ws=None):
            """(B, 3, k, n) + rk (k, 2, k_key, n) -> (B, 2, k, n).

            rk_ws: optional per-key Shoup table (relin_shoup); turns the
            inner-product modmuls into cheaper Shoup multiplies with
            identical results."""
            c2 = ct3[:, 2]                                       # (B, k, n)
            # lift every decomp digit mod every key prime: (B, k, k_key, n)
            d = csub_reduce(c2[:, :, None, :], self.key_mods,
                            self.steps_ct_mod_key)
            d_ntt = self._ntt_key(d)
            pk_, mu_ = self.key_mods, self.mu_key
            if rk_ws is not None:
                def prod(j, c):
                    return mulmod_shoup(d_ntt[:, j], rk[j, c], rk_ws[j, c],
                                        pk_)
            else:
                def prod(j, c):
                    return mulmod(d_ntt[:, j], rk[j, c], pk_, mu_)
            acc0 = prod(0, 0)
            acc1 = prod(0, 1)
            for j in range(1, self.k):
                acc0 = addmod(acc0, prod(j, 0), pk_)
                acc1 = addmod(acc1, prod(j, 1), pk_)
            acc = self._intt_key(jnp.stack([acc0, acc1], axis=1))
            # divide by the special prime with rounding
            P, half = jnp.uint64(self.P), jnp.uint64(self.P >> 1)
            xP = acc[..., self.k_key - 1, :]
            xP_half = addmod(xP, half, P)
            corr = submod(
                csub_reduce(xP_half[..., None, :], self.q_mods,
                            self.steps_P_mod_q),
                self.half_mod_q, self.q_mods)
            ti = submod(acc[..., :self.k, :], corr, self.q_mods)
            res = mulmod_shoup(ti, *self.inv_P_mod_q, self.q_mods)
            return addmod(ct3[:, :2], res, self.q_mods)
        return jax.jit(f)

    @functools.cached_property
    def _mul_relin(self):
        if self._pairk is not None:
            from .pair import from_pair, to_pair
            pb = self._pairk

            def fp(a, b, rk, rk_ws=None):
                ct3 = pb.mul_core(pb.prepare(to_pair(a)),
                                  pb.prepare(to_pair(b)))
                return from_pair(pb.relinearize(
                    ct3, to_pair(rk),
                    None if rk_ws is None else to_pair(rk_ws)))
            return jax.jit(fp)

        def f(a, b, rk, rk_ws=None):
            return self._relinearize.__wrapped__(
                self._multiply.__wrapped__(a, b), rk, rk_ws)
        return jax.jit(f)

    # ------------------------------------------------------------------
    # per-key Shoup table for the relin inner product
    # ------------------------------------------------------------------
    def relin_shoup(self, rk_data) -> np.ndarray:
        """floor(rk * 2**64 / p_key) elementwise, cached per key digest.

        rk_data: (k, 2, k_key, n) uint64 relin-key array in NTT form with
        CANONICAL residues (< p_key per limb row) -- true for golden
        keygen and for reference-loaded SEAL keys.  Computed once per
        distinct key on the host (~98k bigint divisions, tens of ms) and
        reused by every subsequent relinearization with that key; the
        device-side saving is 5 native multiplies per inner-product term
        (mulmod_shoup vs general mulmod in ops/pair.py).
        """
        rk_np = np.asarray(rk_data, dtype=np.uint64)
        import hashlib
        key = hashlib.blake2b(rk_np.tobytes(), digest_size=16).digest()
        hit = self._relin_shoup_cache.get(key)
        if hit is not None:
            return hit
        p = np.asarray(self.golden.key_mods,
                       dtype=np.uint64).reshape(1, 1, -1, 1)
        ws = shoup_precompute(rk_np, p)
        if len(self._relin_shoup_cache) >= 16:
            self._relin_shoup_cache.pop(next(iter(self._relin_shoup_cache)))
        self._relin_shoup_cache[key] = ws
        return ws

    # ==================================================================
    # batched RNS decryption (exact CRT scale-and-round, any ct size)
    # ==================================================================
    def _decrypt_fn(self, size: int):
        """Jitted decrypt for a fixed ciphertext component count.

        dot = sum_comp c_comp * s^comp per limb (golden._dot_with_secret,
        arbitrary size -- a wire ciphertext may carry 3+ components), then
        the EXACT m = round(t*x/q) mod t via multiword CRT composition
        (ops/wide.py; bit-identical to golden._message_from_dot on every
        input, boundary dots included)."""
        fn = self._decrypt_fns.get(size)
        if fn is not None:
            return fn

        def f(ct, s_ntt):
            """(B, size, k, n) ct + s_ntt (k, n) -> (B, n) plaintext mod t."""
            acc = None
            cur = s_ntt
            for comp in range(1, size):
                term = mulmod(self._ntt_q(ct[:, comp]), cur,
                              self.q_mods, self.mu_q)
                acc = term if acc is None else addmod(acc, term, self.q_mods)
                if comp + 1 < size:
                    cur = mulmod(cur, s_ntt, self.q_mods, self.mu_q)
            dot = addmod(ct[:, 0], self._intt_q(acc), self.q_mods)  # (B,k,n)
            y = mulmod_shoup(dot, *self.q_hat_inv, self.q_mods)
            return self._exact_round(y)

        fn = jax.jit(f)
        self._decrypt_fns[size] = fn
        return fn

    @property
    def _decrypt_core(self):
        """Back-compat alias: the size-2 decrypt (benchmarks/report.py)."""
        return self._decrypt_fn(2)

    def decrypt_batch(self, cts: jnp.ndarray, sk,
                      target_batch: Optional[int] = None) -> jnp.ndarray:
        """Batched decrypt: (B, size, k, n) -> (B, n) mod-t polys (device).

        target_batch (>= B): bucket the jit shape by padding ON DEVICE
        (pad_rows) after the transfer; rows >= B of the result are
        garbage the caller ignores."""
        cts = jnp.asarray(cts)
        size = int(cts.shape[1])
        if size < 2:
            # golden raises on size<2 too (intt of an empty dot); both
            # engines surface it as FailedDecryption through FheApp
            raise ValueError("decrypt expects a ciphertext with >= 2 "
                             f"components, got {size}")
        if target_batch is not None:
            cts = pad_rows(cts, target_batch)
        s_ntt = jnp.asarray(sk.s_ntt[:self.k])
        return self._decrypt_fn(size)(cts, s_ntt)

    # ==================================================================
    # batched deterministic encryption (device math, host sampling)
    # ==================================================================
    @functools.cached_property
    def _encrypt_core(self):
        def f(u_rns, e0_rns, e1_rns, m, pk_ct):
            """u/e*: (B, k, n) lifted signed samples; m: (B, n) mod t;
            pk_ct: (2, k, n) = first k limbs of the public key (NTT form)."""
            u_ntt = self._ntt_q(u_rns)
            c0 = self._intt_q(mulmod(u_ntt, pk_ct[0], self.q_mods, self.mu_q))
            c1 = self._intt_q(mulmod(u_ntt, pk_ct[1], self.q_mods, self.mu_q))
            dm = self._scaled_plain(m)
            c0 = addmod(addmod(c0, e0_rns, self.q_mods), dm, self.q_mods)
            c1 = addmod(c1, e1_rns, self.q_mods)
            return jnp.stack([c0, c1], axis=1)
        return jax.jit(f)

    def encrypt_batch(self, plains: np.ndarray, pk: PublicKey,
                      seeds, target_batch: Optional[int] = None
                      ) -> jnp.ndarray:
        """Deterministic batched encrypt: (B, n) mod-t polys -> (B, 2, k, n).

        Bit-identical to golden ``BfvContext.encrypt`` per element.
        target_batch (>= B): bucket the jit shape by padding ON DEVICE
        after the transfer (no extra host sampling, no extra wire bytes);
        rows >= B of the result are garbage the caller ignores.
        """
        B = plains.shape[0]
        n, k = self.n, self.k
        u = np.empty((B, n), dtype=np.int64)
        e0 = np.empty((B, n), dtype=np.int64)
        e1 = np.empty((B, n), dtype=np.int64)
        for i in range(B):
            u[i] = sample_ternary(Blake2Xof(seeds[i], DOMAIN_TERNARY), n)
            xof_e = Blake2Xof(seeds[i], DOMAIN_ERROR)
            e0[i] = sample_cbd(xof_e, n)
            e1[i] = sample_cbd(xof_e, n)
        mods = np.array(self.golden.q_mods, dtype=np.int64).reshape(1, k, 1)
        u_rns = np.mod(u[:, None, :], mods).astype(np.uint64)
        e0_rns = np.mod(e0[:, None, :], mods).astype(np.uint64)
        e1_rns = np.mod(e1[:, None, :], mods).astype(np.uint64)
        pk_ct = jnp.asarray(pk.data[:, :k])
        T = target_batch if target_batch is not None else B
        return self._encrypt_core(pad_rows(jnp.asarray(u_rns), T),
                                  pad_rows(jnp.asarray(e0_rns), T),
                                  pad_rows(jnp.asarray(e1_rns), T),
                                  pad_rows(jnp.asarray(
                                      plains.astype(np.uint64)), T),
                                  pk_ct)

    # ==================================================================
    # single-ciphertext API (FheApp engine protocol, host glue)
    # ==================================================================
    def _wrap(self, data: jnp.ndarray) -> Ciphertext:
        return Ciphertext(self.params,
                          np.asarray(jax.device_get(data), dtype=np.uint64))

    def _ext_addsub(self, a: Ciphertext, b: Ciphertext,
                    is_sub: bool) -> Ciphertext:
        """SEAL zero-extension add/sub for any component counts (mirrors
        golden._ext_addsub bit-exactly; jnp broadcasting previously made
        a size-1 operand silently broadcast -- a consensus split)."""
        sa, sb = a.size, b.size
        if min(sa, sb) < 1:
            raise ValueError("add/sub expects ciphertexts with >= 1 "
                             "component")
        fn = self._sub if is_sub else self._add
        if sa == sb:
            return self._wrap(fn(jnp.asarray(a.data), jnp.asarray(b.data)))
        m = min(sa, sb)
        shared = fn(jnp.asarray(a.data[:m]), jnp.asarray(b.data[:m]))
        if sa > sb:
            extra = jnp.asarray(a.data[m:])
        else:
            extra = jnp.asarray(b.data[m:])
            if is_sub:
                extra = self._neg(extra)
        return self._wrap(jnp.concatenate([shared, extra], axis=0))

    def add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        return self._ext_addsub(a, b, False)

    def sub(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        return self._ext_addsub(a, b, True)

    def negate(self, a: Ciphertext) -> Ciphertext:
        return self._wrap(self._neg(jnp.asarray(a.data)))

    def add_plain(self, a: Ciphertext, plain: np.ndarray) -> Ciphertext:
        return self._wrap(self._add_plain(jnp.asarray(a.data),
                                          jnp.asarray(plain)))

    def sub_plain(self, a: Ciphertext, plain: np.ndarray) -> Ciphertext:
        return self._wrap(self._sub_plain(jnp.asarray(a.data),
                                          jnp.asarray(plain)))

    def plain_sub(self, plain: np.ndarray, a: Ciphertext) -> Ciphertext:
        return self._wrap(self._plain_sub(jnp.asarray(plain),
                                          jnp.asarray(a.data)))

    def mul_plain(self, a: Ciphertext, plain: np.ndarray) -> Ciphertext:
        return self._wrap(self._mul_plain(jnp.asarray(a.data),
                                          jnp.asarray(plain)))

    def multiply(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        if a.size != 2 or b.size != 2:
            raise ValueError("multiply expects size-2 ciphertexts")
        out = self._multiply(jnp.asarray(a.data)[None],
                             jnp.asarray(b.data)[None])
        return self._wrap(out[0])

    def relinearize(self, ct: Ciphertext, rk: RelinKeys) -> Ciphertext:
        if ct.size != 3:
            raise ValueError("relinearize expects a size-3 ciphertext")
        out = self._relinearize(jnp.asarray(ct.data)[None],
                                jnp.asarray(rk.data),
                                jnp.asarray(self.relin_shoup(rk.data)))
        return self._wrap(out[0])

    def mul_relin(self, a: Ciphertext, b: Ciphertext,
                  rk: RelinKeys) -> Ciphertext:
        if a.size != 2 or b.size != 2:
            raise ValueError("multiply expects size-2 ciphertexts")
        out = self._mul_relin(jnp.asarray(a.data)[None],
                              jnp.asarray(b.data)[None],
                              jnp.asarray(rk.data),
                              jnp.asarray(self.relin_shoup(rk.data)))
        return self._wrap(out[0])

    # ------------------------------------------------------------------
    # single-item threshold-API protocol (mirrors BfvContext.encrypt /
    # .decrypt so FheApp can route the encrypt/reencrypt/decrypt
    # precompiles through the accelerated path too)
    # ------------------------------------------------------------------
    def encrypt(self, plain: np.ndarray, pk: PublicKey,
                seed: bytes) -> Ciphertext:
        out = self.encrypt_batch(np.asarray(plain, dtype=np.uint64)[None],
                                 pk, [seed])
        return self._wrap(out[0])

    def decrypt(self, ct: Ciphertext, sk) -> np.ndarray:
        out = self.decrypt_batch(jnp.asarray(ct.data)[None], sk)
        return np.asarray(jax.device_get(out[0]), dtype=np.uint64)
