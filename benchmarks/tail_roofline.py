"""Per-segment BEHZ-tail roofline (VERDICT round-3 item 2).

The NTT has a real roofline argument (~95% of v5e HBM peak at the radix-4
shoup40 formulation).  The tail — everything between transforms — was only
ever "compute-bound VPU work" prose.  This script makes the 12.4k/s
ceiling claim load-bearing (or finds the segment to attack) by publishing,
for each tail segment of the batched mul+relin pipeline
(ops/behz_pair.py):

  * the segment's MINIMUM modular-multiply counts per op, by primitive
    (Shoup / general Barrett / Barrett reduction), derived from the BEHZ
    algorithm itself — fewer requires an algorithmic change, not tuning;
  * the minimum HBM bytes (read inputs once + write outputs once, u32
    pairs) and the implied HBM floor at 819 GB/s;
  * a primitive-sustained time model: counts / measured sustained rates of
    the lone jitted primitives (each rate includes that pass's own HBM
    traffic, so the model assumes NO cross-primitive fusion — measured
    times below it mean XLA fused passes, far above it mean overhead);
  * the MEASURED segment time (scan-chain slope with the chain-mix
    overhead subtracted) and its ratio to the HBM floor and to the model.

Segments: to_bsk (x2 operands), dyadic (Karatsuba), floor_sk (FastFloor +
Shenoy-Kumaresan), relin_dot, mod_down.  NTT time is accounted separately
(benchmarks/roofline.py) — together they should reconstruct the measured
op time; the "accounted_fraction" row reports how much they do.

Usage: python benchmarks/tail_roofline.py [--batch 128]
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))

HBM_GBPS = 819.0


def emit(metric, value, unit, **kw):
    print(json.dumps({"metric": metric,
                      "value": round(value, 9) if isinstance(value, float)
                      else value, "unit": unit, **kw}), flush=True)


def slope(make_chain, lo, hi, rounds=3):
    """Per-iteration seconds via interleaved two-length chain slope."""
    flo, fhi = make_chain(lo), make_chain(hi)
    jax.block_until_ready(flo())
    jax.block_until_ready(fhi())
    tl, th = [], []
    for _ in range(rounds):
        t0 = time.time(); jax.block_until_ready(flo()); tl.append(time.time() - t0)
        t0 = time.time(); jax.block_until_ready(fhi()); th.append(time.time() - t0)
    return (min(th) - min(tl)) / (hi - lo)


def pair_chain(seg, x0, lo=4, hi=20):
    """Slope-time `seg` applied to a pair carry: the output is consumed by
    a full reduction (no DCE) and mixed back into the carry with a 1-bit
    xor, so every iteration is data-dependent.  The mix overhead (one
    read+write pass over the carry) is measured separately by the caller
    (mix_chain) and subtracted."""
    def make(K):
        @jax.jit
        def f(c):
            def body(c, _):
                y = seg(c)
                s = (jnp.sum(y[0], dtype=jnp.uint32)
                     + jnp.sum(y[1], dtype=jnp.uint32)) & jnp.uint32(1)
                return (c[0] ^ s, c[1]), None
            out, _ = jax.lax.scan(body, c, None, length=K)
            return out[0][..., :1, :1] + out[1][..., :1, :1]
        return lambda: f(x0)
    return slope(make, lo, hi)


def mix_chain(x0, lo=4, hi=20):
    """The chain harness alone: reduce the carry, xor it back."""
    return pair_chain(lambda c: c, x0, lo, hi)


def main(emit_fn=None):
    global emit
    if emit_fn is not None:
        emit = emit_fn
    args = sys.argv[1:]
    B = int(args[args.index("--batch") + 1]) if "--batch" in args else 128

    from fhe_precompiles_tpu.bfv import BfvContext
    from fhe_precompiles_tpu.ops import pair as pr
    from fhe_precompiles_tpu.ops.engine import JaxEngine
    from fhe_precompiles_tpu.params import TESTNET_ONE

    ctx = BfvContext(TESTNET_ONE)
    eng = JaxEngine(TESTNET_ONE, golden=ctx)
    if eng._pairk is None:
        print("pair backend inactive (CPU?) — tail roofline targets TPU",
              file=sys.stderr)
        return
    pb = eng._pairk
    pk, _ = ctx.generate_keys(seed=b"\x52" * 64)
    n, k = eng.n, eng.k
    nB, nBsk, nb, kk = pb.nB, eng.nb - eng.k, eng.nb, eng.k_key
    rng = np.random.default_rng(0)

    def rand_pair(shape, mods):
        """Canonical residues < mods broadcast over the limb axis."""
        arr = np.empty(shape, dtype=np.uint64)
        lim_axis = -2
        for j in range(shape[lim_axis]):
            arr[(Ellipsis, j, slice(None))] = rng.integers(
                0, mods[j], size=shape[:lim_axis] + (shape[-1],),
                dtype=np.uint64)
        return pr.to_pair(jnp.asarray(arr))

    q_mods = list(ctx.q_mods)
    all_mods = q_mods + list(ctx.Bsk)
    key_mods = list(ctx.key_mods) if hasattr(ctx, "key_mods") else \
        list(eng.params.key_moduli)

    # representative segment inputs (canonical)
    x_ct = rand_pair((B, 2, k, n), q_mods)              # to_bsk input
    f_a = rand_pair((B, 2, nb, n), all_mods)            # prepared operands
    f_b = rand_pair((B, 2, nb, n), all_mods)
    tq = rand_pair((B, 3, nb, n), all_mods)             # post-INTT tensor
    d_ntt = rand_pair((B, k, kk, n), key_mods)          # relin digits
    acc = rand_pair((B, 2, kk, n), key_mods)            # pre-mod-down
    rk = pr.to_pair(jnp.asarray(pk.relin.data))
    rk_ws = pr.to_pair(jnp.asarray(eng.relin_shoup(pk.relin.data)))

    # ---- sustained primitive rates (points/s, each pass pays its HBM) ----
    p_pair = pb.q_mods
    mu32 = pb.mu_q32
    c64 = pb.c64_q
    w = rand_pair((1, 1, k, n), q_mods)
    ws_np = np.asarray(
        ((np.asarray(pr.from_pair(w)).astype(object) << 64)
         // np.array(q_mods, dtype=object).reshape(1, 1, k, 1))
    ).astype(np.uint64)
    ws = pr.to_pair(jnp.asarray(ws_np))
    w_full = rand_pair((B, 2, k, n), q_mods)

    mix_ct = mix_chain(x_ct, 8, 56)
    rates = {}
    t_shoup = pair_chain(lambda c: pr.mulmod_shoup(c, w, ws, p_pair),
                         x_ct, 8, 56) - mix_ct
    rates["shoup"] = x_ct[0].size / t_shoup
    t_gen = pair_chain(lambda c: pr.mulmod(c, w_full, p_pair, mu32, c64),
                       x_ct, 8, 56) - mix_ct
    rates["general"] = x_ct[0].size / t_gen
    t_lazy = pair_chain(lambda c: pr.mulmod_shoup(c, w, ws, p_pair,
                                                  lazy=True),
                        x_ct, 8, 56) - mix_ct
    t_sb = pair_chain(lambda c: pr.barrett(
        pr.mulmod_shoup(c, w, ws, p_pair, lazy=True), mu32, p_pair,
        x_max_bits=44), x_ct, 8, 56) - mix_ct
    rates["barrett"] = x_ct[0].size / max(t_sb - t_lazy, t_shoup * 0.2)
    t_add = pair_chain(lambda c: pr.addmod(c, w_full, p_pair), x_ct,
                       8, 56) - mix_ct
    # the mix subtraction can eat most of this cheap pass — clamp to the
    # pass's own HBM floor (2 reads + 1 write, 8 B/point) so one noisy
    # window can't produce an absurd rate
    t_add = max(t_add, 24.0 * x_ct[0].size / (HBM_GBPS * 1e9))
    rates["addsub"] = x_ct[0].size / t_add
    for kname, v in rates.items():
        emit(f"pair_{kname}_sustained_points_per_sec", v, "points/s")

    # ---- segment definitions + minimum counts ---------------------------
    # counts are PER OP (batch item), in units of n-coefficient passes;
    # bytes are read+write minima in u32-pair bytes (8 B/residue).
    PN = 8 * n  # bytes per (n,) pair plane

    segs = {}
    segs["to_bsk"] = dict(
        fn=lambda c: pb.to_bsk(c), x0=x_ct, mult=2,
        # per component: mt_qhinv scale (k shoup) + fastbconv k->Bsk
        # (k*nBsk lazy shoup + nBsk barrett) + q_mod_bsk corr (nBsk shoup)
        # + inv_mt (nBsk shoup); x2 components x2 operands per op (mult)
        shoup=2 * 2 * (k + k * nBsk + nBsk + nBsk),
        general=0,
        barrett=2 * 2 * nBsk,
        addsub=2 * 2 * (nBsk + 3),  # rm select + q_mod_bsk add + mt row
        bytes=2 * 2 * (k + nBsk) * PN,  # 2 operands x 2 comps, r+w once
        note="m_tilde mask row counted free (u32 low-word mask arithmetic)")

    def dyadic_only(fa):
        # the Karatsuba block of mul_core, without INTT/floor
        fa0, fa1 = (fa[0][:, 0], fa[1][:, 0]), (fa[0][:, 1], fa[1][:, 1])
        fb0 = (f_b[0][:, 0], f_b[1][:, 0])
        fb1 = (f_b[0][:, 1], f_b[1][:, 1])
        tp = pb.tp_all
        t0 = pr.mulmod(fa0, fb0, tp.p, tp.mu, tp.c64)
        t2 = pr.mulmod(fa1, fb1, tp.p, tp.mu, tp.c64)
        cross = pr.mulmod(pr.addmod(fa0, fa1, tp.p),
                          pr.addmod(fb0, fb1, tp.p), tp.p, tp.mu, tp.c64)
        t1 = pr.submod(pr.submod(cross, t0, tp.p), t2, tp.p)
        return (jnp.stack([t0[0], t1[0], t2[0]], 1),
                jnp.stack([t0[1], t1[1], t2[1]], 1))

    segs["dyadic"] = dict(
        fn=dyadic_only, x0=f_a, mult=1,
        shoup=0, general=3 * nb, barrett=0,
        addsub=4 * nb,  # 2 Karatsuba input adds + 2 cross subs
        bytes=2 * 2 * nb * PN + 3 * nb * PN,  # read both operands, write 3
        note="Karatsuba: 3 general modmuls/limb (4 -> 3); reads both "
             "prepared operands, writes 3 components")
    segs["floor_sk"] = dict(
        fn=lambda c: pb.fastbconv_sk(pr.mulmod_shoup(
            pr.submod((c[0][..., k:, :], c[1][..., k:, :]),
                      pb._fastbconv((c[0][..., :k, :], c[1][..., :k, :]),
                                    pb.q_hat_mod_bsk, pb.bsk, pb.mu_bsk32,
                                    k), pb.bsk),
            *pb.inv_q_mod_bsk, pb.bsk)), x0=tq, mult=1,
        # x3 tensor components: fastbconv k->Bsk (k*nBsk lazy + nBsk
        # barrett) + inv_q (nBsk shoup) + SK: b_hat_inv (nB) + alpha
        # (nB lazy + 1 barrett + 1 shoup) + accq (nB*k lazy + k barrett)
        # + prod_B corr (k shoup)
        shoup=3 * (k * nBsk + nBsk + nB + nB + 1 + nB * k + k),
        general=0,
        barrett=3 * (nBsk + 1 + k),
        addsub=3 * (nBsk + 3),  # FastFloor sub + alpha sub/select + corr
        bytes=3 * nb * PN + 3 * k * PN,
        note="FastFloor + Shenoy-Kumaresan, 3 tensor components")
    segs["relin_dot"] = dict(
        fn=lambda c: _relin_dot(pb, c, rk, rk_ws), x0=d_ntt, mult=1,
        shoup=2 * k * kk, general=0, barrett=2 * kk,
        addsub=2,  # lazy u32 pair adds between products (near-free)
        bytes=k * kk * PN + 2 * kk * PN,
        note="NTT-domain inner product only (digit NTTs counted with NTTs);"
             " relin key read amortizes over the batch")
    segs["mod_down"] = dict(
        fn=lambda c: _mod_down(pb, c, x_ct), x0=acc, mult=1,
        # per component: P-half add (scalar addmod) + csub corr + sub +
        # inv_P shoup (k) + final addmod; x2 components
        shoup=2 * k, general=0, barrett=0,
        addsub=2 * (1 + 3 * k),  # P/2 add, csub corr, sub, final add
        bytes=2 * kk * PN + 2 * k * PN + 2 * k * PN,
        note="special-prime divide + rounding + add into ct[:, :2]")

    # measured whole-op rate for the share column
    rkj = pr.from_pair(rk)
    rk_wsj = pr.from_pair(rk_ws)
    a64 = pr.from_pair(x_ct)

    def mr_make(K):
        @jax.jit
        def f(x):
            def body(c, _):
                return eng._mul_relin.__wrapped__(
                    c, jnp.roll(c, 1, axis=0), rkj, rk_wsj)[:, :2], None
            y, _ = jax.lax.scan(body, x, None, length=K)
            return jnp.sum(y)
        return lambda: f(a64)
    t_op = slope(mr_make, 2, 10)
    emit("mul_relin_time_per_op", t_op / B, "s", batch=B)

    total_acc = 0.0
    for name, s in segs.items():
        mix = mix_chain(s["x0"])
        t_meas = pair_chain(s["fn"], s["x0"]) - mix
        per_op = s["mult"] * t_meas / B
        model = (s["shoup"] * n / rates["shoup"]
                 + s["general"] * n / rates["general"]
                 + s["barrett"] * n / rates["barrett"]
                 + s.get("addsub", 0) * n / rates["addsub"])
        hbm_floor = s["bytes"] / (HBM_GBPS * 1e9)
        bound = max(model, hbm_floor)
        total_acc += per_op
        emit(f"tail_{name}_time_per_op", per_op, "s",
             share_of_op=round(per_op / (t_op / B), 4),
             min_shoup=s["shoup"], min_general=s["general"],
             min_barrett=s["barrett"], min_addsub=s.get("addsub", 0),
             model_s=round(model, 9), hbm_floor_s=round(hbm_floor, 9),
             ratio_vs_model=round(per_op / model, 3) if model else None,
             ratio_vs_hbm=round(per_op / hbm_floor, 3),
             bound_s=round(bound, 9),
             note=s["note"])

    # NTT share (from roofline.py's accounting) for the reconstruction row
    from fhe_precompiles_tpu.ops.ntt_pair import ntt_pair
    x_all = rand_pair((B, 2, nb, n), all_mods)
    t_ntt = pair_chain(lambda c: ntt_pair(c, pb.tp_all, pb.radix_log2),
                       x_all, 4, 20) - mix_chain(x_all, 4, 20)
    tr_rate = 2 * nb * B / t_ntt
    emit("pair_ntt_transforms_per_sec", tr_rate, "transforms/s")
    t_cnt = (4 * nb + k * kk) + (3 * nb + 2 * kk)
    ntt_per_op = t_cnt / tr_rate
    emit("ntt_time_per_op", ntt_per_op, "s", transforms=t_cnt)
    total_acc += ntt_per_op
    emit("accounted_fraction", total_acc / (t_op / B), "fraction",
         note="sum of measured segment + NTT times vs whole-op time; "
              "<1 means XLA fuses across segment boundaries")


def _relin_dot(pb, d_ntt, rk, rk_ws):
    import fhe_precompiles_tpu.ops.pair as pr
    tpk = pb.tp_key
    k = pb.k
    accs = []
    for comp in range(2):
        acc = pr.mulmod_shoup(
            (d_ntt[0][:, 0], d_ntt[1][:, 0]),
            (rk[0][0, comp], rk[1][0, comp]),
            (rk_ws[0][0, comp], rk_ws[1][0, comp]), tpk.p, lazy=True)
        for j in range(1, k):
            acc = pr.add_pair(acc, pr.mulmod_shoup(
                (d_ntt[0][:, j], d_ntt[1][:, j]),
                (rk[0][j, comp], rk[1][j, comp]),
                (rk_ws[0][j, comp], rk_ws[1][j, comp]), tpk.p, lazy=True))
        accs.append(pr.barrett(acc, tpk.mu, tpk.p, x_max_bits=44))
    return (jnp.stack([a[0] for a in accs], 1),
            jnp.stack([a[1] for a in accs], 1))


def _mod_down(pb, acc, ct2):
    import fhe_precompiles_tpu.ops.pair as pr
    k, kk = pb.k, pb.k_key
    xP = (acc[0][..., kk - 1, :], acc[1][..., kk - 1, :])
    P_scalar = (pb.P[0][0, 0], pb.P[1][0, 0])
    xP_half = pr.addmod(xP, (pb.P_half[0][0, 0], pb.P_half[1][0, 0]),
                        P_scalar)
    corr = pr.submod(
        pr.csub_reduce((xP_half[0][..., None, :], xP_half[1][..., None, :]),
                       pb.q_mods, pb.steps_P_mod_q),
        pb.half_mod_q, pb.q_mods)
    ti = pr.submod((acc[0][..., :k, :], acc[1][..., :k, :]), corr,
                   pb.q_mods)
    res = pr.mulmod_shoup(ti, *pb.inv_P_mod_q, pb.q_mods)
    return pr.addmod((ct2[0][:, :2], ct2[1][:, :2]), res, pb.q_mods)


if __name__ == "__main__":
    main()
