"""Roofline / MFU accounting for the batched mul+relin pipeline (VERDICT #4).

All device timings use the scan-chain slope method (two chain lengths, one
dispatch each) -- per-dispatch latency over a remote-attached chip can hit
0.5 s, so single-call timing is meaningless here (CLAUDE.md).

Outputs JSON lines:
  * XLA cost analysis of one batched mul+relin (scalar ops / logical bytes),
  * measured op rate (same chain as bench.py),
  * achieved scalar-op throughput vs an estimated VPU peak,
  * sustained elementwise mulmod rate (practical VPU ceiling) and the
    butterfly-only bound it implies,
  * measured stage-NTT transform rate and the NTT share of op time.

Usage: python benchmarks/roofline.py [--batch 128]
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

from fhe_precompiles_tpu.bfv import BfvContext  # noqa: E402
from fhe_precompiles_tpu.ops.engine import JaxEngine  # noqa: E402
from fhe_precompiles_tpu.params import TESTNET_ONE  # noqa: E402

#: Public v5e peaks: 819 GB/s HBM; VPU int peak estimated as
#: 8 sublanes x 128 lanes x 4 ALUs x ~1.6 GHz ~= 6.5e12 scalar ops/s.
HBM_GBPS = 819.0
VPU_OPS_EST = 6.5e12


def emit(metric, value, unit, **kw):
    print(json.dumps({"metric": metric, "value": round(value, 4),
                      "unit": unit, **kw}), flush=True)


def slope(make_chain, lo, hi):
    flo, fhi = make_chain(lo), make_chain(hi)
    np.asarray(flo())
    np.asarray(fhi())
    t0 = time.time(); np.asarray(flo()); tlo = time.time() - t0
    t0 = time.time(); np.asarray(fhi()); thi = time.time() - t0
    return (thi - tlo) / (hi - lo)


def main():
    args = sys.argv[1:]
    B = int(args[args.index("--batch") + 1]) if "--batch" in args else 128
    ctx = BfvContext(TESTNET_ONE)
    eng = JaxEngine(TESTNET_ONE, golden=ctx)
    pk, _ = ctx.generate_keys(seed=b"\x51" * 64)
    rng = np.random.default_rng(0)
    n, k = ctx.n, ctx.k
    mk = lambda: np.stack([
        np.stack([rng.integers(0, p, size=(n,), dtype=np.uint64)
                  for p in ctx.q_mods]) for _ in range(2 * B)
    ]).reshape(B, 2, k, n)
    a = jnp.asarray(mk())
    rk = jnp.asarray(pk.relin.data)

    # --- XLA cost analysis ------------------------------------------------
    fn = eng._mul_relin.__wrapped__
    compiled = jax.jit(fn).lower(a, a, rk).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))
    emit("mul_relin_xla_scalar_ops_per_op", flops / B, "ops",
         note="XLA-counted ops incl. u64 emulation expansion")
    emit("mul_relin_xla_bytes_per_op", bytes_acc / B, "bytes",
         note="logical bytes (pre-fusion upper bound, NOT HBM traffic)")

    # --- measured op rate (bench.py chain) --------------------------------
    def mr_chain(K):
        @functools.partial(jax.jit, static_argnames=("k",))
        def f(x, rk, k):
            def body(c, _):
                return fn(c, c, rk)[:, :2], None
            y, _ = jax.lax.scan(body, x, None, length=k)
            return jnp.sum(y)
        return lambda: f(a, rk, K)
    dt = slope(mr_chain, 2, 10)
    ops_per_sec = B / dt
    emit("mul_relin_ops_per_sec", ops_per_sec, "ops/s", batch=B)
    emit("achieved_scalar_ops_per_sec", ops_per_sec * flops / B, "ops/s")
    emit("vpu_utilization_estimate",
         ops_per_sec * flops / B / VPU_OPS_EST, "fraction",
         note=f"vs estimated {VPU_OPS_EST:.1e} VPU scalar ops/s peak")

    # --- elementwise mulmod ceiling (slope-timed) -------------------------
    from fhe_precompiles_tpu.ops.modmath import barrett_mu, mulmod
    p_arr = np.array(ctx.q_mods, dtype=np.uint64).reshape(k, 1)
    mu = barrett_mu(p_arr)
    x0 = a[:, 0]

    def mm_chain(K):
        @functools.partial(jax.jit, static_argnames=("k",))
        def f(x, k):
            def body(c, _):
                return mulmod(c, x0, p_arr, mu), None
            y, _ = jax.lax.scan(body, x, None, length=k)
            return jnp.sum(y)
        return lambda: f(x0, K)
    t_mm = slope(mm_chain, 16, 128)
    mulmods_per_sec = x0.size / t_mm
    emit("vpu_mulmod_per_sec", mulmods_per_sec, "mulmod/s",
         note="sustained batched u64 Barrett modmul (slope-timed)")

    # --- stage-NTT transform rate -----------------------------------------
    from fhe_precompiles_tpu.ops import ntt as sntt
    tb = sntt.build_tables(list(ctx.q_mods), n)

    def ntt_chain(K):
        @functools.partial(jax.jit, static_argnames=("k",))
        def f(x, k):
            def body(c, _):
                return sntt.ntt(c, tb), None
            y, _ = jax.lax.scan(body, x, None, length=k)
            return jnp.sum(y)
        return lambda: f(x0, K)
    t_ntt = slope(ntt_chain, 4, 32)
    transforms_per_sec = B * k / t_ntt
    emit("ntt_transforms_per_sec", transforms_per_sec, "transforms/s",
         batch=B, limbs=k)

    nbases = k + len(ctx.Bsk)
    t_cnt = (4 * nbases + k * ctx.k_key) + (3 * nbases + 2 * ctx.k_key)
    emit("mul_relin_transforms", t_cnt, "transforms", bases=nbases)
    ntt_time_per_op = t_cnt / transforms_per_sec
    emit("ntt_share_of_op_time", ntt_time_per_op * ops_per_sec, "fraction",
         note="transform count x measured transform time / measured op time")
    butterflies = t_cnt * (n // 2) * int(np.log2(n))
    emit("butterfly_only_bound_ops_per_sec",
         mulmods_per_sec / butterflies, "ops/s",
         note="if every butterfly cost exactly one sustained mulmod")
    emit("hbm_floor_ops_per_sec",
         HBM_GBPS * 1e9 / (bytes_acc / B), "ops/s",
         note="pessimistic: logical bytes at peak HBM; true traffic is lower")


if __name__ == "__main__":
    main()
