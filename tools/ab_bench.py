"""Interleaved A/B benchmark: compare engine variants under identical
chip-contention conditions (the shared dev tunnel varies 2-3x run-to-run,
so only interleaved relative numbers are trustworthy).

Usage: python tools/ab_bench.py [ntt] [mul] [trials=N]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, flush=True)


def chain(step, x0, K):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        def body(c, _):
            return step(c), None
        y, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(jax.tree_util.tree_leaves(y)[0])
    return f


def slope(fns, trials):
    """fns: dict name -> (f_lo, f_hi, k_lo, k_hi, x). Interleaved min-slope."""
    times = {name: {"lo": [], "hi": []} for name in fns}
    for name, (f_lo, f_hi, _, _, x) in fns.items():
        np.asarray(f_lo(x))
        np.asarray(f_hi(x))
    for t in range(trials):
        for name, (f_lo, f_hi, _, _, x) in fns.items():
            t0 = time.time()
            np.asarray(f_lo(x))
            times[name]["lo"].append(time.time() - t0)
            t0 = time.time()
            np.asarray(f_hi(x))
            times[name]["hi"].append(time.time() - t0)
    out = {}
    for name, (_, _, k_lo, k_hi, _) in fns.items():
        dt = (min(times[name]["hi"]) - min(times[name]["lo"])) / (k_hi - k_lo)
        out[name] = dt
    return out


def main():
    args = sys.argv[1:]
    trials = 6
    for a in args:
        if a.startswith("trials="):
            trials = int(a.split("=")[1])
    named = any(a in ("ntt", "mul", "shoup", "mulshoup", "radix", "tail",
                      "mulradix", "pallasntt", "hi8", "bsize", "mxu16k",
                      "tailpallas", "relinshoup")
                for a in args)
    do_ntt = "ntt" in args or not named
    do_mul = "mul" in args or not named

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp

    from fhe_precompiles_tpu.bfv import BfvContext
    from fhe_precompiles_tpu.ops.engine import JaxEngine
    from fhe_precompiles_tpu.params import TESTNET_ONE

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    rng = np.random.default_rng(0)
    ctx = BfvContext(TESTNET_ONE)
    n = ctx.n

    if do_ntt:
        from fhe_precompiles_tpu.ops.ntt import build_tables, intt, ntt
        from fhe_precompiles_tpu.ops.ntt_pair import (build_pair_tables,
                                                      intt_pair, ntt_pair)
        from fhe_precompiles_tpu.ops.pair import from_pair, to_pair
        mods = ctx.q_mods + ctx.Bsk
        L = len(mods)
        B = 128
        tb = build_tables(mods, n)
        tbp = build_pair_tables(mods, n)
        x = np.stack([
            np.stack([rng.integers(0, p, size=(n,), dtype=np.uint64)
                      for p in mods]) for _ in range(B)])
        xj = jnp.asarray(x)

        def stage_step(c):
            return intt(ntt(c, tb), tb)

        def pair_step(c):
            pr = to_pair(c)
            return from_pair(intt_pair(ntt_pair(pr, tbp), tbp))

        K_LO, K_HI = 2, 12
        fns = {
            "ntt_stage": (chain(stage_step, xj, K_LO),
                          chain(stage_step, xj, K_HI), K_LO, K_HI, xj),
            "ntt_pair": (chain(pair_step, xj, K_LO),
                         chain(pair_step, xj, K_HI), K_LO, K_HI, xj),
        }
        res = slope(fns, trials)
        # each chain step = 1 fwd + 1 inv over (B, L, n): 2*B*L transforms
        for name, dt in res.items():
            tps = 2 * B * L / dt
            log(f"{name}: {dt*1e3:.2f} ms/step = {tps:,.0f} transforms/s")
        log(f"pair/stage speedup: {res['ntt_stage']/res['ntt_pair']:.3f}x")

    if "shoup" in args:
        from fhe_precompiles_tpu.ops.ntt_pair import (build_pair_tables,
                                                      intt_pair, ntt_pair)
        from fhe_precompiles_tpu.ops.pair import from_pair, to_pair
        mods = ctx.q_mods + ctx.Bsk
        L = len(mods)
        B = 128
        tabs = {bits: build_pair_tables(mods, n, shoup_bits=bits)
                for bits in (40, 64)}
        x = np.stack([
            np.stack([rng.integers(0, p, size=(n,), dtype=np.uint64)
                      for p in mods]) for _ in range(B)])
        xj = jnp.asarray(x)

        def mk(tbp):
            def step(c):
                pr = to_pair(c)
                return from_pair(intt_pair(ntt_pair(pr, tbp), tbp))
            return step

        K_LO, K_HI = 2, 12
        fns = {f"ntt_shoup{bits}": (chain(mk(tb), xj, K_LO),
                                    chain(mk(tb), xj, K_HI), K_LO, K_HI, xj)
               for bits, tb in tabs.items()}
        res = slope(fns, trials)
        for name, dt in res.items():
            tps = 2 * B * L / dt
            log(f"{name}: {dt*1e3:.2f} ms/step = {tps:,.0f} transforms/s")
        log(f"shoup40/shoup64 speedup: "
            f"{res['ntt_shoup64']/res['ntt_shoup40']:.3f}x")

    if "pallasntt" in args:
        # VMEM-resident Pallas pair NTT (shoup40, transpose-free wrapper)
        # vs the XLA radix-4 pair path, interleaved
        from fhe_precompiles_tpu.ops.ntt_pair import (build_pair_tables,
                                                      intt_pair, ntt_pair)
        from fhe_precompiles_tpu.ops.pair import from_pair, to_pair
        from fhe_precompiles_tpu.ops.pallas_pair_ntt import PairPallasNtt
        mods = ctx.q_mods + ctx.Bsk
        L = len(mods)
        B = 128
        tbp = build_pair_tables(mods, n)
        pp = PairPallasNtt(mods, n)
        x = np.stack([
            np.stack([rng.integers(0, p, size=(n,), dtype=np.uint64)
                      for p in mods]) for _ in range(B)])
        xj = jnp.asarray(x)

        def xla_step(c):
            pr = to_pair(c)
            return from_pair(intt_pair(ntt_pair(pr, tbp), tbp))

        def pallas_step(c):
            pr = to_pair(c)
            return from_pair(pp.intt(pp.ntt(pr)))

        # one-off bit-exactness check, compared ON DEVICE (fetching the
        # full arrays costs minutes over the ~20 MB/s tunnel)
        log("compiling pallas step...")
        t0 = time.time()
        _ = jax.jit(pallas_step).lower(xj).compile()
        log(f"pallas step compiled in {time.time()-t0:.0f}s")

        @jax.jit
        def _equal(c):
            return jnp.all(xla_step(c) == pallas_step(c))
        assert bool(_equal(xj)), "pallas pair NTT != XLA pair NTT"
        log("bit-exact on device: ok")

        K_LO, K_HI = 2, 12
        fns = {
            "ntt_xla_pair": (chain(xla_step, xj, K_LO),
                             chain(xla_step, xj, K_HI), K_LO, K_HI, xj),
            "ntt_pallas": (chain(pallas_step, xj, K_LO),
                           chain(pallas_step, xj, K_HI), K_LO, K_HI, xj),
        }
        res = slope(fns, trials)
        for name, dt in res.items():
            tps = 2 * B * L / dt
            log(f"{name}: {dt*1e3:.2f} ms/step = {tps:,.0f} transforms/s")
        log(f"pallas/xla speedup: "
            f"{res['ntt_xla_pair']/res['ntt_pallas']:.3f}x")

    if "tailpallas" in args:
        # fused VMEM Pallas tail kernels (ops/pallas_tail.py) vs the XLA
        # pair tail, full mul+relin, interleaved
        engs = {"xla": JaxEngine(TESTNET_ONE, golden=ctx,
                                 ntt_backend="pair", pair_tail="xla"),
                "pallas": JaxEngine(TESTNET_ONE, golden=ctx,
                                    ntt_backend="pair",
                                    pair_tail="pallas")}
        pk, sk = ctx.generate_keys(seed=b"\x42" * 64)
        rk = jnp.asarray(pk.relin.data)
        B = 128
        a = jnp.asarray(np.stack([
            np.stack([rng.integers(0, p, size=(n,), dtype=np.uint64)
                      for p in ctx.q_mods]) for _ in range(2 * B)
        ]).reshape(B, 2, len(ctx.q_mods), n))

        def mk(eng):
            def step(c):
                return eng._mul_relin.__wrapped__(
                    c, jnp.roll(c, 1, axis=0), rk)[:, :2]
            return step

        log("compiling pallas-tail step...")
        t0 = time.time()
        _ = jax.jit(mk(engs["pallas"])).lower(a).compile()
        log(f"compiled in {time.time()-t0:.0f}s")

        @jax.jit
        def _equal(c):
            return jnp.all(mk(engs["xla"])(c) == mk(engs["pallas"])(c))
        assert bool(_equal(a)), "pallas tail != xla tail"
        log("bit-exact on device: ok")

        K_LO, K_HI = 4, 24
        fns = {}
        for name, eng in engs.items():
            st = mk(eng)
            fns[f"mul_{name}"] = (chain(st, a, K_LO), chain(st, a, K_HI),
                                  K_LO, K_HI, a)
        res = slope(fns, trials)
        for name, dt in res.items():
            log(f"{name}: {dt*1e3:.2f} ms/batch = {B/dt:,.0f} mul+relin/s")
        log(f"pallas/xla speedup: {res['mul_xla']/res['mul_pallas']:.3f}x")

    if "mxu16k" in args:
        # the round-3 "revisit MXU digit NTT only at n >= 16384" item:
        # four-step digit matmuls (R=C=128, MXU) vs the radix-4 shoup40
        # pair path at n=16384, interleaved.  Bigger n favors MXU in
        # principle: VPU digitize/recombine is O(1) per point while the
        # butterfly path grows log2(n) stages and ceil(log2(n)/2) HBM
        # passes.
        from fhe_precompiles_tpu.ops import mxu_ntt
        from fhe_precompiles_tpu.ops.ntt_pair import (build_pair_tables,
                                                      intt_pair, ntt_pair)
        from fhe_precompiles_tpu.ops.pair import from_pair, to_pair
        from fhe_precompiles_tpu.params import ntt_friendly_primes
        n16 = 16384
        mods16 = ntt_friendly_primes(n16, 3, below=1 << 37)
        assert min(mods16) > (1 << 32)
        L = len(mods16)
        B = 32
        tbp = build_pair_tables(mods16, n16)
        tbm = mxu_ntt.build_mxu_tables(tuple(mods16), n16, C=128)
        x = np.stack([
            np.stack([rng.integers(0, p, size=(n16,), dtype=np.uint64)
                      for p in mods16]) for _ in range(B)])
        xj = jnp.asarray(x)

        def pair_step(c):
            return from_pair(intt_pair(ntt_pair(to_pair(c), tbp), tbp))

        def mxu_step(c):
            return mxu_ntt.intt(mxu_ntt.ntt(c, tbm), tbm)

        @jax.jit
        def _equal(c):
            return jnp.all(pair_step(c) == mxu_step(c))
        assert bool(_equal(xj)), "mxu16k != pair NTT"
        log("bit-exact on device: ok")

        K_LO, K_HI = 2, 8
        fns = {}
        for name, st in (("ntt16k_pair", pair_step), ("ntt16k_mxu",
                                                      mxu_step)):
            fns[name] = (chain(st, xj, K_LO), chain(st, xj, K_HI),
                         K_LO, K_HI, xj)
        res = slope(fns, trials)
        for name, dt in res.items():
            tps = 2 * B * L / dt
            log(f"{name}: {dt*1e3:.2f} ms/step = {tps:,.0f} transforms/s")
        log(f"mxu/pair speedup: "
            f"{res['ntt16k_pair']/res['ntt16k_mxu']:.3f}x")

    if "bsize" in args:
        # mul+relin ops/s at different batch sizes (slope method removes
        # dispatch overhead, so this isolates intrinsic per-op cost)
        eng = JaxEngine(TESTNET_ONE, golden=ctx, ntt_backend="pair")
        pk, sk = ctx.generate_keys(seed=b"\x42" * 64)
        rk = jnp.asarray(pk.relin.data)
        K_LO, K_HI = 4, 16
        fns = {}
        sizes = {}
        for B in (64, 128, 256):
            a = jnp.asarray(np.stack([
                np.stack([rng.integers(0, p, size=(n,), dtype=np.uint64)
                          for p in ctx.q_mods]) for _ in range(2 * B)
            ]).reshape(B, 2, len(ctx.q_mods), n))

            def mk():
                def step(c):
                    return eng._mul_relin.__wrapped__(
                        c, jnp.roll(c, 1, axis=0), rk)[:, :2]
                return step
            st = mk()
            fns[f"B{B}"] = (chain(st, a, K_LO), chain(st, a, K_HI),
                            K_LO, K_HI, a)
            sizes[f"B{B}"] = B
        res = slope(fns, trials)
        for name, dt in res.items():
            log(f"{name}: {dt*1e3:.2f} ms/batch = "
                f"{sizes[name]/dt:,.0f} mul+relin/s")

    if "hi8" in args:
        # u8 hi plane at chunk boundaries (5B/residue HBM) vs full u32
        # pairs (8B), radix-4 shoup40 pair NTT, interleaved
        from fhe_precompiles_tpu.ops.ntt_pair import (build_pair_tables,
                                                      intt_pair, ntt_pair)
        from fhe_precompiles_tpu.ops.pair import from_pair, to_pair
        mods = ctx.q_mods + ctx.Bsk
        L = len(mods)
        B = 128
        tbp = build_pair_tables(mods, n)
        x = np.stack([
            np.stack([rng.integers(0, p, size=(n,), dtype=np.uint64)
                      for p in mods]) for _ in range(B)])
        xj = jnp.asarray(x)

        def mk(hi8):
            def step(c):
                p = to_pair(c)
                return from_pair(intt_pair(ntt_pair(p, tbp, hi8=hi8),
                                           tbp, hi8=hi8))
            return step

        @jax.jit
        def _equal(c):
            return jnp.all(mk(False)(c) == mk(True)(c))
        assert bool(_equal(xj)), "hi8 path != u32 path"
        log("bit-exact on device: ok")

        K_LO, K_HI = 2, 12
        fns = {}
        for name, hi8 in (("ntt_hi32", False), ("ntt_hi8", True)):
            st = mk(hi8)
            fns[name] = (chain(st, xj, K_LO), chain(st, xj, K_HI),
                         K_LO, K_HI, xj)
        res = slope(fns, trials)
        for name, dt in res.items():
            tps = 2 * B * L / dt
            log(f"{name}: {dt*1e3:.2f} ms/step = {tps:,.0f} transforms/s")
        log(f"hi8/hi32 speedup: {res['ntt_hi32']/res['ntt_hi8']:.3f}x")

    if "radix" in args:
        # radix-4 vs radix-8 chunking of the shoup40 pair NTT
        from fhe_precompiles_tpu.ops.ntt_pair import (build_pair_tables,
                                                      intt_pair, ntt_pair)
        from fhe_precompiles_tpu.ops.pair import from_pair, to_pair
        mods = ctx.q_mods + ctx.Bsk
        L = len(mods)
        B = 128
        tbp = build_pair_tables(mods, n)
        x = np.stack([
            np.stack([rng.integers(0, p, size=(n,), dtype=np.uint64)
                      for p in mods]) for _ in range(B)])
        xj = jnp.asarray(x)

        def mk(r):
            def step(c):
                pr = to_pair(c)
                return from_pair(intt_pair(ntt_pair(pr, tbp, radix_log2=r),
                                           tbp, radix_log2=r))
            return step

        K_LO, K_HI = 2, 12
        fns = {f"ntt_radix{1 << r}": (chain(mk(r), xj, K_LO),
                                      chain(mk(r), xj, K_HI), K_LO, K_HI, xj)
               for r in (2, 3)}
        res = slope(fns, trials)
        for name, dt in res.items():
            tps = 2 * B * L / dt
            log(f"{name}: {dt*1e3:.2f} ms/step = {tps:,.0f} transforms/s")
        log(f"radix8/radix4 speedup: "
            f"{res['ntt_radix4']/res['ntt_radix8']:.3f}x")

    if "tail" in args or "mulradix" in args:
        # end-to-end mul+relin A/B over pair-engine variants:
        #   tail     -> loop-accumulated vs broadcast FastBconv contraction
        #   mulradix -> radix-4 vs radix-8 NTT chunks
        engs = {}
        if "tail" in args:
            e_old = JaxEngine(TESTNET_ONE, golden=ctx, ntt_backend="pair")
            e_old.pair_loop_contraction = False   # before _pairk builds
            engs = {"loop": JaxEngine(TESTNET_ONE, golden=ctx,
                                      ntt_backend="pair"),
                    "bcast": e_old}
        else:
            engs = {"radix4": JaxEngine(TESTNET_ONE, golden=ctx,
                                        ntt_backend="pair",
                                        pair_radix_log2=2),
                    "radix8": JaxEngine(TESTNET_ONE, golden=ctx,
                                        ntt_backend="pair",
                                        pair_radix_log2=3)}
        pk, sk = ctx.generate_keys(seed=b"\x42" * 64)
        rk = jnp.asarray(pk.relin.data)
        B = 128
        a = jnp.asarray(np.stack([
            np.stack([rng.integers(0, p, size=(n,), dtype=np.uint64)
                      for p in ctx.q_mods]) for _ in range(2 * B)
        ]).reshape(B, 2, len(ctx.q_mods), n))
        K_LO, K_HI = 4, 24
        fns = {}
        for name, eng in engs.items():
            def mk(eng):
                def step(c):
                    return eng._mul_relin.__wrapped__(
                        c, jnp.roll(c, 1, axis=0), rk)[:, :2]
                return step
            fns[f"mul_{name}"] = (chain(mk(eng), a, K_LO),
                                  chain(mk(eng), a, K_HI), K_LO, K_HI, a)
        res = slope(fns, trials)
        for name, dt in res.items():
            log(f"{name}: {dt*1e3:.2f} ms/batch = {B/dt:,.0f} mul+relin/s")
        names = list(res)
        log(f"{names[0]}/{names[1]}: {res[names[1]]/res[names[0]]:.3f}x")

    if "mulshoup" in args:
        # end-to-end mul+relin with pair tables at both Shoup precisions
        engs = {"pair40": JaxEngine(TESTNET_ONE, golden=ctx,
                                    ntt_backend="pair", pair_shoup_bits=40),
                "pair64": JaxEngine(TESTNET_ONE, golden=ctx,
                                    ntt_backend="pair", pair_shoup_bits=64)}
        pk, sk = ctx.generate_keys(seed=b"\x42" * 64)
        rk = jnp.asarray(pk.relin.data)
        B = 128
        a = jnp.asarray(np.stack([
            np.stack([rng.integers(0, p, size=(n,), dtype=np.uint64)
                      for p in ctx.q_mods]) for _ in range(2 * B)
        ]).reshape(B, 2, len(ctx.q_mods), n))
        K_LO, K_HI = 4, 24
        fns = {}
        for name, eng in engs.items():
            def mk(eng):
                def step(c):
                    return eng._mul_relin.__wrapped__(
                        c, jnp.roll(c, 1, axis=0), rk)[:, :2]
                return step
            fns[f"mul_{name}"] = (chain(mk(eng), a, K_LO),
                                  chain(mk(eng), a, K_HI), K_LO, K_HI, a)
        res = slope(fns, trials)
        for name, dt in res.items():
            log(f"{name}: {dt*1e3:.2f} ms/batch = {B/dt:,.0f} mul+relin/s")
        log(f"40/64 speedup: {res['mul_pair64']/res['mul_pair40']:.3f}x")

    if "relinshoup" in args:
        # per-key Shoup table for the relin inner product (rk_ws) vs the
        # general-modmul relin dot, full mul+relin, interleaved
        eng = JaxEngine(TESTNET_ONE, golden=ctx, ntt_backend="pair")
        pk, sk = ctx.generate_keys(seed=b"\x42" * 64)
        rk = jnp.asarray(pk.relin.data)
        rk_ws = jnp.asarray(eng.relin_shoup(pk.relin.data))
        B = 128
        a = jnp.asarray(np.stack([
            np.stack([rng.integers(0, p, size=(n,), dtype=np.uint64)
                      for p in ctx.q_mods]) for _ in range(2 * B)
        ]).reshape(B, 2, len(ctx.q_mods), n))

        def mk(ws):
            def step(c):
                return eng._mul_relin.__wrapped__(
                    c, jnp.roll(c, 1, axis=0), rk, ws)[:, :2]
            return step

        @jax.jit
        def _equal(c):
            return jnp.all(mk(None)(c) == mk(rk_ws)(c))
        assert bool(_equal(a)), "rk_ws relin != general relin"
        log("bit-exact on device: ok")

        K_LO, K_HI = 4, 24
        fns = {}
        for name, ws in (("general", None), ("shoup", rk_ws)):
            st = mk(ws)
            fns[f"mul_{name}"] = (chain(st, a, K_LO), chain(st, a, K_HI),
                                  K_LO, K_HI, a)
        res = slope(fns, trials)
        for name, dt in res.items():
            log(f"{name}: {dt*1e3:.2f} ms/batch = {B/dt:,.0f} mul+relin/s")
        log(f"shoup/general speedup: "
            f"{res['mul_general']/res['mul_shoup']:.3f}x")

    if do_mul:
        engs = {"stage": JaxEngine(TESTNET_ONE, golden=ctx,
                                   ntt_backend="stage"),
                "pair": JaxEngine(TESTNET_ONE, golden=ctx,
                                  ntt_backend="pair")}
        pk, sk = ctx.generate_keys(seed=b"\x42" * 64)
        rk = jnp.asarray(pk.relin.data)
        B = 128
        a = jnp.asarray(np.stack([
            np.stack([rng.integers(0, p, size=(n,), dtype=np.uint64)
                      for p in ctx.q_mods]) for _ in range(2 * B)
        ]).reshape(B, 2, len(ctx.q_mods), n))
        K_LO, K_HI = 4, 24
        fns = {}
        for name, eng in engs.items():
            def mk(eng):
                def step(c):
                    return eng._mul_relin.__wrapped__(
                        c, jnp.roll(c, 1, axis=0), rk)[:, :2]
                return step
            fns[f"mul_{name}"] = (chain(mk(eng), a, K_LO),
                                  chain(mk(eng), a, K_HI), K_LO, K_HI, a)
        res = slope(fns, trials)
        for name, dt in res.items():
            log(f"{name}: {dt*1e3:.2f} ms/batch = {B/dt:,.0f} mul+relin/s")
        log(f"pair/stage speedup: {res['mul_stage']/res['mul_pair']:.3f}x")



def calibrate():
    """Roofline calibration: pure elementwise-shoup chain vs pure copy chain
    on NTT-sized arrays -> achievable u32-op/s and HBM GB/s, and where the
    stage NTT sits between them."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp
    from fhe_precompiles_tpu.bfv import BfvContext
    from fhe_precompiles_tpu.ops.modmath import mulmod_shoup, shoup_precompute
    from fhe_precompiles_tpu.ops import pair as pr
    from fhe_precompiles_tpu.params import TESTNET_ONE

    ctx = BfvContext(TESTNET_ONE)
    n = ctx.n
    mods = ctx.q_mods + ctx.Bsk
    L, B = len(mods), 128
    rng = np.random.default_rng(0)
    x = np.stack([
        np.stack([rng.integers(0, p, size=(n,), dtype=np.uint64)
                  for p in mods]) for _ in range(B)])
    p_arr = np.array(mods, dtype=np.uint64).reshape(L, 1)
    w = (p_arr // np.uint64(3)).astype(np.uint64)
    ws = shoup_precompute(w, p_arr)
    xj = jnp.asarray(x)
    nbytes = x.nbytes

    # 12 dependent full-width shoup muls (u64) -- same mul count as 12
    # half-width stages but no data movement
    def shoup_chain_u64(c):
        for _ in range(12):
            c = mulmod_shoup(c, w, ws, p_arr)
        return c

    p_pair = pr.split64(p_arr)
    w_pair = pr.split64(w)
    ws_pair = pr.split64(ws)

    def shoup_chain_pair(c):
        t = pr.to_pair(c)
        for _ in range(12):
            t = pr.mulmod_shoup(t, w_pair, ws_pair, p_pair)
        return pr.from_pair(t)

    # pure memory: 12 dependent "touch everything" passes that XLA cannot
    # fuse into one (roll forces a materialized permute each pass)
    def copy_chain(c):
        for _ in range(12):
            c = jnp.roll(c, 1, axis=0) + jnp.uint64(1)
        return c

    K_LO, K_HI = 2, 12
    fns = {
        "shoup12_u64": (chain(shoup_chain_u64, xj, K_LO),
                        chain(shoup_chain_u64, xj, K_HI), K_LO, K_HI, xj),
        "shoup12_pair": (chain(shoup_chain_pair, xj, K_LO),
                         chain(shoup_chain_pair, xj, K_HI), K_LO, K_HI, xj),
        "roll12": (chain(copy_chain, xj, K_LO),
                   chain(copy_chain, xj, K_HI), K_LO, K_HI, xj),
    }
    res = slope(fns, 6)
    elems = B * L * n
    for name, dt in res.items():
        log(f"{name}: {dt*1e3:.3f} ms/step")
    log(f"u64 shoup: {12*elems/res['shoup12_u64']/1e12:.3f} T-shoupmul/s")
    log(f"pair shoup: {12*elems/res['shoup12_pair']/1e12:.3f} T-shoupmul/s")
    log(f"roll12 bandwidth: {12*2*nbytes/res['roll12']/1e9:.0f} GB/s")


if __name__ == "__main__":
    calibrate() if "cal" in sys.argv else main()
