"""Benchmark: BFV ct-ct multiply + full relinearization throughput per chip.

Headline metric (BASELINE.md): ops/sec at n=4096, testnet-one params
(2 ciphertext RNS limbs + special prime), target >= 1000 ops/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra diagnostics go to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import signal

    # Progress watchdog: each completed step re-arms the alarm, so only a
    # genuinely wedged dispatch (not a long-but-live run under chip
    # contention) trips it.  If at least one full measurement round
    # exists when it fires, report that instead of failing: the driver
    # needs ONE JSON line even on a sick tunnel.
    partial = {}

    def _watchdog(signum, frame):
        if partial.get("dt"):
            log("WATCHDOG: no progress in 600s; reporting best-so-far")
            _emit(partial["dt"], partial["B"])
            raise SystemExit(0)
        log("FATAL: TPU unreachable/wedged (no progress in 600s); "
            "see benchmarks/RESULTS.md for the last healthy-chip numbers")
        raise SystemExit(2)

    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(600)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp

    profile_dir = None
    if "--profile" in sys.argv:  # jax.profiler trace (SURVEY.md section 5)
        profile_dir = "/tmp/fhe_tpu_trace"
        jax.profiler.start_trace(profile_dir)
        log(f"profiling to {profile_dir}")

    from fhe_precompiles_tpu.bfv import BfvContext
    from fhe_precompiles_tpu.encoding import encode_unsigned
    from fhe_precompiles_tpu.ops.engine import JaxEngine
    from fhe_precompiles_tpu.params import TESTNET_ONE

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    ctx = BfvContext(TESTNET_ONE)
    eng = JaxEngine(TESTNET_ONE, golden=ctx)
    pk, sk = ctx.generate_keys(seed=b"\x42" * 64)

    B = 128               # measured throughput sweet spot on v5e
    NB = 8                # distinct ciphertexts, tiled up to B
    t0 = time.time()
    batch = np.stack([
        ctx.encrypt(encode_unsigned((i % 50) + 1, TESTNET_ONE, 64), pk,
                    bytes([i % 251 + 1]) * 64).data
        for i in range(NB)])
    log(f"encrypt x{NB} (host golden): {time.time() - t0:.2f}s")
    tiled = np.tile(batch, (B // NB, 1, 1, 1))

    a = jnp.asarray(tiled)
    b = jnp.asarray(tiled)
    rk = jnp.asarray(pk.relin.data)
    # per-key Shoup table for the relin inner product (host precompute,
    # cached per key digest; identical output bytes, fewer VPU multiplies)
    rk_ws = jnp.asarray(eng.relin_shoup(pk.relin.data))

    # compile + correctness check
    t0 = time.time()
    out = eng._mul_relin(a, b, rk, rk_ws)
    out.block_until_ready()
    log(f"mul_relin compile+first run: {time.time() - t0:.2f}s")
    from fhe_precompiles_tpu.bfv.golden import Ciphertext
    from fhe_precompiles_tpu.encoding import decode_unsigned
    got = decode_unsigned(
        ctx.decrypt(Ciphertext(TESTNET_ONE, np.asarray(out[3])), sk),
        TESTNET_ONE, 64)
    assert got == 16, f"bench pipeline broken: {got}"
    signal.alarm(600)

    # Timing methodology: one dispatch running a data-dependent chain of K
    # batches via lax.scan, returning a scalar digest; the (K_hi - K_lo)
    # slope cancels dispatch/transfer latency (essential on remote-attached
    # chips, honest everywhere).
    def make_chain(K):
        @jax.jit
        def f(x, rk, rk_ws):
            def body(c, _):
                # DISTINCT operands (batch-rotated partner): chaining
                # mul_relin(c, c) would let XLA CSE the two operands'
                # forward NTT/base-extension work and overstate general
                # multiply throughput by ~30% (measured round 2)
                return eng._mul_relin.__wrapped__(
                    c, jnp.roll(c, 1, axis=0), rk, rk_ws)[:, :2], None
            y, _ = jax.lax.scan(body, x, None, length=K)
            return jnp.sum(y)
        return f

    K_LO, K_HI = 4, 44   # wide spread: slope signal >> tunnel jitter
    times = {K: [] for K in (K_LO, K_HI)}
    chains = {}
    for K in (K_LO, K_HI):
        t0 = time.time()
        chains[K] = make_chain(K)
        np.asarray(chains[K](a, rk, rk_ws))    # compile + sync
        log(f"chain K={K} compile+first: {time.time() - t0:.1f}s")
        signal.alarm(600)

    def _slope_dt():
        dt = (min(times[K_HI]) - min(times[K_LO])) / (K_HI - K_LO)
        if dt <= 0:
            # dispatch jitter swamped the slope; fall back to the
            # whole-chain rate (includes one dispatch overhead ->
            # conservative lower bound)
            dt = min(times[K_HI]) / K_HI
            log("slope unusable (tunnel jitter); whole-chain rate")
        return dt

    # The shared dev chip has multi-minute contention windows that depress
    # throughput up to ~3x (measured 2026-08-17).  Sample several windows
    # spread over ~6 min and keep the fastest observation per K: the
    # best window reflects chip capability, the rest reflect neighbors.
    # (6 min because single windows were observed to span most of the old
    # 4-min budget, leaving every sample inside one slow window.)
    deadline = time.time() + 360
    rounds = 0
    while rounds < 3 or (time.time() < deadline and rounds < 14):
        for K in (K_LO, K_HI):
            t0 = time.time()
            np.asarray(chains[K](a, rk, rk_ws))
            times[K].append(time.time() - t0)
            signal.alarm(600)
        rounds += 1
        partial["dt"], partial["B"] = _slope_dt(), B
        log(f"round {rounds}: K{K_LO}={times[K_LO][-1]:.2f}s "
            f"K{K_HI}={times[K_HI][-1]:.2f}s "
            f"best-so-far {B / partial['dt']:.0f} ops/s")
        if time.time() < deadline - 30:
            time.sleep(15)
    dt = _slope_dt()
    ops_per_sec = B / dt
    log(f"batch={B}: {dt*1e3:.1f} ms/batch -> {ops_per_sec:.1f} mul+relin/s "
        "(distinct operands)")

    if profile_dir:
        jax.profiler.stop_trace()
        log(f"trace written to {profile_dir}")

    _emit(dt, B)


def _emit(dt: float, B: int) -> None:
    baseline = 1000.0  # BASELINE.json north star: >= 1000 ops/sec/chip
    ops_per_sec = B / dt
    print(json.dumps({
        "metric": "bfv_mul_relin_n4096_ops_per_sec",
        "value": round(ops_per_sec, 2),
        "unit": "ops/s/chip",
        "vs_baseline": round(ops_per_sec / baseline, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
