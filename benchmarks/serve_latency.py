"""Latency-vs-offered-load for the continuous ByteServer (VERDICT r4 #4).

The reference's product contract is per-call (c_fhe.rs:8-59); a batching
front end trades per-call latency for throughput.  This bench drives the
queue-fed continuous mode (serve.ByteServer.start_continuous) with an
open-loop Poisson arrival process at several offered loads and reports
p50/p99 request latency (submit -> future resolved) plus achieved
throughput, on the HOST-CODEC + local-device path.

Environment labeling: on this dev host the "device" is either the remote
TPU tunnel (per-batch transfers dominate -- an environment artifact, not
co-located behavior) or XLA-CPU.  Run under JAX_PLATFORMS=cpu (default
here) for tunnel-free numbers an integrator can scale: a co-located
accelerator only shrinks the device term.

Usage: python benchmarks/serve_latency.py [--quick]
Emits one JSON line per (load, percentile) metric; importable as
run(emit, quick).
"""
from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(emit, quick: bool = False, log=print):
    from fhe_precompiles_tpu import pack
    from fhe_precompiles_tpu.app import _CT_CODEC, FheApp
    from fhe_precompiles_tpu.encoding import PLAIN_TYPES
    from fhe_precompiles_tpu.params import TESTNET_ONE
    from fhe_precompiles_tpu.serve import ByteServer
    from fhe_precompiles_tpu.testnet import one

    FHE = one.FHE
    app = FheApp(TESTNET_ONE, engine="jax")
    server = ByteServer(TESTNET_ONE, app=app, codec="native")

    # request mix: the headline op (cc mul) under the network key
    def ct(value, tag):
        poly = PLAIN_TYPES["u64"].encode(value, FHE.params)
        return FHE.ctx.encrypt(poly, FHE.public_key,
                               hashlib.sha512(tag).digest())

    a, b = ct(16, b"la"), ct(4, b"lb")
    mul_data = pack.pack_binary_operation(FHE.public_key, a, _CT_CODEC,
                                          b, _CT_CODEC)
    req = ("mul_cipheru64_cipheru64", mul_data)

    # warm the bucketed jit ladder first: batches are padded to powers of
    # two (parallel/stream.bucket_batch), so one XLA program per bucket
    # covers every window length the continuous loop can produce
    ladder = [1]
    while ladder[-1] < server.max_batch:
        ladder.append(ladder[-1] * 2)
    for B in ladder:
        server.run([req] * B)
    log(f"warmed jit ladder {ladder}")

    flush_ms = 5.0
    server.start_continuous(flush_ms=flush_ms)
    try:
        # codec steady state
        warm = [server.submit(*req) for _ in range(32)]
        [f.result(timeout=600) for f in warm]

        # closed-loop saturation throughput first (back-to-back windows)
        n_sat = 128 if quick else 512
        t0 = time.monotonic()
        futs = [server.submit(*req) for _ in range(n_sat)]
        [f.result(timeout=600) for f in futs]
        sat_rate = n_sat / (time.monotonic() - t0)
        emit("serve_saturation_throughput", round(sat_rate, 1), "reqs/s")
        log(f"saturation: {sat_rate:.0f} reqs/s")

        # open-loop Poisson arrivals at fractions of saturation
        rng = np.random.default_rng(7)
        for frac in (0.2, 0.5, 0.8):
            rate = sat_rate * frac
            n = max(64, int(rate * (2 if quick else 6)))
            gaps = rng.exponential(1.0 / rate, size=n)
            lat = np.empty(n)
            pending = []
            start = time.monotonic()
            next_t = start
            for i in range(n):
                next_t += gaps[i]
                now = time.monotonic()
                if next_t > now:
                    time.sleep(next_t - now)
                t_submit = time.monotonic()
                fut = server.submit(*req)
                pending.append((i, t_submit, fut))
                # harvest without blocking arrivals
                still = []
                for j, ts, f in pending:
                    if f.done():
                        lat[j] = time.monotonic() - ts
                    else:
                        still.append((j, ts, f))
                pending = still
            for j, ts, f in pending:
                f.result(timeout=600)
                lat[j] = time.monotonic() - ts
            # NOTE: harvest loop timestamps completion at poll time; with
            # arrivals every 1/rate s the quantization error is < one gap,
            # small next to the window flush latency being measured
            p50, p99 = np.percentile(lat, [50, 99]) * 1000
            load = int(frac * 100)
            emit(f"serve_latency_p50_load{load}", round(float(p50), 2), "ms")
            emit(f"serve_latency_p99_load{load}", round(float(p99), 2), "ms")
            log(f"load {load}% ({rate:.0f}/s offered): "
                f"p50 {p50:.1f} ms  p99 {p99:.1f} ms")

        # lone-request latency: idle server, one request (policy floor =
        # flush_ms + one-item window compute)
        lone = []
        for _ in range(8 if quick else 16):
            t0 = time.monotonic()
            server.submit(*req).result(timeout=600)
            lone.append(time.monotonic() - t0)
            time.sleep(0.05)
        emit("serve_latency_lone_request", round(float(np.median(lone)) * 1000, 2),
             "ms")
        log(f"lone request: median {np.median(lone)*1000:.1f} ms "
            f"(flush_ms={flush_ms})")
    finally:
        server.stop_continuous()
        server.close()


def main():
    quick = "--quick" in sys.argv
    import jax
    if os.environ.get("JAX_PLATFORMS", "") != "tpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    def emit(metric, value, unit):
        print(json.dumps({"metric": metric, "value": value, "unit": unit}),
              flush=True)

    run(emit, quick=quick)


if __name__ == "__main__":
    main()
