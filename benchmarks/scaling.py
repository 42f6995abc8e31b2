"""Scaling-efficiency harness: batched mul+relin over a growing dp mesh.

Target (BASELINE.md): >= 80% multi-host scaling efficiency.  On a pod slice
this measures the real thing (run one process per host after
``parallel.multihost.initialize``); without TPU-pod hardware it runs on the
virtual CPU mesh (JAX_PLATFORMS=cpu + xla_force_host_platform_device_count)
to validate the sharded program and the harness mechanics.

Usage:  python benchmarks/scaling.py [--devices 8] [--cpu]
Prints one JSON line per mesh size plus an efficiency summary.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    n_dev = 8
    if "--devices" in args:
        n_dev = int(args[args.index("--devices") + 1])
    force_cpu = "--cpu" in args

    if force_cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_dev}"
            ).strip()
    import jax
    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fhe_precompiles_tpu.bfv import BfvContext
    from fhe_precompiles_tpu.ops.engine import JaxEngine
    from fhe_precompiles_tpu.params import Params, TESTNET_ONE
    from fhe_precompiles_tpu.parallel.mesh import make_mesh

    devs = jax.devices()
    print(f"devices: {len(devs)} x {devs[0].platform}", file=sys.stderr)
    # small ring on CPU-mechanics runs, production ring on real chips
    params = TESTNET_ONE if devs[0].platform == "tpu" else Params(
        poly_modulus_degree=512,
        coeff_modulus=TESTNET_ONE.coeff_modulus,
        plain_modulus=4096)
    ctx = BfvContext(params)
    eng = JaxEngine(params, golden=ctx)
    pk, _ = ctx.generate_keys(seed=b"\x61" * 64)
    rng = np.random.default_rng(0)
    per_dev = 16

    results = {}
    dp_sizes = [d for d in (1, 2, 4, 8, 16) if d <= len(devs)]
    for dp in dp_sizes:
        mesh = make_mesh(dp=dp, tp=1, devices=devs[:dp])
        B = per_dev * dp                      # weak scaling: fixed work/device
        data = np.stack([
            np.stack([rng.integers(0, p, size=(params.n,), dtype=np.uint64)
                      for p in ctx.q_mods]) for _ in range(2 * B)
        ]).reshape(B, 2, ctx.k, params.n)
        a = jax.device_put(jnp.asarray(data),
                           NamedSharding(mesh, P("dp", None, None, None)))
        rk = jax.device_put(jnp.asarray(pk.relin.data),
                            NamedSharding(mesh, P()))

        def make(K):
            @jax.jit
            def f(x, rk):
                def body(c, _):
                    return eng._mul_relin.__wrapped__(c, c, rk)[:, :2], None
                y, _ = jax.lax.scan(body, x, None, length=K)
                return jnp.sum(y)
            return f

        times = {}
        for K in (2, 10):
            f = make(K)
            np.asarray(f(a, rk))
            t0 = time.time()
            np.asarray(f(a, rk))
            times[K] = time.time() - t0
        dt = (times[10] - times[2]) / 8
        ops = B / dt
        results[dp] = ops
        print(json.dumps({"metric": f"mul_relin_dp{dp}_ops_per_sec",
                          "value": round(ops, 1), "unit": "ops/s"}),
              flush=True)

    base = results[dp_sizes[0]]
    for dp in dp_sizes[1:]:
        eff = results[dp] / (base * dp)
        print(json.dumps({"metric": f"scaling_efficiency_dp{dp}",
                          "value": round(eff, 4), "unit": "fraction"}),
              flush=True)


if __name__ == "__main__":
    main()
