"""PP vs DP for depth-K homomorphic chains -- the measured conclusion
behind COMPONENTS.md's pipeline-parallelism entry (SURVEY.md 2.3 PP).

Workload: M microbatches each passing through P sequential mul+relin
stages.  Two executions over P devices:
  * DP: batch sharded over devices, each device runs the whole chain
    locally (lax.scan) -- zero communication.
  * PP: one stage per device, activations ppermute along the ring
    (parallel.pipeline) -- GPipe bubble M/(M+P-1) + comm.

Usage: python benchmarks/pipeline_demo.py [--cpu] [--devices 8]
Prints JSON lines + a conclusion line.
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
    n_dev = int(args[args.index("--devices") + 1]) if "--devices" in args else 8
    if "--cpu" in args:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_dev}"
            ).strip()
    import jax
    if "--cpu" in args:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from fhe_precompiles_tpu.bfv import BfvContext
    from fhe_precompiles_tpu.ops.engine import JaxEngine
    from fhe_precompiles_tpu.params import Params, TESTNET_ONE
    from fhe_precompiles_tpu.parallel.pipeline import pipeline_chain

    devs = jax.devices()[:n_dev]
    P_stages = len(devs)
    params = TESTNET_ONE if devs[0].platform == "tpu" else Params(
        poly_modulus_degree=512, coeff_modulus=TESTNET_ONE.coeff_modulus,
        plain_modulus=4096)
    ctx = BfvContext(params)
    eng = JaxEngine(params, golden=ctx)
    pk, _ = ctx.generate_keys(seed=b"\x71" * 64)
    rng = np.random.default_rng(0)
    Bm = 8                                 # ciphertexts per microbatch
    M = 2 * P_stages                       # microbatches
    mk = lambda c: np.stack([
        np.stack([rng.integers(0, p, size=(params.n,), dtype=np.uint64)
                  for p in ctx.q_mods]) for _ in range(2 * c)
    ]).reshape(c, 2, ctx.k, params.n)
    rk = jnp.asarray(pk.relin.data)
    mbs = jnp.asarray(np.stack([mk(Bm) for _ in range(M)]))

    def stage(x, rk):
        return eng._mul_relin.__wrapped__(x, x, rk)[:, :2]

    # ---- PP ----------------------------------------------------------
    mesh_pp = Mesh(np.array(devs).reshape(P_stages), axis_names=("pp",))
    out = pipeline_chain(stage, mesh_pp, mbs, rk)       # warm/compile
    jax.block_until_ready(out)
    t0 = time.time()
    jax.block_until_ready(pipeline_chain(stage, mesh_pp, mbs, rk))
    t_pp = time.time() - t0
    work = M * Bm * P_stages               # total mul+relin ops
    print(json.dumps({"metric": "pp_chain_ops_per_sec",
                      "value": round(work / t_pp, 1), "unit": "ops/s",
                      "stages": P_stages, "microbatches": M}), flush=True)

    # ---- DP baseline: same total work, batch sharded -----------------
    mesh_dp = Mesh(np.array(devs).reshape(P_stages, 1), ("dp", "tp"))
    flat = mbs.reshape(M * Bm, 2, ctx.k, params.n)
    sharded = jax.device_put(flat, NamedSharding(mesh_dp,
                                                 P("dp", None, None, None)))
    rk_rep = jax.device_put(rk, NamedSharding(mesh_dp, P()))

    @jax.jit
    def dp_chain(x, rk):
        def body(c, _):
            return stage(c, rk), None
        y, _ = jax.lax.scan(body, x, None, length=P_stages)
        return y
    jax.block_until_ready(dp_chain(sharded, rk_rep))
    t0 = time.time()
    jax.block_until_ready(dp_chain(sharded, rk_rep))
    t_dp = time.time() - t0
    print(json.dumps({"metric": "dp_chain_ops_per_sec",
                      "value": round(work / t_dp, 1), "unit": "ops/s"}),
          flush=True)
    ratio = t_dp / t_pp
    bubble = M / (M + P_stages - 1)
    print(json.dumps({"metric": "pp_over_dp_speed", "value": round(ratio, 3),
                      "unit": "ratio",
                      "gpipe_bubble_bound": round(bubble, 3)}), flush=True)
    print(f"conclusion: PP runs at {ratio:.2f}x DP speed "
          f"(bubble bound {bubble:.2f}); FHE chains have no per-stage "
          f"weights, so DP dominates -- PP stays N/A for serving",
          file=sys.stderr)


if __name__ == "__main__":
    main()
