"""Pipeline parallelism for depth-K homomorphic op chains (SURVEY.md 2.3 PP).

The reference stack has no PP (depth-1 circuits); this module exists to
*measure* whether staging deep op chains across mesh devices can ever beat
the data-parallel fused-scan baseline for FHE serving.  FHE ops carry no
per-stage weights (the relin key is one replicated tensor), so PP's usual
advantage -- weight residency -- does not apply; what remains is the GPipe
bubble (efficiency M/(M+P-1) for M microbatches over P stages) plus
ppermute traffic.  benchmarks/pipeline_demo.py records the comparison; the
conclusion lives in COMPONENTS.md.

Implementation: classic synchronous pipeline under ``shard_map`` over a
``pp`` mesh axis.  Each step every device applies the stage op to its
resident activation, then the ring ``ppermute`` shifts activations one
stage forward; device 0 injects fresh microbatches, the last device
collects finished ones.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_chain(op: Callable, mesh: Mesh, microbatches: jnp.ndarray,
                   *op_args) -> jnp.ndarray:
    """Run every microbatch through P sequential applications of `op`.

    op(x, *op_args) -> x' is one pipeline stage (same op each stage --
    FHE chains are homogeneous).  `microbatches` has shape (M, ...); the
    result is (M, ...) where element m passed through P stages.
    """
    P_stages = mesh.shape["pp"]
    M = microbatches.shape[0]
    steps = M + P_stages - 1
    item_shape = microbatches.shape[1:]

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), *(P() for _ in op_args)),
             out_specs=P("pp"))
    def run(mb, *args):
        idx = jax.lax.axis_index("pp")
        buf = jax.lax.pcast(jnp.zeros(item_shape, mb.dtype),
                            ("pp",), to="varying")
        out = jax.lax.pcast(jnp.zeros((M,) + item_shape, mb.dtype),
                            ("pp",), to="varying")

        def step(carry, t):
            buf, out = carry
            # device 0 injects microbatch t (while available)
            inject = mb[jnp.clip(t, 0, M - 1)]
            cur = jnp.where((idx == 0) & (t < M), inject, buf)
            res = op(cur, *args)
            # last device banks its finished item (stage count == P)
            done_m = t - (P_stages - 1)
            out = jnp.where(
                (idx == P_stages - 1) & (done_m >= 0),
                jax.lax.dynamic_update_slice(
                    out, res[None], (jnp.clip(done_m, 0, M - 1),)
                    + (0,) * len(item_shape)),
                out)
            nxt = jax.lax.ppermute(
                res, "pp",
                [(i, (i + 1) % P_stages) for i in range(P_stages)])
            return (nxt, out), None

        (_, out), _ = jax.lax.scan(step, (buf, out), jnp.arange(steps))
        return out

    # every device returns an (M, ...) block; only the last stage's block
    # holds the real results -- out_specs P("pp") stacks them, take last.
    stacked = run(microbatches, *op_args)
    return stacked.reshape((P_stages, M) + item_shape)[-1]
