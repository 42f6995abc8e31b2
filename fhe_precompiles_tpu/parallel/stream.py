"""Batched precompile request-stream executor (BASELINE config 5).

Takes a mixed stream of homomorphic requests, groups them by op kind, and
executes each group as one sharded batched XLA program over the mesh --
the data-parallel serving path that replaces the reference's one-request-at-
a-time C ABI loop with TPU-scale throughput.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..bfv.golden import Ciphertext, PublicKey
from ..ops.engine import JaxEngine
from .mesh import ct_batch_spec


@dataclasses.dataclass
class Request:
    op: str                     # "add" | "sub" | "mul"
    a: np.ndarray               # (2, k, n) ciphertext data
    b: np.ndarray


class RequestStream:
    """Groups mixed add/sub/mul requests and runs them batched on a mesh."""

    def __init__(self, engine: JaxEngine, mesh: Optional[Mesh] = None,
                 shard_limbs: bool = False):
        self.engine = engine
        self.mesh = mesh
        self.shard_limbs = shard_limbs

    def _place(self, arr: jnp.ndarray):
        if self.mesh is None:
            return jnp.asarray(arr)
        return jax.device_put(
            arr, NamedSharding(self.mesh, ct_batch_spec(self.shard_limbs)))

    def _replicate(self, arr):
        if self.mesh is None:
            return jnp.asarray(arr)
        return jax.device_put(arr, NamedSharding(self.mesh, P()))

    def run(self, requests: Sequence[Request],
            pk: PublicKey) -> List[np.ndarray]:
        """Execute a mixed stream; returns per-request (2, k, n) results in
        input order.  Each op kind becomes one batched sharded program."""
        eng = self.engine
        groups: dict[str, list[int]] = {}
        for i, r in enumerate(requests):
            groups.setdefault(r.op, []).append(i)
        results: List[Optional[np.ndarray]] = [None] * len(requests)
        rk = None
        if any(op == "mul" for op in groups):
            if pk.relin is None:
                raise ValueError("mul requests need relin keys in the pk")
            rk = self._replicate(jnp.asarray(pk.relin.data))
        dp = self.mesh.shape["dp"] if self.mesh is not None else 1
        for op, idxs in groups.items():
            a_np = np.stack([requests[i].a for i in idxs])
            b_np = np.stack([requests[i].b for i in idxs])
            if len(idxs) % dp:  # pad the batch up to the data-parallel width
                pad = dp - len(idxs) % dp
                a_np = np.concatenate([a_np, np.repeat(a_np[:1], pad, 0)])
                b_np = np.concatenate([b_np, np.repeat(b_np[:1], pad, 0)])
            a = self._place(jnp.asarray(a_np))
            b = self._place(jnp.asarray(b_np))
            if op == "add":
                out = eng._add(a, b)
            elif op == "sub":
                out = eng._sub(a, b)
            elif op == "mul":
                out = eng._mul_relin(a, b, rk)
            else:
                raise ValueError(f"unknown op {op!r}")
            host = np.asarray(jax.device_get(out))
            for slot, i in enumerate(idxs):
                results[i] = host[slot]
        return results  # type: ignore[return-value]

    def make_mixed_requests(self, cts: Sequence[Ciphertext], count: int,
                            mix=(0.45, 0.1, 0.45), seed: int = 0
                            ) -> List[Request]:
        """Synthesize `count` mixed add/sub/mul requests from sample cts."""
        rng = np.random.default_rng(seed)
        ops = rng.choice(["add", "sub", "mul"], size=count, p=list(mix))
        picks = rng.integers(0, len(cts), size=(count, 2))
        return [Request(op, cts[i].data, cts[j].data)
                for op, (i, j) in zip(ops, picks)]
