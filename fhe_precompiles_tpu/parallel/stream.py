"""Batched precompile request-stream executor (BASELINE config 5).

Takes a mixed stream of homomorphic requests, groups them by op kind, and
executes each group as one sharded batched XLA program over the mesh --
the data-parallel serving path that replaces the reference's one-request-at-
a-time C ABI loop with TPU-scale throughput.
"""
from __future__ import annotations

import dataclasses
import functools
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


def bucket_batch(n: int, dp: int, max_batch: int) -> int:
    """Smallest dp * 2^j >= n (n <= max_batch from the caller's chunking,
    so the result is <= 2*max_batch in the worst non-power case).  Keeps
    the jit-shape ladder at ~log2(max_batch) entries per op family while
    staying a multiple of the data-parallel mesh width."""
    t = max(1, dp)
    while t < n:
        t *= 2
    return t


class RequestStream:
    """Groups mixed add/sub/mul requests and runs them batched on a mesh.

    `max_batch` caps each dispatched batch (mul throughput peaks around 128
    on v5e and huge batches blow HBM); groups are chunked transparently.
    """

    def __init__(self, engine: JaxEngine, mesh: Optional[Mesh] = None,
                 shard_limbs: bool = False, max_batch: int = 128):
        self.engine = engine
        self.mesh = mesh
        self.shard_limbs = shard_limbs
        self.max_batch = max_batch

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
        rk = rk_ws = None
        if any(op == "mul" for op in groups):
            if pk.relin is None:
                raise ValueError("mul requests need relin keys in the pk")
            rk = self._replicate(jnp.asarray(pk.relin.data))
            rk_ws = self._replicate(
                jnp.asarray(eng.relin_shoup(pk.relin.data)))
        dp = self.mesh.shape["dp"] if self.mesh is not None else 1
        for op, idxs in groups.items():
            for c0 in range(0, len(idxs), self.max_batch):
                chunk = idxs[c0:c0 + self.max_batch]
                a_np = np.stack([requests[i].a for i in chunk])
                b_np = np.stack([requests[i].b for i in chunk])
                # pad to the bucketed batch size (power of two, multiple of
                # dp): XLA compiles one program per SHAPE, so unbucketed
                # variable-size windows (continuous serving) would compile
                # per distinct length -- seconds each, a recompile storm.
                # Bucketing caps the ladder at log2(max_batch) programs per
                # op; pad rows are trimmed, bytes unchanged.  Single-chip:
                # pad ON DEVICE (engine.pad_rows) so the host->device
                # transfer stays at the real batch size.  Mesh: device_put
                # needs the batch divisible by dp, so pad on host first.
                from ..ops.engine import pad_rows
                target = bucket_batch(len(chunk), dp, self.max_batch)
                if self.mesh is None:
                    a = pad_rows(self._place(jnp.asarray(a_np)), target)
                    b = pad_rows(self._place(jnp.asarray(b_np)), target)
                else:
                    if target > len(chunk):
                        pad = target - len(chunk)
                        a_np = np.concatenate(
                            [a_np, np.repeat(a_np[:1], pad, 0)])
                        b_np = np.concatenate(
                            [b_np, np.repeat(b_np[:1], pad, 0)])
                    a = self._place(jnp.asarray(a_np))
                    b = self._place(jnp.asarray(b_np))
                out = self._dispatch(op, a, b, rk, rk_ws)
                host = np.asarray(jax.device_get(out))
                for slot, i in enumerate(chunk):
                    results[i] = host[slot]
        return results  # type: ignore[return-value]

    def _dispatch(self, op: str, a, b, rk, rk_ws=None):
        eng = self.engine
        if op == "add":
            return eng._add(a, b)
        if op == "sub":
            return eng._sub(a, b)
        if op == "mul":
            # rk_ws: per-key Shoup table (engine.relin_shoup) -- cheaper
            # relin inner product, identical bytes
            return eng._mul_relin(a, b, rk, rk_ws)
        raise ValueError(f"unknown op {op!r}")

    def run_pooled(self, ops: Sequence[str], idx_pairs: np.ndarray,
                   ct_pool, pk: PublicKey):
        """Device-resident variant: requests reference indices into a
        ciphertext pool already on device (gathers happen on-chip, results
        stay on-chip).  Returns a list of (request_indices, batch_array)
        pairs -- batches are NOT split per request, so only O(#batches)
        device ops are dispatched.  This measures the serving engine itself
        rather than host-link bandwidth.
        """
        pool = jnp.asarray(ct_pool)                     # (P, 2, k, n)
        rk = rk_ws = None
        if "mul" in ops:
            if pk.relin is None:
                raise ValueError("mul requests need relin keys in the pk")
            rk = self._replicate(jnp.asarray(pk.relin.data))
            rk_ws = self._replicate(
                jnp.asarray(self.engine.relin_shoup(pk.relin.data)))
        order: dict[str, list[int]] = {}
        for i, op in enumerate(ops):
            order.setdefault(op, []).append(i)
        batches = []
        for op, idxs in order.items():
            for c0 in range(0, len(idxs), self.max_batch):
                chunk = idxs[c0:c0 + self.max_batch]
                ia = jnp.asarray(np.array([idx_pairs[i][0] for i in chunk]))
                ib = jnp.asarray(np.array([idx_pairs[i][1] for i in chunk]))
                a = jnp.take(pool, ia, axis=0)
                b = jnp.take(pool, ib, axis=0)
                batches.append((chunk, self._dispatch(op, a, b, rk,
                                                      rk_ws)))
        jax.block_until_ready([b for _, b in batches])
        return batches

    @functools.cached_property
    def _fused_ops(self):
        """One jitted program per op kind: gather from the pool and scan over
        fixed-size chunks entirely on device.  A whole stream of thousands of
        requests costs ONE dispatch per op kind -- essential when dispatch
        latency is high (remote chips), and efficient everywhere."""
        eng = self.engine
        CB = self.max_batch

        def make(op, prepared=False):
            def fused(pool, ia, ib, rk, rk_ws):
                if prepared:
                    # pool ciphertexts are reused across the stream: run
                    # the operand-independent BEHZ half (Bsk lift +
                    # forward NTTs, ~1/3 of a multiply) once per pooled
                    # ciphertext instead of once per request
                    pool = eng._prepare.__wrapped__(pool)   # (P, 2, nb, n)
                a = jnp.take(pool, ia, axis=0)
                b = jnp.take(pool, ib, axis=0)
                M = a.shape[0]
                nc = M // CB
                a = a.reshape((nc, CB) + a.shape[1:])
                b = b.reshape((nc, CB) + b.shape[1:])

                def body(_, ab):
                    if prepared:
                        out = eng._mul_relin_prepared.__wrapped__(
                            ab[0], ab[1], rk, rk_ws)
                    else:
                        out = self._dispatch(op, ab[0], ab[1], rk, rk_ws)
                    return 0, out
                _, outs = jax.lax.scan(body, 0, (a, b))
                return outs.reshape((nc * CB,) + outs.shape[2:])
            return jax.jit(fused, static_argnames=())
        return {"add": make("add"), "sub": make("sub"),
                "mul": make("mul"), "mul_prepared": make("mul", True)}

    def run_pooled_fused(self, ops: Sequence[str], idx_pairs: np.ndarray,
                         ct_pool, pk: PublicKey):
        """Like run_pooled but one device dispatch per op kind (scan inside
        jit).  Requests are padded up to a chunk multiple; returns
        {op: (request_indices, outputs_array)} with padding trimmed."""
        pool = jnp.asarray(ct_pool)
        if "mul" in ops and pk.relin is None:
            raise ValueError("mul requests need relin keys in the pk")
        rk = (self._replicate(jnp.asarray(pk.relin.data))
              if "mul" in ops else jnp.zeros((1,), jnp.uint64))
        rk_ws = (self._replicate(
            jnp.asarray(self.engine.relin_shoup(pk.relin.data)))
            if "mul" in ops else jnp.zeros((1,), jnp.uint64))
        order: dict[str, list[int]] = {}
        for i, op in enumerate(ops):
            order.setdefault(op, []).append(i)
        out = {}
        CB = self.max_batch
        for op, idxs in order.items():
            M = len(idxs)
            pad = (-M) % CB
            ia = np.array([idx_pairs[i][0] for i in idxs] + [0] * pad)
            ib = np.array([idx_pairs[i][1] for i in idxs] + [0] * pad)
            key = op
            if op == "mul" and pool.shape[0] <= 2 * M:
                # preparing pays off once each pooled ct is used ~once in
                # multiplies; for huge pools with few requests, skip it
                key = "mul_prepared"
            outs = self._fused_ops[key](pool, jnp.asarray(ia),
                                        jnp.asarray(ib), rk, rk_ws)
            out[op] = (idxs, outs[:M])
        jax.block_until_ready([v for _, v in out.values()])
        return out

    def make_mixed_requests(self, cts: Sequence[Ciphertext], count: int,
                            mix=(0.45, 0.1, 0.45), seed: int = 0
                            ) -> List[Request]:
        """Synthesize `count` mixed add/sub/mul requests from sample cts."""
        rng = np.random.default_rng(seed)
        ops = rng.choice(["add", "sub", "mul"], size=count, p=list(mix))
        picks = rng.integers(0, len(cts), size=(count, 2))
        return [Request(op, cts[i].data, cts[j].data)
                for op, (i, j) in zip(ops, picks)]
