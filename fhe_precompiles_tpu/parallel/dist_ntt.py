"""Distributed negacyclic NTT: coefficient-axis sharding with collectives.

The sequence-parallel analog for FHE (SURVEY.md section 2.3 / 5): the ring
dimension n plays the role of sequence length.  The coefficient axis is
sharded over D devices; butterfly stages whose partner distance >= the shard
size exchange whole shards with the paired device (ppermute over ICI), the
remaining log2(n/D) stages run locally.  Output is bit-identical to the
single-device NTT (tests/test_dist_ntt.py), including the SEAL bit-reversed
layout -- so distributed and local validators stay in byte consensus.

Stage structure (forward, D shards of size S = n/D):
  * stages m = 1, 2, ..., D/2  -> partner distance t = n/(2m) >= S: shard s
    pairs with shard s XOR (t/S); one ppermute swap + one butterfly where the
    whole shard shares a single twiddle root[m + global_block].
  * stages m = D, ..., n/2     -> blocks lie inside one shard: local loop
    with the per-shard twiddle slice root[m + s*bs : m + (s+1)*bs].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.modmath import addmod, mulmod_shoup, submod
from ..ops.ntt import StackedNttTables


def _pair_permute(x, axis_name: str, partner_stride: int, D: int):
    """Swap shards between partner pairs s <-> s ^ partner_stride."""
    perm = [(s, s ^ partner_stride) for s in range(D)]
    return jax.lax.ppermute(x, axis_name, perm)


def _shard_twiddle(table: np.ndarray, m: int, bs: int, s, D: int):
    """Per-shard slice of the stage-m twiddles: (L, bs) for shard index s.

    `s` is traced (axis_index), so gather via dynamic_slice over a
    host-constant table reshaped (L, D, bs).
    """
    stage = table[:, m:2 * m]                       # (L, m) host constant
    per_shard = stage.reshape(stage.shape[0], D, bs)
    return jax.lax.dynamic_index_in_dim(
        jnp.asarray(per_shard), s, axis=1, keepdims=False)  # (L, bs)


def make_distributed_ntt(tb: StackedNttTables, mesh: Mesh, axis: str = "sp"):
    """Returns (ntt_fn, intt_fn) operating on (..., L, n) arrays whose last
    axis is sharded over `axis`.  Bit-identical to ops.ntt.ntt/intt."""
    D = mesh.shape[axis]
    n = tb.n
    S = n // D
    if S * D != n or S < 2:
        raise ValueError(f"n={n} not shardable over {D} devices")
    L = tb.p.shape[0]
    p_col = tb.p.reshape(L, 1)

    def fwd_local(x, s):
        """Stages with m >= D: blocks inside one shard.  x: (..., L, S)."""
        m = max(D, 1)
        t = n // (2 * m)
        while m < n:
            bs = S // (2 * t)                       # blocks per shard
            v = x.reshape(x.shape[:-1] + (bs, 2, t))
            w = _shard_twiddle(tb.root, m, bs, s, D)[..., None]        # (L,bs,1)
            ws = _shard_twiddle(tb.root_shoup, m, bs, s, D)[..., None]
            lo = v[..., 0, :]
            hi = mulmod_shoup(v[..., 1, :], w, ws, p_col[..., None])
            v = jnp.stack([addmod(lo, hi, p_col[..., None]),
                           submod(lo, hi, p_col[..., None])], axis=-2)
            x = v.reshape(x.shape)
            m *= 2
            t //= 2
        return x

    def fwd_shard(x):
        """shard_map body: x is the local (..., L, S) shard."""
        s = jax.lax.axis_index(axis)
        m = 1
        while m <= D // 2:
            t = n // (2 * m)
            stride = t // S                         # partner shard distance
            recv = _pair_permute(x, axis, stride, D)
            # twiddle: one scalar per (limb, stage): block index = s//(2*stride)
            # globally each block spans 2*stride shards
            blk = s // (2 * stride)
            w = jax.lax.dynamic_index_in_dim(
                jnp.asarray(tb.root[:, m:2 * m]), blk, axis=1,
                keepdims=True)                       # (L, 1)
            ws = jax.lax.dynamic_index_in_dim(
                jnp.asarray(tb.root_shoup[:, m:2 * m]), blk, axis=1,
                keepdims=True)
            is_lo = (s // stride) % 2 == 0
            lo = jnp.where(is_lo, x, recv)
            hi = jnp.where(is_lo, recv, x)
            hi_w = mulmod_shoup(hi, w, ws, p_col)
            x = jnp.where(is_lo, addmod(lo, hi_w, p_col),
                          submod(lo, hi_w, p_col))
            m *= 2
        return fwd_local(x, s)

    def inv_local(x, s):
        """Inverse stages with blocks inside one shard: m = n/2 ... D."""
        m = n // 2
        t = 1
        while m >= D:
            bs = S // (2 * t)
            v = x.reshape(x.shape[:-1] + (bs, 2, t))
            w = _shard_twiddle(tb.inv_root, m, bs, s, D)[..., None]
            ws = _shard_twiddle(tb.inv_root_shoup, m, bs, s, D)[..., None]
            lo = v[..., 0, :]
            hi = v[..., 1, :]
            v = jnp.stack([addmod(lo, hi, p_col[..., None]),
                           mulmod_shoup(submod(lo, hi, p_col[..., None]),
                                        w, ws, p_col[..., None])], axis=-2)
            x = v.reshape(x.shape)
            t *= 2
            m //= 2
        return x, m, t

    def inv_shard(x):
        s = jax.lax.axis_index(axis)
        x, m, t = inv_local(x, s)
        while m >= 1:                                # cross-shard stages
            stride = (n // (2 * m)) // S
            recv = _pair_permute(x, axis, stride, D)
            blk = s // (2 * stride)
            w = jax.lax.dynamic_index_in_dim(
                jnp.asarray(tb.inv_root[:, m:2 * m]), blk, axis=1,
                keepdims=True)
            ws = jax.lax.dynamic_index_in_dim(
                jnp.asarray(tb.inv_root_shoup[:, m:2 * m]), blk, axis=1,
                keepdims=True)
            is_lo = (s // stride) % 2 == 0
            lo = jnp.where(is_lo, x, recv)
            hi = jnp.where(is_lo, recv, x)
            x = jnp.where(is_lo, addmod(lo, hi, p_col),
                          mulmod_shoup(submod(lo, hi, p_col), w, ws, p_col))
            m //= 2
        return mulmod_shoup(x, tb.n_inv, tb.n_inv_shoup, tb.p)

    from jax import shard_map

    def _wrap(body):
        @jax.jit
        def run(arr):
            nd = arr.ndim
            in_spec = P(*([None] * (nd - 1) + [axis]))
            return shard_map(body, mesh=mesh, in_specs=(in_spec,),
                             out_specs=in_spec, check_vma=False)(arr)
        return run

    return _wrap(fwd_shard), _wrap(inv_shard)


def shard_coeff_axis(arr, mesh: Mesh, axis: str = "sp"):
    """Place (..., L, n) with the coefficient axis sharded."""
    nd = np.asarray(arr).ndim
    return jax.device_put(
        arr, NamedSharding(mesh, P(*([None] * (nd - 1) + [axis]))))
