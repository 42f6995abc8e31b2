"""Device mesh construction + canonical shardings for ciphertext batches.

Mesh axes (the FHE meaning of each parallelism strategy, SURVEY.md 2.3):
  dp  -- batch axis over the precompile request stream (data parallel)
  tp  -- RNS limb axis (tensor parallel; collectives for base conversion)

Ciphertext batches are laid out (B, size, k, n); `shard_ct_batch` places B on
`dp` and k on `tp`, replicating keys.  XLA inserts the psum/all-gather pattern
for cross-limb contractions automatically -- this replaces the reference
stack's absent NCCL/MPI layer with ICI collectives.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp, tp) mesh over available devices.

    With dp=None, uses all remaining devices on the data axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        if len(devices) % tp:
            raise ValueError(f"{len(devices)} devices not divisible by tp={tp}")
        dp = len(devices) // tp
    need = dp * tp
    if need > len(devices):
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def ct_batch_spec(shard_limbs: bool = False) -> P:
    """PartitionSpec for a (B, size, k, n) ciphertext batch."""
    return P("dp", None, "tp" if shard_limbs else None, None)


def replicated_spec() -> P:
    return P()


def shard_ct_batch(batch, mesh: Mesh, shard_limbs: bool = False):
    """Place a ciphertext batch on the mesh: B on dp (and k on tp)."""
    return jax.device_put(batch,
                          NamedSharding(mesh, ct_batch_spec(shard_limbs)))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
