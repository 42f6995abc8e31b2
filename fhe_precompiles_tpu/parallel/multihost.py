"""Multi-host bring-up: jax.distributed initialization + global mesh helpers.

Replaces the reference stack's (absent) NCCL/MPI layer with JAX's runtime:
ICI collectives within a slice, DCN across hosts (SURVEY.md section 2.3).
The service is stateless (keys + params only), so elastic recovery =
re-running initialize() and reloading keys -- there is no training state to
checkpoint (SURVEY.md section 5 "failure detection").
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join (or bootstrap) a multi-host run.

    With no arguments, reads the standard JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID environment (or cloud-TPU metadata).
    Idempotent: safe to call when already initialized or single-host.
    """
    if num_processes in (None, 1) and coordinator_address is None \
            and os.environ.get("JAX_COORDINATOR_ADDRESS") is None:
        return  # single-host: nothing to do
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def global_mesh(dp: Optional[int] = None, tp: int = 1) -> Mesh:
    """A (dp, tp) mesh over ALL processes' devices (ICI-major ordering)."""
    devices = jax.devices()           # global across hosts after initialize()
    if dp is None:
        dp = len(devices) // tp
    if dp * tp != len(devices):
        raise ValueError(
            f"{len(devices)} global devices != dp*tp = {dp}*{tp}")
    return Mesh(np.array(devices).reshape(dp, tp), axis_names=("dp", "tp"))


def is_primary() -> bool:
    return jax.process_index() == 0
