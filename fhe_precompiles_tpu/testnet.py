"""Testnet parameter/runtime singletons.

Parity target: ``/root/reference/src/testnet.rs`` -- module ``one`` exposes
PARAMS / RUNTIME (here: the BfvContext) / FHE (lazy app singleton) /
generate_keys.  New testnets are added as further modules in the registry
pattern (testnet.rs:1-2 implies `one` -> future `two`).
"""
from __future__ import annotations

import functools
import os

from .app import FheApp
from .bfv.golden import BfvContext
from .params import TESTNET_ONE


class _TestnetOne:
    """Lazy singletons for the first testnet (testnet.rs:8-25)."""

    PARAMS = TESTNET_ONE

    @functools.cached_property
    def RUNTIME(self) -> BfvContext:  # noqa: N802 - parity naming
        return BfvContext(self.PARAMS)

    @functools.cached_property
    def FHE(self) -> FheApp:  # noqa: N802 - parity naming
        # FHE_TPU_ENGINE=jax switches the singleton (and therefore every
        # C-ABI host) to the batched JAX/TPU engine; bytes are identical
        # by the 49-op cross-engine consensus tests, so the flag is a
        # pure serving choice.  Default stays the canonical golden model.
        return FheApp(self.PARAMS,
                      engine=os.environ.get("FHE_TPU_ENGINE", "golden"))

    def generate_keys(self):
        """Fresh user keypair under testnet-one params (testnet.rs:20-22)."""
        return self.FHE.generate_keys()


one = _TestnetOne()
