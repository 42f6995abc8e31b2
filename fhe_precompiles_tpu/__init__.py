"""fhe_precompiles_tpu: a TPU-native FHE precompile framework.

A from-scratch reimplementation of the capability surface of
``Sunscreen-tech/fhe_precompiles`` (BFV homomorphic EVM-style precompiles),
designed TPU-first: the BFV engine (RNS rings, negacyclic NTT, BEHZ multiply,
keyswitching) runs as batched JAX/XLA/Pallas programs sharded over device
meshes, with a bit-exact CPU golden model defining canonical byte semantics.

Public API parity (reference src/lib.rs:47-58):
  * FheApp           -- the 49-operation byte-level precompile runtime
  * pack             -- calldata framing + per-type codecs
  * testnet.one      -- first-testnet params / runtime / app singletons
  * FheError & codes -- stable error model
"""
from .app import FheApp, PRECOMPILE_NAMES  # noqa: F401
from .errors import FheError, FheErrorCode, error_code_to_str  # noqa: F401
from .params import Params, PRESETS, get_params  # noqa: F401
from . import pack  # noqa: F401
from . import testnet  # noqa: F401

__version__ = "0.1.0"
