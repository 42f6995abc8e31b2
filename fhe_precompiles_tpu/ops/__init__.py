"""TPU compute path: batched JAX/XLA (+Pallas) implementations of every BFV op.

Bit-exactness contract: all functions here produce residue arrays identical to
the golden CPU model (``fhe_precompiles_tpu.bfv.golden``) -- all arithmetic is
exact modular integer math, so CPU and TPU validators stay in byte consensus.

64-bit integers are required (TPU emulates u64 on 32-bit lanes; verified
correct, including the Barrett/Shoup paths, on TPU v5e).
"""
import jax

jax.config.update("jax_enable_x64", True)

from . import modmath, ntt  # noqa: E402,F401
