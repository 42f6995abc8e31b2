"""End-to-end demo: the full precompile lifecycle in ~40 lines.

Run:  python examples/demo.py          (CPU golden engine; add --jax for TPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if "--jax" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from fhe_precompiles_tpu import FheApp, pack  # noqa: E402
from fhe_precompiles_tpu.app import _CT_CODEC  # noqa: E402
from fhe_precompiles_tpu.bfv.golden import Ciphertext  # noqa: E402
from fhe_precompiles_tpu.testnet import one  # noqa: E402

FHE = one.FHE if "--jax" not in sys.argv else FheApp(one.PARAMS, engine="jax")

# 1. threshold-network deterministic encryption under the network key
calldata = pack.pack_two_arguments(16, pack.U256, b"consensus-seed", pack.BYTES)
ct16 = FHE.encrypt_u256(calldata)
print(f"encrypt_u256(16): {len(ct16)} ciphertext bytes (deterministic)")

calldata = pack.pack_two_arguments(4, pack.U256, b"consensus-seed", pack.BYTES)
ct4 = FHE.encrypt_u256(calldata)

# 2. homomorphic multiply through the byte-level precompile
a = Ciphertext.from_bytes(ct16)
b = Ciphertext.from_bytes(ct4)
mul_in = pack.pack_binary_operation(FHE.public_key, a, _CT_CODEC, b, _CT_CODEC)
product = FHE.mul_cipheru256_cipheru256(mul_in)
print(f"mul precompile: {len(mul_in)} bytes in -> {len(product)} bytes out")

# 3. decrypt under the network key: scalar big-endian bytes out
value = pack.U256.deserialize(FHE.decrypt_u256(product))
print(f"decrypt_u256: 16 * 4 = {value}")

# 4. observability: remaining noise budget of the product
print(f"noise budget after multiply: {one.FHE.noise_budget(product):.1f} bits")

# 5. error model: malformed calldata -> stable error code
code, _ = FHE.call("mul_cipheru256_cipheru256", b"\x00\x01")
print(f"malformed input -> error code {code} (UnexpectedEOF)")
