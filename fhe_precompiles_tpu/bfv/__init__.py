"""BFV scheme core: golden CPU model, NTT tables, and modular math.

This subpackage implements the FHE engine that the reference outsources to
sunscreen/SEAL (see SURVEY.md section 2.2): RNS polynomial rings, negacyclic
NTT, BFV encrypt/decrypt/add/sub/mul, relinearization and key switching.
``golden.py`` is the canonical bit-exact semantics; the JAX/TPU path in
``fhe_precompiles_tpu.ops`` must match it byte-for-byte.
"""
from .golden import (BfvContext, Ciphertext, PublicKey, RelinKeys,  # noqa: F401
                     SecretKey)
