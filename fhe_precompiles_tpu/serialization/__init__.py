"""Wire formats: bincode framing + SEAL 4.x blob codec + key/ciphertext IO.

Parity target: the reference's embedded key blobs (``src/data/network.{pub,pri}``)
and test fixtures (``tests/data/*.bin``), which are bincode-framed sunscreen
types wrapping zstd-compressed SEAL 4.x serialized objects (verified layout,
SURVEY.md section 2.2 "Serialization").
"""
from . import bincode, seal  # noqa: F401
