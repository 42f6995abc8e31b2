"""Parser fuzzing: random/mutated bytes through every byte-input surface.

The precompile boundary is consensus-critical attack surface: every input
must produce a stable error code (1-7) or a valid result -- never a crash,
hang, or unhandled exception (the c_fhe.rs contract).
"""
import numpy as np
import pytest

from fhe_precompiles_tpu import pack
from fhe_precompiles_tpu.app import PRECOMPILE_NAMES
from fhe_precompiles_tpu.serialization import keyio, seal
from fhe_precompiles_tpu.errors import FheError
from fhe_precompiles_tpu.testnet import one

FHE = one.FHE


@pytest.mark.parametrize("seed", range(4))
def test_random_bytes_into_every_precompile(seed):
    rng = np.random.default_rng(seed)
    for name in PRECOMPILE_NAMES:
        for size in (0, 1, 7, 64, 300):
            data = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
            code, out = FHE.call(name, data)
            assert 0 <= code <= 7, (name, size, code)
            if code != 0:
                assert out == b""


def test_mutated_valid_ciphertext():
    """Bit-flip a valid encrypt output at every region; decrypt must fail
    cleanly or succeed -- never crash."""
    data = pack.pack_two_arguments(12, pack.U256, b"\x01", pack.BYTES)
    ct = bytearray(FHE.encrypt_u256(data))
    rng = np.random.default_rng(7)
    for _ in range(24):
        pos = int(rng.integers(0, len(ct)))
        mutated = bytearray(ct)
        mutated[pos] ^= 1 << int(rng.integers(0, 8))
        code, out = FHE.call("decrypt_u256", bytes(mutated))
        assert 0 <= code <= 7


def test_truncated_valid_ciphertext_every_prefix_class():
    data = pack.pack_two_arguments(5, pack.U64, b"", pack.BYTES)
    ct = FHE.encrypt_u64(data)
    for cut in (0, 8, 40, 56, 80, len(ct) // 2, len(ct) - 1):
        code, _ = FHE.call("decrypt_u64", ct[:cut])
        assert code != 0


def test_seal_blob_fuzz():
    rng = np.random.default_rng(11)
    for size in (0, 5, 16, 64, 500):
        raw = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        with pytest.raises(FheError):
            seal.SealCiphertextBlob.from_stream(raw)
        with pytest.raises(FheError):
            keyio.load_public_key(raw)
        with pytest.raises(FheError):
            keyio.load_private_key(raw)
        with pytest.raises(FheError):
            keyio.load_ciphertext(raw)


def test_huge_declared_lengths_rejected():
    """Length fields pointing far past the buffer must error, not allocate."""
    w = seal.pack_header(1 << 40, seal.COMPR_NONE)
    with pytest.raises(FheError):
        seal.unwrap_stream(w + b"\x00" * 16)
