"""Boundary-validation regression tests (round-1 advisor findings).

An FheApp must never compute on objects whose embedded Params differ from
its own: with forged moduli, residue range checks at parse time validate
against the *blob's* moduli, so mismatched-params inputs could otherwise
produce non-canonical output (a consensus split).  The reference hits
SEAL's parms_id check inside sunscreen, surfacing the stage's runtime
failure code (run -> 7, decrypt -> 5).
"""
import hashlib

import numpy as np
import pytest

from fhe_precompiles_tpu import FheApp, pack
from fhe_precompiles_tpu.app import _CT_CODEC
from fhe_precompiles_tpu.bfv.golden import Ciphertext
from fhe_precompiles_tpu.encoding import PLAIN_TYPES
from fhe_precompiles_tpu.errors import FheError, FheErrorCode
from fhe_precompiles_tpu.params import Params, ntt_friendly_primes
from fhe_precompiles_tpu.serialization import keyio, seal
from fhe_precompiles_tpu.serialization.bincode import Writer
from fhe_precompiles_tpu.testnet import one

FHE = one.FHE

# A valid-in-itself parameter set that is NOT the app's: same n, different
# moduli.  Residues below these moduli can exceed the app's moduli.
FORGED = Params(
    poly_modulus_degree=4096,
    coeff_modulus=ntt_friendly_primes(4096, 3, below=1 << 37,
                                      exclude=(0xFFFFEE001, 0xFFFFC4001,
                                               0x1FFFFE0001)),
    plain_modulus=4096,
)


def _forged_ciphertext() -> bytes:
    """A ciphertext blob carrying FORGED params with in-range residues."""
    rng = np.random.default_rng(7)
    k = len(FORGED.ct_moduli)
    data = np.empty((2, k, FORGED.n), dtype=np.uint64)
    for j, m in enumerate(FORGED.ct_moduli):
        data[:, j] = rng.integers(0, m, size=(2, FORGED.n), dtype=np.uint64)
    return keyio.save_ciphertext(Ciphertext(FORGED, data))


def _network_ciphertext() -> bytes:
    poly = PLAIN_TYPES["u64"].encode(5, FHE.params)
    ct = FHE.ctx.encrypt(poly, FHE.public_key, b"\x01" * 64)
    return ct.to_bytes()


def test_binary_op_rejects_forged_params_ciphertext():
    bad = _forged_ciphertext()
    good = _network_ciphertext()
    data = pack.pack_binary_operation(
        FHE.public_key, Ciphertext.from_bytes(bad), _CT_CODEC,
        Ciphertext.from_bytes(good), _CT_CODEC)
    code, out = FHE.call("add_cipheru64_cipheru64", data)
    assert code == int(FheErrorCode.RUNTIME_ERROR)
    assert out == b""


def test_decrypt_rejects_forged_params_ciphertext():
    bad = _forged_ciphertext()
    code, out = FHE.call("decrypt_u64", pack.pack_one_argument(
        Ciphertext.from_bytes(bad), _CT_CODEC))
    assert code == int(FheErrorCode.FAILED_DECRYPTION)
    assert out == b""


def test_reencrypt_rejects_forged_target_key():
    """Reencrypt target pk params mismatch -> FailedEncryption (fhe.rs:654)."""
    from fhe_precompiles_tpu.bfv.golden import BfvContext
    forged_ctx = BfvContext(FORGED)
    fpk, _fsk = forged_ctx.generate_keys()
    ct = _network_ciphertext()
    data = pack.pack_binary_operation(
        fpk, Ciphertext.from_bytes(ct), _CT_CODEC, b"\x01\x02", pack.BYTES)
    code, out = FHE.call("reencrypt_u64", data)
    assert code == int(FheErrorCode.FAILED_ENCRYPTION)
    assert out == b""


def test_keyio_rejects_invalid_params_blob():
    """read_params on untrusted bytes enforces Params.validate()."""
    w = Writer()
    w.u64(4096)
    w.u64(1)
    w.u64((1 << 38) + 1)      # modulus >= 2**37: breaks split arithmetic
    w.u64(4096)
    w.u32(0)
    w.u32(0)
    with pytest.raises(FheError) as ei:
        keyio.read_params(__import__(
            "fhe_precompiles_tpu.serialization.bincode",
            fromlist=["Reader"]).Reader(w.getvalue()))
    assert ei.value.code == FheErrorCode.INVALID_ENCODING


def test_truncated_seal_members_map_to_invalid_encoding():
    """Truncated inner members raise FheError, never a raw struct.error."""
    sk_bytes = keyio.save_private_key(FHE.private_key)
    # private key: outer header intact, members truncated mid-struct
    payload = seal.unwrap_stream(_extract_inner_stream(sk_bytes))
    short = payload[:40]   # cuts inside the coeff_count/scale struct region
    restream = seal.wrap_stream(short, compress=False)
    rebuilt = _replace_inner_stream(sk_bytes, restream)
    with pytest.raises(FheError) as ei:
        keyio.load_private_key(rebuilt)
    assert ei.value.code == FheErrorCode.INVALID_ENCODING


def _extract_inner_stream(key_bytes: bytes) -> bytes:
    from fhe_precompiles_tpu.serialization.bincode import Reader
    r = Reader(key_bytes)
    keyio.read_params(r)
    return r.byte_vec()


def _replace_inner_stream(key_bytes: bytes, new_stream: bytes) -> bytes:
    from fhe_precompiles_tpu.serialization.bincode import Reader
    r = Reader(key_bytes)
    params = keyio.read_params(r)
    _old = r.byte_vec()
    w = Writer()
    keyio.write_params(w, params)
    w.byte_vec(new_stream)
    return w.getvalue()
