"""Wire-format tests: SEAL blob codec + reference key-blob interop.

The reference fixtures (tests/data/*.bin, src/data/network.*) are the primary
parity vectors (SURVEY.md section 4, point 5).
"""
import os

import numpy as np
import pytest

from fhe_precompiles_tpu.bfv import BfvContext
from fhe_precompiles_tpu.bfv.modmath import get_ntt_tables
from fhe_precompiles_tpu.bfv.ntt import intt
from fhe_precompiles_tpu.encoding import decode_unsigned, encode_unsigned
from fhe_precompiles_tpu.params import TESTNET_ONE
from fhe_precompiles_tpu.serialization import keyio, seal

REF = "/root/reference"
HAVE_REF = os.path.isdir(REF)

needs_ref = pytest.mark.skipif(not HAVE_REF, reason="reference repo not mounted")


def _read(path):
    with open(path, "rb") as f:
        return f.read()


def test_parms_id_matches_seal():
    # observed in every reference blob
    want = bytes.fromhex(
        "63e68f98b2954aeee7cc20177f0c3cd845236b871bd277da64058edf665d979f")
    got = seal.compute_parms_id(4096, TESTNET_ONE.key_moduli, 4096)
    assert got == want


def test_seal_stream_roundtrip():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 1 << 37, size=(2, 3, 64), dtype=np.uint64)
    blob = seal.SealCiphertextBlob(
        parms_id=b"\x00" * 32, is_ntt_form=True, n=64, k=3, data=data)
    out = seal.SealCiphertextBlob.from_stream(blob.to_stream())
    assert np.array_equal(out.data, data)
    assert out.is_ntt_form and out.n == 64 and out.k == 3
    # uncompressed round-trip too
    out2 = seal.SealCiphertextBlob.from_stream(blob.to_stream(compress=False))
    assert np.array_equal(out2.data, data)


@needs_ref
def test_load_reference_network_keys():
    pk = keyio.load_public_key(_read(f"{REF}/src/data/network.pub"))
    sk = keyio.load_private_key(_read(f"{REF}/src/data/network.pri"))
    assert pk.params == TESTNET_ONE
    assert pk.data.shape == (2, 3, 4096)
    assert pk.relin is not None and pk.relin.data.shape == (2, 2, 3, 4096)
    assert sk.s_ntt.shape == (3, 4096)


@needs_ref
def test_reference_secret_key_is_ternary():
    """The strongest NTT-convention oracle: the SEAL secret key, inverse-
    transformed with *our* NTT, must be a consistent ternary polynomial."""
    sk = keyio.load_private_key(_read(f"{REF}/src/data/network.pri"))
    ref = None
    for j, p in enumerate(TESTNET_ONE.key_moduli):
        tb = get_ntt_tables(p, 4096)
        s = intt(sk.s_ntt[j], tb)
        signed = np.where(s > np.uint64(p // 2),
                          s.astype(np.int64) - np.int64(p), s.astype(np.int64))
        assert set(np.unique(signed)) <= {-1, 0, 1}
        if ref is None:
            ref = signed
        else:
            assert np.array_equal(ref, signed)


@needs_ref
def test_interop_encrypt_decrypt_with_reference_keys():
    pk = keyio.load_public_key(_read(f"{REF}/src/data/network.pub"))
    sk = keyio.load_private_key(_read(f"{REF}/src/data/network.pri"))
    ctx = BfvContext(TESTNET_ONE)
    ct = ctx.encrypt(encode_unsigned(12, TESTNET_ONE, 256), pk, b"\x05" * 64)
    assert decode_unsigned(ctx.decrypt(ct, sk), TESTNET_ONE, 256) == 12


@needs_ref
def test_interop_mul_relin_with_reference_relin_keys():
    pk = keyio.load_public_key(_read(f"{REF}/src/data/network.pub"))
    sk = keyio.load_private_key(_read(f"{REF}/src/data/network.pri"))
    ctx = BfvContext(TESTNET_ONE)
    a = ctx.encrypt(encode_unsigned(16, TESTNET_ONE, 256), pk, b"\x06" * 64)
    b = ctx.encrypt(encode_unsigned(4, TESTNET_ONE, 256), pk, b"\x07" * 64)
    out = ctx.mul_relin(a, b, pk.relin)
    assert decode_unsigned(ctx.decrypt(out, sk), TESTNET_ONE, 256) == 64


@needs_ref
def test_interop_cross_key_reencrypt():
    """The fhe_reencrypt_test flow (fhe.rs:2188-2245): network key -> fixture
    user key, decrypting with the fixture private key."""
    net_pk = keyio.load_public_key(_read(f"{REF}/src/data/network.pub"))
    net_sk = keyio.load_private_key(_read(f"{REF}/src/data/network.pri"))
    usr_pk = keyio.load_public_key(_read(f"{REF}/tests/data/public_key.bin"))
    usr_sk = keyio.load_private_key(_read(f"{REF}/tests/data/private_key.bin"))
    ctx = BfvContext(TESTNET_ONE)
    ct = ctx.encrypt(encode_unsigned(12, TESTNET_ONE, 256), net_pk, b"\x08" * 64)
    plain = ctx.decrypt(ct, net_sk)
    ct2 = ctx.encrypt(plain, usr_pk, b"\x09" * 64)
    assert decode_unsigned(ctx.decrypt(ct2, usr_sk), TESTNET_ONE, 256) == 12


def test_own_key_save_load_roundtrip():
    ctx = BfvContext(TESTNET_ONE)
    pk, sk = ctx.generate_keys(seed=b"\x71" * 64)
    pk2 = keyio.load_public_key(keyio.save_public_key(pk))
    assert np.array_equal(pk2.data, pk.data)
    assert np.array_equal(pk2.relin.data, pk.relin.data)
    sk2 = keyio.load_private_key(keyio.save_private_key(sk))
    assert np.array_equal(sk2.s_ntt, sk.s_ntt)


def test_ciphertext_save_load_roundtrip():
    ctx = BfvContext(TESTNET_ONE)
    pk, sk = ctx.generate_keys(seed=b"\x72" * 64, relin=False)
    ct = ctx.encrypt(encode_unsigned(5, TESTNET_ONE, 64), pk, b"\x73" * 64)
    ct2 = keyio.load_ciphertext(keyio.save_ciphertext(ct))
    assert np.array_equal(ct2.data, ct.data)
    assert decode_unsigned(ctx.decrypt(ct2, sk), TESTNET_ONE, 64) == 5


def test_native_key_store_roundtrip(tmp_path):
    ctx = BfvContext(TESTNET_ONE)
    pk, sk = ctx.generate_keys(seed=b"\x74" * 64)
    path = str(tmp_path / "keys.npz")
    keyio.save_keys_native(path, pk, sk)
    pk2, sk2 = keyio.load_keys_native(path)
    assert pk2.params == TESTNET_ONE
    assert np.array_equal(pk2.data, pk.data)
    assert np.array_equal(pk2.relin.data, pk.relin.data)
    assert np.array_equal(sk2.s_ntt, sk.s_ntt)
