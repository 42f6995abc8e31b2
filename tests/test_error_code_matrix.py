"""Exact error-code parity matrix (VERDICT round-1 weak #6).

Pins the precompile-surface error code for every failure family, per type,
against the reference's mapping sites:

* lib.rs:18-24 -- the seven codes.
* pack.rs:160,245 -- truncated/oversized offsets -> UnexpectedEOF (1).
* pack.rs:30-101,198 -- codec failures -> InvalidEncoding (3).
* fhe.rs:28 -- runtime failures in binary ops -> SunscreenError (7).
* fhe.rs:616,654 -- any encrypt-side failure (incl. NaN/inf/overflowing
  plaintext encodings) -> FailedEncryption (6).
* fhe.rs:644,696 -- any decrypt-side failure (incl. decode overflow:
  note the reference never surfaces Overflow(4) from a precompile; the
  catch-all maps decode failures to 5) -> FailedDecryption (5).

Where the reference's behavior is not derivable from its source (sunscreen
internals), the pinned choice is documented inline.
"""
import struct

import numpy as np
import pytest

from fhe_precompiles_tpu import FheApp, pack
from fhe_precompiles_tpu.app import _CT_CODEC
from fhe_precompiles_tpu.bfv.golden import Ciphertext
from fhe_precompiles_tpu.encoding import PLAIN_TYPES
from fhe_precompiles_tpu.testnet import one

FHE = one.FHE
SCALARS = {"u256": pack.U256, "u64": pack.U64, "i64": pack.I64,
           "frac64": pack.FRAC64}
TYPES = list(SCALARS)


@pytest.fixture(scope="module")
def user_keys():
    return FHE.generate_keys()


def _ct(value, tname, pk, tag=b"m"):
    import hashlib
    seed = hashlib.sha512(tag + tname.encode()).digest()
    return FHE.ctx.encrypt(PLAIN_TYPES[tname].encode(value, FHE.params),
                           pk, seed)


# ---- encrypt surface (fhe.rs:616 -> 6) -----------------------------------

@pytest.mark.parametrize("bad", [float("nan"), float("inf"),
                                 float("-inf"), 1e308])
def test_encrypt_frac64_nonfinite_is_failed_encryption(bad):
    data = pack.pack_two_arguments(bad, pack.FRAC64, b"x", pack.BYTES)
    code, out = FHE.call("encrypt_frac64", data)
    assert code == 6 and out == b""


@pytest.mark.parametrize("tname", TYPES)
def test_encrypt_valid_succeeds(tname):
    v = 7.5 if tname == "frac64" else 7
    data = pack.pack_two_arguments(v, SCALARS[tname], b"x", pack.BYTES)
    code, out = FHE.call(f"encrypt_{tname}", data)
    assert code == 0 and out


# ---- offset framing (pack.rs:160,245 -> 1) -------------------------------

@pytest.mark.parametrize("tname", TYPES)
def test_truncated_offsets_unexpected_eof(tname):
    assert FHE.call(f"encrypt_{tname}", b"\x00\x00")[0] == 1
    assert FHE.call(f"add_cipher{tname}_cipher{tname}", b"\x00\x00\x00")[0] == 1


@pytest.mark.parametrize("name", ["encrypt_u64", "add_cipheru64_cipheru64",
                                  "reencrypt_u64"])
def test_oversized_offsets_unexpected_eof(name):
    # offsets pointing past the end of the payload
    data = struct.pack(">I", 10_000_000) + b"\x00" * 64
    assert FHE.call(name, data)[0] == 1


# ---- codec failures (pack.rs:30-101 -> 3) --------------------------------

@pytest.mark.parametrize("tname", TYPES)
def test_wrong_width_scalar_invalid_encoding(tname):
    # scalar argument with the wrong byte width (u32 BE offset framing valid)
    data = pack.pack_two_arguments(b"\x01\x02\x03", pack.BYTES,  # 3-byte "scalar"
                                   b"x", pack.BYTES)
    assert FHE.call(f"encrypt_{tname}", data)[0] == 3


def test_garbage_ciphertext_invalid_encoding():
    data = pack.pack_one_argument(b"\xde\xad\xbe\xef" * 10, pack.BYTES)
    assert FHE.call("decrypt_u64", data)[0] == 3


# ---- decrypt surface (fhe.rs:644,696 -> 5) -------------------------------

@pytest.mark.parametrize("tname", ["u64", "i64"])
def test_decode_overflow_is_failed_decryption(tname, user_keys):
    """A 256-bit-sized plaintext through decrypt_u64/i64: the decode
    overflow maps to FailedDecryption (5), NOT Overflow (4) -- the
    reference's catch-all at fhe.rs:696 swallows conversion failures."""
    big = (1 << 200) + 5
    ct = _ct(big, "u256", FHE.public_key, b"ovf")
    data = pack.pack_one_argument(ct, _CT_CODEC)
    code, out = FHE.call(f"decrypt_{tname}", data)
    assert code == 5 and out == b""


def test_wrong_key_decrypt_failed_decryption(user_keys):
    pk, _sk = user_keys
    ct = _ct(5, "u64", pk, b"wrongkey")      # user key, not network key
    data = pack.pack_one_argument(ct, _CT_CODEC)
    assert FHE.call("decrypt_u64", data)[0] == 5


def test_reencrypt_wrong_key_failed_decryption(user_keys):
    pk, _sk = user_keys
    ct = _ct(5, "u64", pk, b"wrongkey2")
    data = pack.pack_binary_operation(pk, ct, _CT_CODEC, b"pd", pack.BYTES)
    assert FHE.call("reencrypt_u64", data)[0] == 5


# ---- binary-op runtime failures (fhe.rs:28 -> 7) -------------------------

def test_mul_without_relin_keys_runtime_error(user_keys):
    pk, _sk = user_keys
    import copy
    bare = copy.copy(pk)
    bare.relin = None
    a = _ct(3, "u64", pk, b"a")
    b = _ct(2, "u64", pk, b"b")
    data = pack.pack_binary_operation(bare, a, _CT_CODEC, b, _CT_CODEC)
    assert FHE.call("mul_cipheru64_cipheru64", data)[0] == 7
    # add with the same relin-less key still succeeds
    assert FHE.call("add_cipheru64_cipheru64", data)[0] == 0


def test_size3_ciphertext_through_add_succeeds(user_keys):
    """A non-relinearized (size-3) ciphertext fed to add -> code 0.

    Round 5 removed the old reject-mixed-sizes deviation: add/sub now
    implement SEAL Evaluator's zero-extension semantics on every stack
    (tests/test_size_semantics.py pins the byte-level matrix); mul still
    requires size-2 operands -> 7 (second half below)."""
    pk, sk = user_keys
    a = _ct(3, "u64", pk, b"s3a")
    b = _ct(2, "u64", pk, b"s3b")
    c3 = FHE.ctx.multiply(a, b)              # size 3, never relinearized
    data = pack.pack_binary_operation(pk, c3, _CT_CODEC, a, _CT_CODEC)
    code, payload = FHE.call("add_cipheru64_cipheru64", data)
    assert code == 0
    out = Ciphertext.from_bytes(payload)
    assert out.size == 3
    # mul on a size-3 operand stays a runtime error on every stack
    code, _ = FHE.call("mul_cipheru64_cipheru64", data)
    assert code == 7


# ---- galois-bearing public keys are accepted, not rejected ---------------

def test_galois_bearing_pk_accepted(user_keys):
    """The reference would deserialize a pk that carries galois keys (only
    its keygen strips them, fhe.rs:34-44); ours must too, ignoring them."""
    from fhe_precompiles_tpu.serialization import keyio
    from fhe_precompiles_tpu.serialization.bincode import Reader, Writer
    pk, sk = user_keys
    raw = pk.to_bytes()
    r = Reader(raw)
    params = keyio.read_params(r)
    pk_stream = r.byte_vec()
    assert not r.option()                     # galois absent in our output
    rest = raw[r.off:]
    w = Writer()
    keyio.write_params(w, params)
    w.byte_vec(pk_stream)
    w.option(True)                            # inject a galois blob
    keyio.write_params(w, params)
    w.byte_vec(b"\x00" * 32)                  # opaque, must be ignored
    w.raw(rest)
    patched = w.getvalue()
    loaded = keyio.load_public_key(patched)
    assert loaded.relin is not None
    a = _ct(6, "u64", loaded, b"gal")
    data = pack.pack_binary_operation(loaded, a, _CT_CODEC, a, _CT_CODEC)
    code, out = FHE.call("add_cipheru64_cipheru64", data)
    assert code == 0
    val = PLAIN_TYPES["u64"].decode(
        FHE.ctx.decrypt(Ciphertext.from_bytes(out), sk), FHE.params)
    assert val == 12
