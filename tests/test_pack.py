"""Calldata pack/unpack inverse-law tests (the pack.rs:268-1111 analog)."""
import pytest

from fhe_precompiles_tpu import pack
from fhe_precompiles_tpu.errors import FheError, FheErrorCode


@pytest.mark.parametrize("codec,value", [
    (pack.U64, 0), (pack.U64, 16), (pack.U64, (1 << 64) - 1),
    (pack.U256, 0), (pack.U256, 12), (pack.U256, (1 << 256) - 1),
    (pack.I64, 0), (pack.I64, 16), (pack.I64, -16),
    (pack.I64, -(1 << 63)), (pack.I64, (1 << 63) - 1),
    (pack.FRAC64, 0.0), (pack.FRAC64, 16.5), (pack.FRAC64, -3.25),
    (pack.BYTES, b""), (pack.BYTES, b"\x01\x02\x03"),
])
def test_scalar_codec_roundtrip(codec, value):
    data = codec.serialize(value)
    assert codec.deserialize(data) == value
    # pack(unpack(pack(x))) == pack(x)
    assert codec.serialize(codec.deserialize(data)) == data


def test_scalar_codec_sizes():
    # big-endian fixed widths (pack.rs:47-104)
    assert pack.U64.serialize(1) == b"\x00" * 7 + b"\x01"
    assert len(pack.U256.serialize(1)) == 32
    assert pack.I64.serialize(-1) == b"\xff" * 8
    assert pack.FRAC64.serialize(1.0)[:2] == b"\x3f\xf0"


@pytest.mark.parametrize("bad", [b"", b"\x00" * 7, b"\x00" * 9])
def test_scalar_codec_bad_length(bad):
    with pytest.raises(FheError) as e:
        pack.U64.deserialize(bad)
    assert e.value.code == FheErrorCode.INVALID_ENCODING


def test_two_arguments_roundtrip():
    data = pack.pack_two_arguments(16, pack.U256, b"\x01\x02\x03", pack.BYTES)
    # offset prefix: 4 + 32
    assert data[:4] == (36).to_bytes(4, "big")
    a, b = pack.unpack_two_arguments(data, pack.U256, pack.BYTES)
    assert (a, b) == (16, b"\x01\x02\x03")
    # pack-unpack-pack fixpoint
    assert pack.pack_two_arguments(a, pack.U256, b, pack.BYTES) == data


def test_two_arguments_eof():
    with pytest.raises(FheError) as e:
        pack.unpack_two_arguments(b"\x00\x01", pack.U64, pack.BYTES)
    assert e.value.code == FheErrorCode.UNEXPECTED_EOF


def test_two_arguments_bad_offset():
    data = (99).to_bytes(4, "big") + b"\x00" * 8
    with pytest.raises(FheError) as e:
        pack.unpack_two_arguments(data, pack.U64, pack.BYTES)
    assert e.value.code == FheErrorCode.UNEXPECTED_EOF


class _FakeKey:
    def __init__(self, payload=b"PKPKPK"):
        self.payload = payload

    def to_bytes(self):
        return self.payload

    @classmethod
    def from_bytes(cls, data):
        return cls(bytes(data))


def test_binary_operation_roundtrip():
    pk = _FakeKey()
    codec = pack.ObjectCodec(_FakeKey)
    data = pack.pack_binary_operation(pk, 16, pack.I64, -4, pack.I64)
    off1 = int.from_bytes(data[:4], "big")
    off2 = int.from_bytes(data[4:8], "big")
    assert off1 == 8 + len(pk.to_bytes())
    assert off2 == off1 + 8
    k, a, b = pack.unpack_binary_operation(data, codec, pack.I64, pack.I64)
    assert k.payload == pk.payload
    assert (a, b) == (16, -4)


def test_binary_operation_eof():
    with pytest.raises(FheError) as e:
        pack.unpack_binary_operation(b"\x00" * 7, pack.ObjectCodec(_FakeKey),
                                     pack.U64, pack.U64)
    assert e.value.code == FheErrorCode.UNEXPECTED_EOF


def test_nullary_roundtrip():
    pk = _FakeKey()
    data = pack.pack_nullary_operation(pk)
    out = pack.unpack_nullary_operation(data, pack.ObjectCodec(_FakeKey))
    assert out.payload == pk.payload


# ----------------------------------------------------------------------
# Full cross-product inverse laws (the pack.rs:268-1111 coverage pattern):
# every (A, B) argument-type combination through two-argument and binary
# framing must satisfy unpack(pack(x)) == x and pack-unpack-pack fixpoint.
# ----------------------------------------------------------------------

_SCALARS = [(pack.U64, 16), (pack.U256, 12), (pack.I64, -7),
            (pack.FRAC64, 2.5), (pack.BYTES, b"\x09\x08")]


@pytest.mark.parametrize("cb,vb", _SCALARS)
@pytest.mark.parametrize("ca,va", _SCALARS)
def test_two_arguments_cross_product(ca, va, cb, vb):
    data = pack.pack_two_arguments(va, ca, vb, cb)
    a, b = pack.unpack_two_arguments(data, ca, cb)
    assert (a, b) == (va, vb)
    assert pack.pack_two_arguments(a, ca, b, cb) == data


@pytest.mark.parametrize("cb,vb", _SCALARS)
@pytest.mark.parametrize("ca,va", _SCALARS)
def test_binary_operation_cross_product(ca, va, cb, vb):
    pk = _FakeKey(b"PK" * 17)
    data = pack.pack_binary_operation(pk, va, ca, vb, cb)
    k, a, b = pack.unpack_binary_operation(
        data, pack.ObjectCodec(_FakeKey), ca, cb)
    assert k.payload == pk.payload
    assert (a, b) == (va, vb)
    assert pack.pack_binary_operation(k, a, ca, b, cb) == data


def test_real_ciphertext_through_framing():
    """Ciphertext/PublicKey objects through the framing (the bincode-object
    rows of the reference cross-product)."""
    from fhe_precompiles_tpu.bfv import BfvContext
    from fhe_precompiles_tpu.bfv.golden import Ciphertext
    from fhe_precompiles_tpu.encoding import encode_unsigned
    from fhe_precompiles_tpu.params import TESTNET_ONE
    import numpy as np
    ctx = BfvContext(TESTNET_ONE)
    pk, _ = ctx.generate_keys(seed=b"\x21" * 64, relin=False)
    ct = ctx.encrypt(encode_unsigned(3, TESTNET_ONE, 64), pk, b"\x22" * 64)
    codec = pack.ObjectCodec(Ciphertext)
    data = pack.pack_binary_operation(pk, ct, codec, 5, pack.U64)
    k, a, b = pack.unpack_binary_operation(
        data, pack.ObjectCodec(type(pk)), codec, pack.U64)
    assert np.array_equal(a.data, ct.data)
    assert b == 5
    assert np.array_equal(k.data, pk.data)
