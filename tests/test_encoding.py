"""Plaintext encoding round-trips and overflow behavior."""
import numpy as np
import pytest

from fhe_precompiles_tpu import encoding
from fhe_precompiles_tpu.errors import FheError, FheErrorCode
from fhe_precompiles_tpu.params import TESTNET_ONE

P = TESTNET_ONE


@pytest.mark.parametrize("v", [0, 1, 12, 16, 20, (1 << 64) - 1])
def test_u64_roundtrip(v):
    c = encoding.encode_unsigned(v, P, 64)
    assert encoding.decode_unsigned(c, P, 64) == v


@pytest.mark.parametrize("v", [0, 12, 1 << 200, (1 << 256) - 1])
def test_u256_roundtrip(v):
    c = encoding.encode_unsigned(v, P, 256)
    assert encoding.decode_unsigned(c, P, 256) == v


@pytest.mark.parametrize("v", [0, 16, -16, 12345, -(1 << 62), (1 << 62)])
def test_i64_roundtrip(v):
    c = encoding.encode_signed(v, P)
    assert encoding.decode_signed(c, P) == v


@pytest.mark.parametrize("v", [0.0, 16.0, -16.0, 0.5, -0.25, 3.141592653589793,
                               1e-30, 12.0, 1234.5678])
def test_frac64_roundtrip(v):
    c = encoding.encode_frac64(v, P)
    assert encoding.decode_frac64(c, P) == v


def test_unsigned_overflow_on_encode():
    with pytest.raises(FheError) as e:
        encoding.encode_unsigned(1 << 64, P, 64)
    assert e.value.code == FheErrorCode.OVERFLOW


def test_unsigned_overflow_on_decode():
    # a polynomial representing a negative value cannot decode as unsigned
    c = encoding.encode_signed(-1, P)
    with pytest.raises(FheError) as e:
        encoding.decode_unsigned(c, P, 64)
    assert e.value.code == FheErrorCode.OVERFLOW


def test_digit_carry_decoding():
    # after homomorphic ops digits exceed one bit: 3*2^0 + 2*2^1 = 7
    c = np.zeros(P.n, dtype=np.uint64)
    c[0], c[1] = 3, 2
    assert encoding.decode_unsigned(c, P, 64) == 7


def test_signed_digit_subtraction_pattern():
    # 16 - 4 as raw digit arithmetic: c4=1, c2=-1 -> 12
    t = P.t
    c = np.zeros(P.n, dtype=np.uint64)
    c[4], c[2] = 1, t - 1
    assert encoding.decode_unsigned(c, P, 64) == 12
