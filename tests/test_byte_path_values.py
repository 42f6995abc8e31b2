"""Value-edge coverage through the full precompile byte path.

The reference's own tests only exercise 16 op 4 (fhe.rs:2309-2338); these
push the encoding semantics that actually differ per type -- negative i64
(t-complement digits), fractional/negative frac64 (negacyclic wrap),
large u256 -- through encrypt_* -> binary op -> decrypt_* round trips
under the network key.
"""
import struct

import pytest

from fhe_precompiles_tpu import pack
from fhe_precompiles_tpu.app import _CT_CODEC
from fhe_precompiles_tpu.bfv.golden import Ciphertext
from fhe_precompiles_tpu.testnet import one

FHE = one.FHE
SCALARS = {"u256": pack.U256, "u64": pack.U64, "i64": pack.I64,
           "frac64": pack.FRAC64}

CASES = [
    # (tname, a, b, op, expected)
    ("i64", -16, 4, "add", -12),
    ("i64", -16, 4, "mul", -64),
    ("i64", 16, -4, "sub", 20),
    ("i64", -(1 << 40), 3, "mul", -(3 << 40)),
    ("frac64", 2.5, 1.5, "mul", 3.75),
    ("frac64", 0.125, 0.25, "add", 0.375),
    ("frac64", -2.25, 0.5, "mul", -1.125),
    ("frac64", 1.0, -3.5, "sub", 4.5),
    ("u256", 1 << 200, 1 << 55, "mul", 1 << 255),
    ("u256", (1 << 256) - 2, 1, "add", (1 << 256) - 1),
    ("u64", (1 << 63), 2, "sub", (1 << 63) - 2),
]


def _network_encrypt(tname, value, tag):
    data = pack.pack_two_arguments(value, SCALARS[tname],
                                   tag.encode(), pack.BYTES)
    code, out = FHE.call(f"encrypt_{tname}", data)
    assert code == 0, f"encrypt failed: {code}"
    return Ciphertext.from_bytes(out)


@pytest.mark.parametrize("tname,a,b,op,expected", CASES)
def test_value_edge_byte_roundtrip(tname, a, b, op, expected):
    ct_a = _network_encrypt(tname, a, f"a{op}")
    ct_b = _network_encrypt(tname, b, f"b{op}")
    data = pack.pack_binary_operation(FHE.public_key, ct_a, _CT_CODEC,
                                      ct_b, _CT_CODEC)
    code, out = FHE.call(f"{op}_cipher{tname}_cipher{tname}", data)
    assert code == 0, f"{op} failed: {code}"
    code, plain = FHE.call(f"decrypt_{tname}",
                           pack.pack_one_argument(
                               Ciphertext.from_bytes(out), _CT_CODEC))
    assert code == 0, f"decrypt failed: {code}"
    got = SCALARS[tname].deserialize(plain)
    assert got == expected, f"{tname} {a} {op} {b}: {got} != {expected}"


def test_u256_mul_overflowing_result_fails_decode():
    """(2^255)*(2) exceeds u256: encode digits carry past bit 255; the
    decode must reject rather than silently wrap (reference: conversion
    error inside decrypt -> FailedDecryption 5)."""
    ct_a = _network_encrypt("u256", 1 << 255, "ovfa")
    ct_b = _network_encrypt("u256", 2, "ovfb")
    data = pack.pack_binary_operation(FHE.public_key, ct_a, _CT_CODEC,
                                      ct_b, _CT_CODEC)
    code, out = FHE.call("mul_cipheru256_cipheru256", data)
    assert code == 0
    code, _ = FHE.call("decrypt_u256",
                       pack.pack_one_argument(
                           Ciphertext.from_bytes(out), _CT_CODEC))
    assert code == 5


def test_frac64_scalar_codec_is_ieee_be():
    """FHESerialize for Fractional = f64 BE bits (pack.rs:91-104)."""
    assert SCALARS["frac64"].serialize(-2.25) == struct.pack(">d", -2.25)
