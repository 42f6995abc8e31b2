"""Property/stress tests: random values through the full BFV pipeline.

Hunts BEHZ base-conversion edge cases and encoding carries that fixed-value
tests (16 op 4) cannot reach.
"""
import numpy as np
import pytest

from fhe_precompiles_tpu.bfv import BfvContext
from fhe_precompiles_tpu.encoding import (decode_frac64, decode_signed,
                                          decode_unsigned, encode_frac64,
                                          encode_signed, encode_unsigned)
from fhe_precompiles_tpu.params import TESTNET_ONE

P = TESTNET_ONE


@pytest.fixture(scope="module")
def ctx():
    return BfvContext(P)


@pytest.fixture(scope="module")
def keys(ctx):
    return ctx.generate_keys(seed=b"\xc1" * 64)


def test_random_u64_add_mul_stress(ctx, keys):
    pk, sk = keys
    rng = np.random.default_rng(0)
    for trial in range(8):
        # values sized so the product digits stay within the noise budget
        va = int(rng.integers(0, 1 << 31))
        vb = int(rng.integers(0, 1 << 31))
        a = ctx.encrypt(encode_unsigned(va, P, 64), pk,
                        bytes([trial + 1, 1]) * 32)
        b = ctx.encrypt(encode_unsigned(vb, P, 64), pk,
                        bytes([trial + 1, 2]) * 32)
        assert decode_unsigned(ctx.decrypt(ctx.add(a, b), sk), P, 64) \
            == va + vb
        got = decode_unsigned(
            ctx.decrypt(ctx.mul_relin(a, b, pk.relin), sk), P, 64)
        assert got == va * vb, (va, vb, got)


def test_u256_large_values(ctx, keys):
    pk, sk = keys
    va = (1 << 255) + 12345
    vb = (1 << 200) - 7
    a = ctx.encrypt(encode_unsigned(va, P, 256), pk, b"\xc2" * 64)
    b = ctx.encrypt(encode_unsigned(vb, P, 256), pk, b"\xc3" * 64)
    assert decode_unsigned(ctx.decrypt(ctx.add(a, b), sk), P, 256) == va + vb
    # subtraction across a large gap
    assert decode_unsigned(ctx.decrypt(ctx.sub(a, b), sk), P, 256) == va - vb


def test_signed_sign_combinations(ctx, keys):
    pk, sk = keys
    for i, (va, vb) in enumerate([(-7, -9), (7, -9), (-7, 9), (7, 9)]):
        a = ctx.encrypt(encode_signed(va, P), pk, bytes([0xd0 + i, 1]) * 32)
        b = ctx.encrypt(encode_signed(vb, P), pk, bytes([0xd0 + i, 2]) * 32)
        assert decode_signed(
            ctx.decrypt(ctx.mul_relin(a, b, pk.relin), sk), P) == va * vb
        assert decode_signed(ctx.decrypt(ctx.sub(a, b), sk), P) == va - vb


def test_frac64_products(ctx, keys):
    pk, sk = keys
    for i, (va, vb) in enumerate([(-2.5, 3.25), (0.125, -8.0),
                                  (1.0 / 1024, 1024.0)]):
        a = ctx.encrypt(encode_frac64(va, P), pk, bytes([0xe0 + i, 1]) * 32)
        b = ctx.encrypt(encode_frac64(vb, P), pk, bytes([0xe0 + i, 2]) * 32)
        got = decode_frac64(
            ctx.decrypt(ctx.mul_relin(a, b, pk.relin), sk), P)
        assert got == va * vb, (va, vb, got)


def test_repeated_additive_depth(ctx, keys):
    """Accumulate 200 additions -- linear noise growth must stay harmless."""
    pk, sk = keys
    acc = ctx.encrypt(encode_unsigned(1, P, 64), pk, b"\xf0" * 64)
    one = ctx.encrypt(encode_unsigned(1, P, 64), pk, b"\xf1" * 64)
    for _ in range(200):
        acc = ctx.add(acc, one)
    assert decode_unsigned(ctx.decrypt(acc, sk), P, 64) == 201


def test_two_multiplicative_levels(ctx, keys):
    """(a*b)*c: two sequential ct-ct multiplies within the noise budget."""
    pk, sk = keys
    a = ctx.encrypt(encode_unsigned(3, P, 64), pk, b"\xf2" * 64)
    b = ctx.encrypt(encode_unsigned(5, P, 64), pk, b"\xf3" * 64)
    c = ctx.encrypt(encode_unsigned(7, P, 64), pk, b"\xf4" * 64)
    ab = ctx.mul_relin(a, b, pk.relin)
    assert ctx.noise_budget_bits(ab, sk) > 10
    abc = ctx.mul_relin(ab, c, pk.relin)
    assert decode_unsigned(ctx.decrypt(abc, sk), P, 64) == 105


def test_behz_noise_bound_after_multiply():
    """Phase-level BEHZ oracle: the invariant that survives the RNS lifts is
    the *phase* noise -- round(t*phase(ct)/q) mod t must equal the product
    message with noise far below the decryption threshold.  (A direct
    coefficient-level comparison vs big-int round(t*c_ic_j/q) is vacuous:
    the m-tilde lift adds q-multiples whose t-scaled images are arbitrary
    mod q, so only the phase is comparable.)  noise_budget_bits computes
    exactly this residual via exact CRT big-int arithmetic.
    """
    ctx = BfvContext(P)
    pk, sk = ctx.generate_keys(seed=b"\xd9" * 64)
    rng = np.random.default_rng(9)
    for trial in range(4):
        va = int(rng.integers(1, 1 << 20))
        vb = int(rng.integers(1, 1 << 20))
        a = ctx.encrypt(encode_unsigned(va, P, 64), pk, bytes([trial, 5]) * 32)
        b = ctx.encrypt(encode_unsigned(vb, P, 64), pk, bytes([trial, 6]) * 32)
        prod3 = ctx.multiply(a, b)                 # before relinearization
        assert ctx.noise_budget_bits(prod3, sk) > 20
        prod2 = ctx.relinearize(prod3, pk.relin)
        assert ctx.noise_budget_bits(prod2, sk) > 20
        assert decode_unsigned(ctx.decrypt(prod2, sk), P, 64) == va * vb
