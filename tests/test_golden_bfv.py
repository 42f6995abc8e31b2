"""Golden-model BFV semantics: round-trips per op, determinism, noise.

Mirrors the reference's per-op round-trip test style (fhe.rs:1038-2076,
always 16 op 4 -> 20/12/64) plus determinism assertions (fhe.rs:2124-2140).
"""
import numpy as np
import pytest

from fhe_precompiles_tpu.bfv import BfvContext
from fhe_precompiles_tpu.encoding import (decode_frac64, decode_signed,
                                          decode_unsigned, encode_frac64,
                                          encode_signed, encode_unsigned)
from fhe_precompiles_tpu.params import BENCH_N1024, TESTNET_ONE


@pytest.fixture(scope="module")
def ctx():
    return BfvContext(TESTNET_ONE)


@pytest.fixture(scope="module")
def keys(ctx):
    return ctx.generate_keys(seed=b"\x11" * 64)


def test_encrypt_decrypt_roundtrip(ctx, keys):
    pk, sk = keys
    m = encode_unsigned(12, ctx.params, 256)
    ct = ctx.encrypt(m, pk, seed=b"\x22" * 64)
    assert decode_unsigned(ctx.decrypt(ct, sk), ctx.params, 256) == 12


def test_deterministic_encryption(ctx, keys):
    pk, _ = keys
    m = encode_unsigned(16, ctx.params, 256)
    a = ctx.encrypt(m, pk, seed=b"\x33" * 64)
    b = ctx.encrypt(m, pk, seed=b"\x33" * 64)
    assert np.array_equal(a.data, b.data)
    c = ctx.encrypt(m, pk, seed=b"\x34" * 64)
    assert not np.array_equal(a.data, c.data)


def test_transparent_zero_difference(ctx, keys):
    # same (value, seed) => identical ciphertexts whose difference decrypts
    # to zero (the reference's transparent-ciphertexts test, fhe.rs:2124-2140)
    pk, sk = keys
    m = encode_unsigned(16, ctx.params, 256)
    a = ctx.encrypt(m, pk, seed=b"\x35" * 64)
    b = ctx.encrypt(m, pk, seed=b"\x35" * 64)
    diff = ctx.sub(a, b)
    assert decode_unsigned(ctx.decrypt(diff, sk), ctx.params, 256) == 0


@pytest.mark.parametrize("ta,tb,expected,op", [
    (16, 4, 20, "add"), (16, 4, 12, "sub"), (16, 4, 64, "mul")])
def test_cipher_cipher_u256(ctx, keys, ta, tb, expected, op):
    pk, sk = keys
    a = ctx.encrypt(encode_unsigned(ta, ctx.params, 256), pk, seed=b"\x41" * 64)
    b = ctx.encrypt(encode_unsigned(tb, ctx.params, 256), pk, seed=b"\x42" * 64)
    if op == "add":
        out = ctx.add(a, b)
    elif op == "sub":
        out = ctx.sub(a, b)
    else:
        out = ctx.mul_relin(a, b, pk.relin)
    assert decode_unsigned(ctx.decrypt(out, sk), ctx.params, 256) == expected


def test_cipher_plain_ops(ctx, keys):
    pk, sk = keys
    P = ctx.params
    a = ctx.encrypt(encode_unsigned(16, P, 64), pk, seed=b"\x43" * 64)
    m4 = encode_unsigned(4, P, 64)
    assert decode_unsigned(ctx.decrypt(ctx.add_plain(a, m4), sk), P, 64) == 20
    assert decode_unsigned(ctx.decrypt(ctx.sub_plain(a, m4), sk), P, 64) == 12
    assert decode_unsigned(ctx.decrypt(ctx.mul_plain(a, m4), sk), P, 64) == 64
    # plain - cipher: 4 - 16 = -12 in signed world
    s = ctx.encrypt(encode_signed(16, P), pk, seed=b"\x44" * 64)
    out = ctx.plain_sub(encode_signed(4, P), s)
    assert decode_signed(ctx.decrypt(out, sk), P) == -12


def test_signed_ops(ctx, keys):
    pk, sk = keys
    P = ctx.params
    a = ctx.encrypt(encode_signed(-16, P), pk, seed=b"\x45" * 64)
    b = ctx.encrypt(encode_signed(4, P), pk, seed=b"\x46" * 64)
    assert decode_signed(ctx.decrypt(ctx.add(a, b), sk), P) == -12
    assert decode_signed(ctx.decrypt(ctx.mul_relin(a, b, pk.relin), sk),
                         P) == -64


def test_frac64_ops(ctx, keys):
    pk, sk = keys
    P = ctx.params
    a = ctx.encrypt(encode_frac64(16.5, P), pk, seed=b"\x47" * 64)
    b = ctx.encrypt(encode_frac64(4.25, P), pk, seed=b"\x48" * 64)
    assert decode_frac64(ctx.decrypt(ctx.add(a, b), sk), P) == 20.75
    assert decode_frac64(ctx.decrypt(ctx.sub(a, b), sk), P) == 12.25
    got = decode_frac64(ctx.decrypt(ctx.mul_relin(a, b, pk.relin), sk), P)
    assert got == 16.5 * 4.25


def test_noise_budget_positive_after_mul(ctx, keys):
    pk, sk = keys
    a = ctx.encrypt(encode_unsigned(7, ctx.params, 64), pk, seed=b"\x49" * 64)
    b = ctx.encrypt(encode_unsigned(9, ctx.params, 64), pk, seed=b"\x4a" * 64)
    fresh = ctx.noise_budget_bits(a, sk)
    after = ctx.noise_budget_bits(ctx.mul_relin(a, b, pk.relin), sk)
    assert fresh > 50
    assert 10 < after < fresh


def test_single_modulus_params_add():
    # BASELINE config 1: n=1024, single RNS modulus (no special prime)
    ctx = BfvContext(BENCH_N1024)
    pk, sk = ctx.generate_keys(seed=b"\x51" * 64, relin=False)
    a = ctx.encrypt(encode_unsigned(16, ctx.params, 64), pk, seed=b"\x52" * 64)
    b = ctx.encrypt(encode_unsigned(4, ctx.params, 64), pk, seed=b"\x53" * 64)
    assert decode_unsigned(ctx.decrypt(ctx.add(a, b), sk), ctx.params, 64) == 20


def test_fresh_keys_isolated(ctx, keys):
    # ciphertext under key A must not decrypt correctly under key B
    pk_a, _ = keys
    _, sk_b = ctx.generate_keys(seed=b"\x61" * 64, relin=False)
    ct = ctx.encrypt(encode_unsigned(16, ctx.params, 256), pk_a,
                     seed=b"\x62" * 64)
    got = ctx.decrypt(ct, sk_b)
    # decrypting with the wrong key yields garbage coefficients
    assert not np.array_equal(got, encode_unsigned(16, ctx.params, 256))


def test_n8192_four_limb_end_to_end():
    """BASELINE config 3 ring: n=8192, 4 key limbs (3 ct limbs) -- full
    golden pipeline including BEHZ multiply at the larger parameters."""
    from fhe_precompiles_tpu.params import BENCH_N8192
    ctx = BfvContext(BENCH_N8192)
    pk, sk = ctx.generate_keys(seed=b"\x81" * 64)
    a = ctx.encrypt(encode_unsigned(123456, BENCH_N8192, 64), pk, b"\x82" * 64)
    b = ctx.encrypt(encode_unsigned(789, BENCH_N8192, 64), pk, b"\x83" * 64)
    assert decode_unsigned(ctx.decrypt(ctx.add(a, b), sk),
                           BENCH_N8192, 64) == 124245
    got = decode_unsigned(ctx.decrypt(ctx.mul_relin(a, b, pk.relin), sk),
                          BENCH_N8192, 64)
    assert got == 123456 * 789


def test_testnet_two_candidate_preset():
    """Future-testnet preset (the testnet.rs `one` -> `two` registry
    pattern): n=8192, t=65537 (SIMD-capable), 3 ct limbs + special prime."""
    from fhe_precompiles_tpu.params import TESTNET_TWO_CANDIDATE as P2
    from fhe_precompiles_tpu.encoding import BatchEncoder
    assert (P2.t - 1) % (2 * P2.n) == 0
    ctx = BfvContext(P2)
    pk, sk = ctx.generate_keys(seed=b"\x91" * 64)
    a = ctx.encrypt(encode_unsigned(1234567, P2, 64), pk, b"\x92" * 64)
    b = ctx.encrypt(encode_unsigned(89, P2, 64), pk, b"\x93" * 64)
    prod = ctx.mul_relin(a, b, pk.relin)
    assert decode_unsigned(ctx.decrypt(prod, sk), P2, 64) == 1234567 * 89
    assert ctx.noise_budget_bits(prod, sk) > 60  # deep budget at n=8192
    enc = BatchEncoder(P2)
    vals = np.arange(enc.slot_count, dtype=np.uint64) % 1000
    ca = ctx.encrypt(enc.encode(vals), pk, b"\x94" * 64)
    out = enc.decode(ctx.decrypt(ctx.mul_relin(ca, ca, pk.relin), sk))
    assert np.array_equal(out, vals * vals % np.uint64(P2.t))


def test_noise_budget_uint128_matches_object_math(ctx, keys):
    """The division-free uint128 noise CRT must equal exact big-int math."""
    import math
    from fhe_precompiles_tpu.bfv.modmath import mulmod
    pk, sk = keys
    ct = ctx.encrypt(np.arange(ctx.n, dtype=np.uint64) % 2, pk, b"\x31" * 64)
    ct2 = ctx.mul_relin(
        ct, ctx.encrypt(np.ones(ctx.n, dtype=np.uint64), pk, b"\x32" * 64),
        pk.relin)
    for c in (ct, ct2):
        dot = ctx._dot_with_secret(c, sk)
        x = np.zeros(ctx.n, dtype=object)
        for j, p in enumerate(ctx.q_mods):
            y = mulmod(dot[j], np.uint64(ctx.q_hat_inv[j]), p).astype(object)
            x += y * ctx.q_hat[j]
        x %= ctx.q
        t, q = ctx.t, ctx.q
        m = (t * x + q // 2) // q % t
        scaled = (q * m.astype(object) + t // 2) // t
        noise = (x - scaled) % q
        centered = np.where(noise > q // 2, noise - q, noise)
        worst = max(1, max(abs(int(v)) for v in centered))
        expect = math.log2(q) - 1 - math.log2(worst)
        assert ctx.noise_budget_bits(c, sk) == expect
