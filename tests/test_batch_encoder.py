"""SIMD slot-packing tests (BASELINE config 3: packed slot arithmetic)."""
import numpy as np
import pytest

from fhe_precompiles_tpu.bfv import BfvContext
from fhe_precompiles_tpu.encoding import BatchEncoder
from fhe_precompiles_tpu.params import BENCH_N8192, TESTNET_ONE, Params

# small packed-friendly params for fast tests: t prime, t = 1 (mod 2n)
PACKED_SMALL = Params(
    poly_modulus_degree=256,
    coeff_modulus=(0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001),
    plain_modulus=7681)  # 7681 = 15*512 + 1, prime


def test_testnet_params_reject_packing():
    with pytest.raises(ValueError):
        BatchEncoder(TESTNET_ONE)  # t=4096 is not 1 mod 2n


def test_encode_decode_roundtrip():
    enc = BatchEncoder(PACKED_SMALL)
    rng = np.random.default_rng(0)
    vals = rng.integers(0, PACKED_SMALL.t, size=enc.slot_count,
                        dtype=np.uint64)
    assert np.array_equal(enc.decode(enc.encode(vals)), vals)


def test_homomorphic_slotwise_add_mul():
    ctx = BfvContext(PACKED_SMALL)
    enc = BatchEncoder(PACKED_SMALL)
    pk, sk = ctx.generate_keys(seed=b"\xb1" * 64)
    rng = np.random.default_rng(1)
    t = PACKED_SMALL.t
    va = rng.integers(0, 50, size=enc.slot_count, dtype=np.uint64)
    vb = rng.integers(0, 50, size=enc.slot_count, dtype=np.uint64)
    ca = ctx.encrypt(enc.encode(va), pk, b"\xb2" * 64)
    cb = ctx.encrypt(enc.encode(vb), pk, b"\xb3" * 64)

    got_add = enc.decode(ctx.decrypt(ctx.add(ca, cb), sk))
    assert np.array_equal(got_add, (va + vb) % t)

    got_mul = enc.decode(ctx.decrypt(ctx.mul_relin(ca, cb, pk.relin), sk))
    assert np.array_equal(got_mul, (va * vb) % t)


def test_bench_n8192_params_support_packing():
    # construction-level check only (full 8192 ops run in bench, not tests)
    t = BENCH_N8192.t
    assert (t - 1) % (2 * BENCH_N8192.n) == 0
    for p in BENCH_N8192.coeff_modulus:
        assert (p - 1) % (2 * BENCH_N8192.n) == 0
