"""seal_compat unit tests: blake2xb, PRNG, samplers, deterministic encrypt.

The BLAKE2b compression core is cross-validated against hashlib on every
parameter set hashlib can express; the XOF construction follows the
BLAKE2X spec / SEAL's blake2xb.c (docs/GOLDEN_SEARCH_LOG.md).
"""
import hashlib
import os

import numpy as np
import pytest

from fhe_precompiles_tpu.seal_compat import (Blake2xbPrng, blake2xb,
                                             sample_poly_cbd,
                                             sample_poly_ternary)
from fhe_precompiles_tpu.seal_compat.blake2xb import (_blake2b_single,
                                                      _param_words)
from fhe_precompiles_tpu.seal_compat.encryptor import encrypt_deterministic
from fhe_precompiles_tpu.testnet import one

FHE = one.FHE


@pytest.mark.parametrize("dlen", [64, 48, 20, 1])
@pytest.mark.parametrize("klen", [0, 16, 64])
@pytest.mark.parametrize("mlen", [0, 7, 64, 127, 128, 129, 1000])
def test_blake2b_core_matches_hashlib(dlen, klen, mlen):
    data, key = os.urandom(mlen), os.urandom(klen)
    params = _param_words(dlen, klen, 1, 1, 0, 0, 0, 0)
    assert (_blake2b_single(data, key, params, dlen)
            == hashlib.blake2b(data, digest_size=dlen, key=key).digest())


def test_blake2b_tree_params_match_hashlib():
    params = _param_words(64, 0, 3, 2, 77, (1 << 40) | 9, 1, 32)
    ref = hashlib.blake2b(b"xyz", digest_size=64, fanout=3, depth=2,
                          leaf_size=77, node_offset=(1 << 40) | 9,
                          node_depth=1, inner_size=32).digest()
    assert _blake2b_single(b"xyz", b"", params, 64) == ref


def test_blake2xb_properties():
    out = blake2xb(4096, b"\x00" * 8, b"\x01" * 64)
    assert len(out) == 4096
    assert out == blake2xb(4096, b"\x00" * 8, b"\x01" * 64)
    assert out != blake2xb(4096, b"\x01" * 8, b"\x01" * 64)
    # different xof length => completely different output (length in params)
    assert blake2xb(64, b"\x00" * 8, b"\x01" * 64) != out[:64]
    # non-multiple-of-64 output lengths
    assert blake2xb(100, b"a", b"")[:64] != blake2xb(100, b"b", b"")[:64]
    assert len(blake2xb(100, b"a", b"")) == 100


def test_prng_stream_is_stateless_chunking():
    seed = os.urandom(64)
    a = Blake2xbPrng(seed)
    b = Blake2xbPrng(seed)
    chunks = [a.generate(n) for n in (1, 3, 4093, 4096, 10000)]
    whole = b.generate(1 + 3 + 4093 + 4096 + 10000)
    assert b"".join(chunks) == whole


def test_samplers_shape_and_range():
    prng = Blake2xbPrng(b"\x07" * 64)
    u = sample_poly_ternary(prng, 4096)
    assert set(np.unique(u)).issubset({-1, 0, 1})
    e = sample_poly_cbd(prng, 4096)
    assert e.min() >= -21 and e.max() <= 21
    # ~binomial(21, 1/2) centered: std close to sqrt(21/2) ~ 3.24
    assert 2.8 < e.std() < 3.7


def test_seal_compat_encrypt_decrypts_and_is_deterministic():
    from fhe_precompiles_tpu.encoding import PLAIN_TYPES
    poly = PLAIN_TYPES["u256"].encode(12, FHE.params)
    seed = hashlib.sha512(b"seal-compat").digest()
    ct1 = encrypt_deterministic(FHE.ctx, poly, FHE.public_key, seed)
    ct2 = encrypt_deterministic(FHE.ctx, poly, FHE.public_key, seed)
    assert np.array_equal(ct1.data, ct2.data)
    dec = PLAIN_TYPES["u256"].decode(FHE.ctx.decrypt(ct1, FHE.private_key),
                                     FHE.params)
    assert dec == 12
