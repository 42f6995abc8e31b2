"""Golden-model NTT correctness: roundtrip, naive convolution, batching."""
import numpy as np
import pytest

from fhe_precompiles_tpu.bfv.modmath import (get_ntt_tables,
                                             minimal_primitive_root, mulmod)
from fhe_precompiles_tpu.bfv.ntt import intt, negacyclic_mulmod, ntt

PRIMES = [0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001]


def naive_negacyclic(a, b, p, n):
    c = np.zeros(n, dtype=object)
    for i in range(n):
        ai = int(a[i])
        if not ai:
            continue
        for j in range(n):
            k, s = (i + j, 1) if i + j < n else (i + j - n, -1)
            c[k] = (c[k] + s * ai * int(b[j])) % p
    return c.astype(np.uint64)


@pytest.mark.parametrize("p", PRIMES)
def test_roundtrip(p):
    n = 256
    tb = get_ntt_tables(p, n)
    rng = np.random.default_rng(1)
    a = rng.integers(0, p, size=n, dtype=np.uint64)
    assert np.array_equal(intt(ntt(a, tb), tb), a)


def test_negacyclic_convolution_matches_naive():
    p, n = PRIMES[0], 64
    rng = np.random.default_rng(2)
    a = rng.integers(0, p, size=n, dtype=np.uint64)
    b = rng.integers(0, p, size=n, dtype=np.uint64)
    assert np.array_equal(negacyclic_mulmod(a, b, p, n),
                          naive_negacyclic(a, b, p, n))


def test_batched_transform_matches_loop():
    p, n = PRIMES[1], 128
    tb = get_ntt_tables(p, n)
    rng = np.random.default_rng(3)
    batch = rng.integers(0, p, size=(4, 3, n), dtype=np.uint64)
    out = ntt(batch, tb)
    for i in range(4):
        for j in range(3):
            assert np.array_equal(out[i, j], ntt(batch[i, j], tb))
    assert np.array_equal(intt(out, tb), batch)


def test_mulmod_exact_vs_bigint():
    p = PRIMES[2]
    rng = np.random.default_rng(4)
    a = rng.integers(0, p, size=1000, dtype=np.uint64)
    b = rng.integers(0, p, size=1000, dtype=np.uint64)
    got = mulmod(a, b, p)
    want = np.array([int(x) * int(y) % p for x, y in zip(a, b)],
                    dtype=np.uint64)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("p", PRIMES)
def test_minimal_primitive_root_properties(p):
    n = 4096
    psi = minimal_primitive_root(2 * n, p)
    assert pow(psi, n, p) == p - 1          # psi^n = -1 (negacyclic)
    assert pow(psi, 2 * n, p) == 1
    # minimality: no smaller element with the same order (spot-check a few)
    for cand in range(2, min(psi, 2000)):
        if pow(cand, n, p) == p - 1 and pow(cand, 2 * n, p) == 1:
            pytest.fail(f"{cand} < {psi} is also a primitive 2n-th root")
