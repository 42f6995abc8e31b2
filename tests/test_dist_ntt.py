"""Distributed (coefficient-sharded) NTT: bit-exact vs the local transform."""
import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from fhe_precompiles_tpu.ops.ntt import build_tables, intt, ntt
from fhe_precompiles_tpu.parallel.dist_ntt import (make_distributed_ntt,
                                                   shard_coeff_axis)

MODS = [0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001]

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _mesh(d, name="sp"):
    return Mesh(np.array(jax.devices()[:d]), axis_names=(name,))


@needs8
@pytest.mark.parametrize("D", [2, 4, 8])
def test_forward_matches_local(D):
    n = 512
    tb = build_tables(MODS, n)
    rng = np.random.default_rng(D)
    a = np.stack([rng.integers(0, p, size=n, dtype=np.uint64) for p in MODS])
    mesh = _mesh(D)
    dntt, _ = make_distributed_ntt(tb, mesh)
    got = np.asarray(dntt(shard_coeff_axis(a, mesh)))
    want = np.asarray(ntt(a, tb))
    assert np.array_equal(got, want)


@needs8
@pytest.mark.parametrize("D", [2, 4, 8])
def test_inverse_matches_local_and_roundtrips(D):
    n = 512
    tb = build_tables(MODS, n)
    rng = np.random.default_rng(10 + D)
    a = np.stack([rng.integers(0, p, size=n, dtype=np.uint64) for p in MODS])
    mesh = _mesh(D)
    dntt, dintt = make_distributed_ntt(tb, mesh)
    fwd = np.asarray(ntt(a, tb))
    got = np.asarray(dintt(shard_coeff_axis(fwd, mesh)))
    want = np.asarray(intt(fwd, tb))
    assert np.array_equal(got, want)
    assert np.array_equal(got, a)
    # full distributed round-trip
    rt = np.asarray(dintt(dntt(shard_coeff_axis(a, mesh))))
    assert np.array_equal(rt, a)


@needs8
def test_batched_leading_dims():
    n, D = 256, 4
    tb = build_tables(MODS[:2], n)
    rng = np.random.default_rng(3)
    a = np.stack([np.stack([rng.integers(0, p, size=n, dtype=np.uint64)
                            for p in MODS[:2]]) for _ in range(5)])
    mesh = _mesh(D)
    dntt, _ = make_distributed_ntt(tb, mesh)
    got = np.asarray(dntt(shard_coeff_axis(a, mesh)))
    assert np.array_equal(got, np.asarray(ntt(a, tb)))
