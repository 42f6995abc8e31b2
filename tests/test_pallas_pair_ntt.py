"""Bit-exactness of the VMEM-resident Pallas pair NTT (interpret mode on
CPU; the kernel was additionally verified bit-equal and benchmarked on a
real v5e -- it measured ~1.0x the XLA stage path, kept as an alternate
formulation with the analysis recorded in benchmarks/RESULTS.md)."""
import numpy as np
import pytest

from fhe_precompiles_tpu.bfv import BfvContext
from fhe_precompiles_tpu.ops import pair as pr
from fhe_precompiles_tpu.ops.ntt_pair import (build_pair_tables, intt_pair,
                                              ntt_pair)
from fhe_precompiles_tpu.ops.pallas_pair_ntt import PairPallasNtt
from fhe_precompiles_tpu.params import TESTNET_ONE

G = BfvContext(TESTNET_ONE)
RNG = np.random.default_rng(11)


@pytest.mark.parametrize("n", [256, 1024])
def test_pallas_pair_ntt_matches_stage(n):
    mods = G.q_mods + G.Bsk
    x = np.stack([
        np.stack([RNG.integers(0, p, size=(n,), dtype=np.uint64)
                  for p in mods]) for _ in range(3)])
    xp = pr.split64(x)
    tbp = build_pair_tables(mods, n)
    pp = PairPallasNtt(mods, n, tb=2, interpret=True)
    got_f = pp.ntt(xp)
    ref_f = ntt_pair(xp, tbp)
    for a, b in zip(got_f, ref_f):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    got_b = pp.intt(got_f)
    ref_b = intt_pair(ref_f, tbp)
    for a, b in zip(got_b, ref_b):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_pallas_pair_ntt_tscaled():
    n = 256
    mods = G.q_mods
    t = TESTNET_ONE.t
    x = np.stack([
        np.stack([RNG.integers(0, p, size=(n,), dtype=np.uint64)
                  for p in mods]) for _ in range(2)])
    xp = pr.split64(x)
    tbp = build_pair_tables(mods, n, n_inv_factors=[t] * len(mods))
    pp = PairPallasNtt(mods, n, tb=2, interpret=True,
                       n_inv_factors=[t] * len(mods))
    for a, b in zip(pp.intt(xp), intt_pair(xp, tbp)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
