"""Fused Pallas four-step NTT kernel: bit-exactness (interpret mode on CPU;
the compiled path is exercised on real TPU by benchmarks/report.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fhe_precompiles_tpu.ops.ntt import build_tables, intt as sintt, ntt as sntt
from fhe_precompiles_tpu.ops.pallas_ntt import PallasNtt

MODS = (0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001)


@pytest.fixture(scope="module")
def setup():
    n = 256
    pn = PallasNtt(MODS, n, C=16, tb=4, interpret=True)
    stb = build_tables(MODS, n)
    rng = np.random.default_rng(0)
    a = np.stack([np.stack([rng.integers(0, p, size=n, dtype=np.uint64)
                            for p in MODS]) for _ in range(5)])
    return pn, stb, a


def test_forward_bitexact(setup):
    pn, stb, a = setup
    fw = np.asarray(pn.ntt(jnp.asarray(a)))
    assert np.array_equal(fw, np.asarray(sntt(jnp.asarray(a), stb)))


def test_inverse_bitexact_and_roundtrip(setup):
    pn, stb, a = setup
    fw = np.asarray(sntt(jnp.asarray(a), stb))
    iv = np.asarray(pn.intt(jnp.asarray(fw)))
    assert np.array_equal(iv, np.asarray(sintt(jnp.asarray(fw), stb)))
    assert np.array_equal(iv, a)
    rt = np.asarray(pn.intt(pn.ntt(jnp.asarray(a))))
    assert np.array_equal(rt, a)


def test_batch_padding(setup):
    # batch 5 with tb=4 pads internally to 8 and slices back
    pn, stb, a = setup
    single = np.asarray(pn.ntt(jnp.asarray(a[:1])))
    batch = np.asarray(pn.ntt(jnp.asarray(a)))
    assert np.array_equal(single[0], batch[0])
