"""MXU (four-step matmul) NTT: bit-exactness vs the stage NTT / golden model."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fhe_precompiles_tpu.ops.mxu_ntt import build_mxu_tables
from fhe_precompiles_tpu.ops import mxu_ntt
from fhe_precompiles_tpu.ops.ntt import build_tables, intt as sintt, ntt as sntt

MODS = (0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001)


def test_forward_inverse_bitexact_n16384():
    # MODS above are 2*4096-friendly only; pick 32768-friendly primes
    from fhe_precompiles_tpu.params import ntt_friendly_primes
    n, C = 16384, 128
    mods = tuple(ntt_friendly_primes(n, 2, below=1 << 37))
    mtb = build_mxu_tables(mods, n, C)
    stb = build_tables(list(mods), n)
    rng = np.random.default_rng(n)
    a = np.stack([np.stack([rng.integers(0, p, size=n, dtype=np.uint64)
                            for p in mods]) for _ in range(2)])
    fw_m = np.asarray(jax.jit(lambda x: mxu_ntt.ntt(x, mtb))(jnp.asarray(a)))
    fw_s = np.asarray(jax.jit(lambda x: sntt(x, stb))(jnp.asarray(a)))
    assert np.array_equal(fw_m, fw_s)
    iv_m = np.asarray(jax.jit(lambda x: mxu_ntt.intt(x, mtb))(
        jnp.asarray(fw_m)))
    assert np.array_equal(iv_m, a)


@pytest.mark.parametrize("n,C", [(256, 16), (1024, 32), (4096, 64)])
def test_forward_inverse_bitexact(n, C):
    mtb = build_mxu_tables(MODS, n, C)
    stb = build_tables(MODS, n)
    rng = np.random.default_rng(n)
    a = np.stack([np.stack([rng.integers(0, p, size=n, dtype=np.uint64)
                            for p in MODS]) for _ in range(3)])
    fw_m = np.asarray(jax.jit(lambda x: mxu_ntt.ntt(x, mtb))(jnp.asarray(a)))
    fw_s = np.asarray(jax.jit(lambda x: sntt(x, stb))(jnp.asarray(a)))
    assert np.array_equal(fw_m, fw_s)
    iv_m = np.asarray(jax.jit(lambda x: mxu_ntt.intt(x, mtb))(
        jnp.asarray(fw_s)))
    iv_s = np.asarray(jax.jit(lambda x: sintt(x, stb))(jnp.asarray(fw_s)))
    assert np.array_equal(iv_m, iv_s)
    assert np.array_equal(iv_m, a)


def test_nonsquare_split():
    # n = 512 as 32 x 16
    n, C = 512, 16
    mtb = build_mxu_tables(MODS[:2], n, C)
    stb = build_tables(MODS[:2], n)
    rng = np.random.default_rng(1)
    a = np.stack([rng.integers(0, p, size=n, dtype=np.uint64)
                  for p in MODS[:2]])
    fw_m = np.asarray(jax.jit(lambda x: mxu_ntt.ntt(x, mtb))(jnp.asarray(a)))
    assert np.array_equal(fw_m, np.asarray(sntt(jnp.asarray(a), stb)))
