"""Pipeline-parallel chain correctness: staged == sequential, bit-exact."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fhe_precompiles_tpu.bfv.golden import BfvContext
from fhe_precompiles_tpu.encoding import PLAIN_TYPES
from fhe_precompiles_tpu.ops.engine import JaxEngine
from fhe_precompiles_tpu.params import Params, TESTNET_ONE
from fhe_precompiles_tpu.parallel.pipeline import pipeline_chain

SMALL = Params(poly_modulus_degree=512,
               coeff_modulus=TESTNET_ONE.coeff_modulus,
               plain_modulus=4096)


@pytest.fixture(scope="module")
def setup():
    ctx = BfvContext(SMALL)
    eng = JaxEngine(SMALL, golden=ctx)
    pk, sk = ctx.generate_keys(seed=b"\x21" * 64)
    return ctx, eng, pk, sk


def test_pipeline_chain_matches_sequential(setup):
    ctx, eng, pk, sk = setup
    P = 4
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:P]).reshape(P),
                             axis_names=("pp",))
    M = 6
    mbs = np.stack([
        ctx.encrypt(PLAIN_TYPES["u64"].encode(2, SMALL), pk,
                    bytes([m + 1]) * 64).data[None]
        for m in range(M)])                       # (M, 1, 2, k, n)
    rk = jnp.asarray(pk.relin.data)

    def stage(x, rk):
        return eng._mul_relin.__wrapped__(x, x, rk)[:, :2]

    out = pipeline_chain(stage, mesh, jnp.asarray(mbs), rk)
    # sequential reference: P squarings of each microbatch
    for m in range(M):
        want = mbs[m]
        for _ in range(P):
            want = np.asarray(stage(jnp.asarray(want), rk))
        assert np.array_equal(np.asarray(out[m]), want), f"microbatch {m}"
