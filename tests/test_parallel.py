"""Mesh sharding + batched request-stream tests on the 8-device virtual mesh.

Determinism across shardings doubles as the race detector (SURVEY.md
section 5): sharded results must be bit-identical to unsharded golden ones.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fhe_precompiles_tpu.bfv import BfvContext
from fhe_precompiles_tpu.bfv.golden import Ciphertext
from fhe_precompiles_tpu.encoding import (decode_signed, decode_unsigned,
                                          encode_unsigned)
from fhe_precompiles_tpu.ops.engine import JaxEngine
from fhe_precompiles_tpu.parallel import RequestStream, make_mesh
from fhe_precompiles_tpu.parallel.stream import Request
from fhe_precompiles_tpu.params import Params

# small ring for fast compiles; testnet moduli are 1 mod 2n for any n <= 4096
SMALL = Params(poly_modulus_degree=256,
               coeff_modulus=(0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001),
               plain_modulus=4096)

needs_devices = pytest.mark.skipif(len(jax.devices()) < 8,
                                   reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def ctx():
    return BfvContext(SMALL)


@pytest.fixture(scope="module")
def eng(ctx):
    return JaxEngine(SMALL, golden=ctx)


@pytest.fixture(scope="module")
def keys(ctx):
    return ctx.generate_keys(seed=b"\xa1" * 64)


@pytest.fixture(scope="module")
def sample_cts(ctx, keys):
    pk, _ = keys
    return [ctx.encrypt(encode_unsigned(v, SMALL, 64), pk,
                        bytes([v]) * 64) for v in (2, 3, 4, 5)]


def test_make_mesh_shapes():
    mesh = make_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    mesh = make_mesh(tp=2)
    assert mesh.shape["dp"] * 2 == len(jax.devices())
    with pytest.raises(ValueError):
        make_mesh(dp=100, tp=100)


@needs_devices
def test_stream_unsharded_vs_sharded_bitexact(ctx, eng, keys, sample_cts):
    pk, sk = keys
    reqs = RequestStream(eng).make_mixed_requests(sample_cts, 24, seed=7)

    plain_results = RequestStream(eng, mesh=None).run(reqs, pk)

    mesh = make_mesh(dp=4, tp=2)
    sharded = RequestStream(eng, mesh=mesh, shard_limbs=True).run(reqs, pk)

    vals = {2, 3, 4, 5}
    for r, a, b in zip(reqs, plain_results, sharded):
        assert np.array_equal(a, b), "sharded result differs from unsharded"
    # spot-check correctness of a mul result
    idx = next(i for i, r in enumerate(reqs) if r.op == "mul")
    va = decode_unsigned(ctx.decrypt(
        Ciphertext(SMALL, reqs[idx].a), sk), SMALL, 64)
    vb = decode_unsigned(ctx.decrypt(
        Ciphertext(SMALL, reqs[idx].b), sk), SMALL, 64)
    got = decode_unsigned(ctx.decrypt(
        Ciphertext(SMALL, plain_results[idx]), sk), SMALL, 64)
    assert got == va * vb


@needs_devices
def test_dp_only_sharding_add(ctx, eng, keys, sample_cts):
    pk, sk = keys
    mesh = make_mesh(dp=8, tp=1)
    reqs = [Request("add", sample_cts[0].data, sample_cts[1].data)
            for _ in range(8)]
    out = RequestStream(eng, mesh=mesh).run(reqs, pk)
    for o in out:
        got = decode_unsigned(ctx.decrypt(Ciphertext(SMALL, o), sk), SMALL, 64)
        assert got == 5


def test_mixed_request_synthesis(eng, sample_cts):
    reqs = RequestStream(eng).make_mixed_requests(sample_cts, 100, seed=3)
    ops = {r.op for r in reqs}
    assert ops <= {"add", "sub", "mul"}
    assert len(reqs) == 100


def test_run_pooled_batches_match_plain(ctx, eng, keys, sample_cts):
    pk, sk = keys
    pool = np.stack([c.data for c in sample_cts])
    rng = np.random.default_rng(5)
    NREQ = 20
    ops = list(rng.choice(["add", "sub", "mul"], size=NREQ))
    idx = rng.integers(0, len(sample_cts), size=(NREQ, 2))
    batches = RequestStream(eng, max_batch=8).run_pooled(ops, idx, pool, pk)
    vals = [2, 3, 4, 5]
    for chunk, arr in batches:
        arr = np.asarray(arr)
        for slot, i in enumerate(chunk):
            va, vb = vals[idx[i][0]], vals[idx[i][1]]
            want = {"add": va + vb, "sub": va - vb, "mul": va * vb}[ops[i]]
            got = decode_signed(ctx.decrypt(
                Ciphertext(SMALL, arr[slot]), sk), SMALL)
            assert got == want, (ops[i], va, vb, got)


def test_run_pooled_fused_matches_plain(ctx, eng, keys, sample_cts):
    pk, sk = keys
    pool = np.stack([c.data for c in sample_cts])
    rng = np.random.default_rng(6)
    NREQ = 20
    ops = list(rng.choice(["add", "mul"], size=NREQ))
    idx = rng.integers(0, len(sample_cts), size=(NREQ, 2))
    res = RequestStream(eng, max_batch=8).run_pooled_fused(ops, idx, pool, pk)
    vals = [2, 3, 4, 5]
    for op, (idxs, arr) in res.items():
        arr = np.asarray(arr)
        assert arr.shape[0] == len(idxs)
        for slot, i in enumerate(idxs):
            va, vb = vals[idx[i][0]], vals[idx[i][1]]
            want = {"add": va + vb, "sub": va - vb, "mul": va * vb}[op]
            got = decode_signed(ctx.decrypt(
                Ciphertext(SMALL, arr[slot]), sk), SMALL)
            assert got == want


def test_multihost_helpers_single_host():
    from fhe_precompiles_tpu.parallel import multihost
    # single-host: initialize must be a no-op, mesh spans local devices
    multihost.initialize()
    assert multihost.is_primary()
    mesh = multihost.global_mesh(tp=2)
    assert mesh.shape["dp"] * mesh.shape["tp"] == len(jax.devices())
    with pytest.raises(ValueError):
        multihost.global_mesh(dp=3, tp=3)  # 9 != 8 devices


def test_dryrun_flagship():
    """The driver's multichip dryrun at the REAL testnet-one shapes
    (n=4096, 2 ct limbs + special prime): sharded-compile or collective-
    layout regressions at production shapes must not hide behind the
    fast-compile tiny ring.  Compiles persist to the JAX cache, so the
    first run pays them once."""
    import subprocess
    import sys
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8, flagship=True)"],
        capture_output=True, text=True, timeout=3000, cwd=repo,
        env={**os.environ, "PYTHONPATH": repo})
    assert res.returncode == 0, res.stderr[-2000:]
    assert "dryrun_multichip OK" in res.stdout
    assert "testnet.one n=4096" in res.stdout
