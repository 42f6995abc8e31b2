"""Worker process for the real multi-process jax.distributed test.

Invoked by tests/test_multiprocess_distributed.py as
``python dist_worker.py <coordinator> <num_processes> <process_id>``.
Each process owns 4 virtual CPU devices (XLA_FLAGS set by the parent);
together they form one 8-device dp mesh.  The worker runs a dp-sharded
batched mul+relin and asserts its addressable output shards are bit-equal
to the single-process golden model -- the distributed path must never
change bytes (consensus).
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")   # sitecustomize pins the TPU
                                            # tunnel; env vars don't override

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from fhe_precompiles_tpu.parallel import multihost  # noqa: E402


def main():
    coordinator, num_processes, process_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
    multihost.initialize(coordinator_address=coordinator,
                         num_processes=num_processes,
                         process_id=process_id)
    assert jax.process_count() == num_processes, jax.process_count()

    from jax.sharding import NamedSharding, PartitionSpec as P

    from fhe_precompiles_tpu.bfv.golden import BfvContext
    from fhe_precompiles_tpu.encoding import PLAIN_TYPES
    from fhe_precompiles_tpu.ops.engine import JaxEngine
    from fhe_precompiles_tpu.params import TESTNET_ONE

    mesh = multihost.global_mesh(dp=8, tp=1)
    ctx = BfvContext(TESTNET_ONE)
    pk, sk = ctx.generate_keys(seed=b"\x11" * 64)

    B = 8
    cts_a = np.stack([
        ctx.encrypt(PLAIN_TYPES["u64"].encode(100 + i, TESTNET_ONE),
                    pk, bytes([i]) * 64).data for i in range(B)])
    cts_b = np.stack([
        ctx.encrypt(PLAIN_TYPES["u64"].encode(3 + i, TESTNET_ONE),
                    pk, bytes([64 + i]) * 64).data for i in range(B)])

    eng = JaxEngine(TESTNET_ONE, golden=ctx)
    sharding = NamedSharding(mesh, P(("dp",), None, None, None))

    def make_global(full):
        return jax.make_array_from_callback(
            full.shape, sharding, lambda idx: full[idx])

    ga, gb = make_global(cts_a), make_global(cts_b)
    rk = jax.make_array_from_callback(
        pk.relin.data.shape, NamedSharding(mesh, P()),
        lambda idx: pk.relin.data[idx])

    with mesh:
        out = eng._mul_relin(ga, gb, rk)
    out.block_until_ready()

    # bit-equality of this process's shards vs the golden model
    from fhe_precompiles_tpu.bfv.golden import Ciphertext
    for shard in out.addressable_shards:
        i0 = shard.index[0].start or 0
        local = np.asarray(shard.data)
        for off in range(local.shape[0]):
            i = i0 + off
            want = ctx.mul_relin(Ciphertext(TESTNET_ONE, cts_a[i]),
                                 Ciphertext(TESTNET_ONE, cts_b[i]),
                                 pk.relin).data
            assert np.array_equal(local[off], want), f"batch item {i} diverged"
            dec = PLAIN_TYPES["u64"].decode(
                ctx.decrypt(Ciphertext(TESTNET_ONE, local[off]), sk),
                TESTNET_ONE)
            assert dec == (100 + i) * (3 + i), dec
    print(f"DIST-OK process={process_id} shards="
          f"{len(out.addressable_shards)}", flush=True)

    # ---- cross-process COLLECTIVE path: distributed NTT over sp=8 ----
    # The dp workload above is embarrassingly parallel; this leg sends
    # ppermute shard exchanges across the OS-process boundary (Gloo) and
    # must stay bit-identical to the local transform.
    from fhe_precompiles_tpu.ops.ntt import build_tables, ntt as local_ntt
    from fhe_precompiles_tpu.parallel.dist_ntt import (make_distributed_ntt,
                                                       shard_coeff_axis)
    sp_mesh = jax.sharding.Mesh(
        np.array(jax.devices()).reshape(8), axis_names=("sp",))
    tb = build_tables(list(TESTNET_ONE.ct_moduli), TESTNET_ONE.n)
    rng = np.random.default_rng(3)
    poly = np.stack([
        rng.integers(0, p, size=(TESTNET_ONE.n,), dtype=np.uint64)
        for p in TESTNET_ONE.ct_moduli])
    dntt, dintt = make_distributed_ntt(tb, sp_mesh)
    sharding = jax.sharding.NamedSharding(
        sp_mesh, jax.sharding.PartitionSpec(None, "sp"))
    garr = jax.make_array_from_callback(poly.shape, sharding,
                                        lambda idx: poly[idx])
    got = dntt(garr)
    got.block_until_ready()
    want = np.asarray(local_ntt(jnp.asarray(poly), tb))
    for shard in got.addressable_shards:
        sl = shard.index
        assert np.array_equal(np.asarray(shard.data), want[sl]), \
            f"dist-NTT shard {sl} diverged across processes"
    back = dintt(got)
    back.block_until_ready()
    for shard in back.addressable_shards:
        assert np.array_equal(np.asarray(shard.data), poly[shard.index])
    print(f"DIST-NTT-OK process={process_id}", flush=True)


if __name__ == "__main__":
    main()
