"""Benchmark: BFV ct-ct multiply + full relinearization throughput per chip.

Headline metric (BASELINE.md): ops/sec at n=4096, testnet-one params
(2 ciphertext RNS limbs + special prime), target >= 1000 ops/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra diagnostics go to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from fhe_precompiles_tpu.bfv import BfvContext
    from fhe_precompiles_tpu.encoding import encode_unsigned
    from fhe_precompiles_tpu.ops.engine import JaxEngine
    from fhe_precompiles_tpu.params import TESTNET_ONE

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    ctx = BfvContext(TESTNET_ONE)
    eng = JaxEngine(TESTNET_ONE, golden=ctx)
    pk, sk = ctx.generate_keys(seed=b"\x42" * 64)

    B = 128               # measured throughput sweet spot on v5e
    NB = 8                # distinct ciphertexts, tiled up to B
    plains = np.stack([encode_unsigned((i % 50) + 1, TESTNET_ONE, 64)
                       for i in range(NB)])
    seeds = [bytes([i % 251 + 1]) * 64 for i in range(NB)]
    t0 = time.time()
    batch = np.asarray(eng.encrypt_batch(plains, pk, seeds))
    log(f"encrypt_batch({NB}): {time.time() - t0:.2f}s")
    tiled = np.tile(batch, (B // NB, 1, 1, 1))

    a = jnp.asarray(tiled)
    b = jnp.asarray(tiled)
    rk = jnp.asarray(pk.relin.data)

    # compile
    t0 = time.time()
    out = eng._mul_relin(a, b, rk)
    out.block_until_ready()
    log(f"mul_relin compile+first run: {time.time() - t0:.2f}s")

    # verify one element end-to-end before timing
    from fhe_precompiles_tpu.bfv.golden import Ciphertext
    from fhe_precompiles_tpu.encoding import decode_unsigned
    got = decode_unsigned(
        ctx.decrypt(Ciphertext(TESTNET_ONE, np.asarray(out[3])), sk),
        TESTNET_ONE, 64)
    assert got == 16, f"bench pipeline broken: {got}"

    # timed runs
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        out = eng._mul_relin(a, b, rk)
    out.block_until_ready()
    dt = (time.time() - t0) / iters
    ops_per_sec = B / dt
    log(f"batch={B}: {dt*1e3:.1f} ms/batch -> {ops_per_sec:.1f} mul+relin/s")

    baseline = 1000.0  # BASELINE.json north star: >= 1000 ops/sec/chip
    print(json.dumps({
        "metric": "bfv_mul_relin_n4096_ops_per_sec",
        "value": round(ops_per_sec, 2),
        "unit": "ops/s/chip",
        "vs_baseline": round(ops_per_sec / baseline, 4),
    }))


if __name__ == "__main__":
    main()
