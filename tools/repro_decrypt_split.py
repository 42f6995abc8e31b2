"""Reproduce the round-4 VERDICT decrypt consensus split (c1=0 boundary cts).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/repro_decrypt_split.py
"""
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from fhe_precompiles_tpu import pack
from fhe_precompiles_tpu.app import FheApp, _CT_CODEC
from fhe_precompiles_tpu.bfv.golden import Ciphertext
from fhe_precompiles_tpu.params import TESTNET_ONE

P = TESTNET_ONE
q = P.q
t = P.t
k = len(P.ct_moduli)
n = P.n
print(f"n={n} k={k} t={t} q bits={q.bit_length()} gamma={P.gamma}")

apps = {e: FheApp(P, engine=e) for e in ("golden", "jax", "native")}


def ct_from_x(x: int) -> bytes:
    """c1 = 0, c0 constant polynomial with CRT value x -> dot == x."""
    data = np.zeros((2, k, n), dtype=np.uint64)
    for j, p in enumerate(P.ct_moduli):
        data[0, j, 0] = x % p
    return Ciphertext(P, data).to_bytes()


splits = 0
tested = 0
for m in (0, 1, 5, t // 2, t - 1):
    base = (m * q - q // 2)  # t*x + q//2 == m*q  => x = base/t boundary
    for d in (-1, 0, 1):
        x = (base + d) // t
        if not (0 <= x < q):
            continue
        blob = ct_from_x(x)
        calldata = pack.pack_one_argument(blob, pack.BYTES)
        out = {e: apps[e].call("decrypt_i64", calldata) for e in apps}
        tested += 1
        codes = {e: out[e][0] for e in out}
        pays = {e: out[e][1] for e in out}
        same = len({(codes[e], pays[e]) for e in out}) == 1
        if not same:
            splits += 1
            print(f"SPLIT m={m} d={d} x={x}")
            for e in out:
                print(f"   {e}: code={codes[e]} payload={pays[e].hex()}")
print(f"{splits}/{tested} boundary cts split")

# size-3 ciphertext through decrypt (c2 nonzero): golden handles the
# s^2 term; does jax silently drop it?
rng = np.random.default_rng(7)
data = np.zeros((3, k, n), dtype=np.uint64)
for j, p in enumerate(P.ct_moduli):
    data[:, j] = rng.integers(0, p, size=(3, n), dtype=np.uint64)
blob = Ciphertext(P, data).to_bytes()
calldata = pack.pack_one_argument(blob, pack.BYTES)
out3 = {e: apps[e].call("decrypt_u64", calldata) for e in apps}
for e in out3:
    print(f"size3 {e}: code={out3[e][0]} payload={out3[e][1].hex()}")
