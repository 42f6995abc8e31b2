"""Multithreaded CPU-validator throughput: native engine scaling over cores.

The reference's deployment model is a single-threaded SEAL call per
precompile request inside a node process; a real validator serves many
requests concurrently.  The native engine is thread-safe by construction
(const context + thread_local scratch, host_engine.cpp:1169-1190) and
ctypes releases the GIL for the duration of each C call, so a plain
Python thread pool scales the C++ kernels across cores with no further
native code.  This benchmark measures that scaling at two surfaces:

  * engine level  — NativeEngine.mul_relin on distinct operand pairs
  * byte path     — FheApp.call("mul_cipheru64_cipheru64", calldata),
                    i.e. unpack + zstd + bincode + compute + repack
  * pure-native   — c_fhe_mul_cipheru64_cipheru64 via libc_fhe_native.so:
                    the zero-Python C ABI (native/precompiles.cpp), the
                    deployment surface a non-Python node actually links

Usage:  PYTHONPATH=/root/repo python tools/native_mt_bench.py [max_threads]
Emits one JSON line per (surface, threads) with ops/s and efficiency.
"""
from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fhe_precompiles_tpu import FheApp, pack
from fhe_precompiles_tpu.app import _CT_CODEC
from fhe_precompiles_tpu.encoding import PLAIN_TYPES
from fhe_precompiles_tpu.params import PRESETS


def bench(fn, jobs, threads: int, min_time: float = 2.0) -> float:
    """ops/s for `fn` mapped over cycling `jobs` with `threads` workers."""
    with ThreadPoolExecutor(max_workers=threads) as pool:
        # warm-up: one op per worker
        list(pool.map(fn, jobs[:threads]))
        done = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < min_time:
            list(pool.map(fn, jobs))
            done += len(jobs)
        dt = time.perf_counter() - t0
    return done / dt


def main() -> None:
    max_threads = int(sys.argv[1]) if len(sys.argv) > 1 else (os.cpu_count() or 1)
    app = FheApp(PRESETS["testnet.one"], engine="native")
    eng = app._engine
    pk, sk = app.generate_keys()
    enc = PLAIN_TYPES["u64"].encode
    rng = np.random.default_rng(7)

    # Distinct operand pairs so no cache effect flatters the MT numbers.
    npairs = 4 * max_threads
    cts = [app.ctx.encrypt(enc(int(rng.integers(1, 1 << 20)), app.params),
                           pk, bytes([i]) * 64)
           for i in range(2 * npairs)]
    pairs = [(cts[2 * i], cts[2 * i + 1]) for i in range(npairs)]
    calldata = [pack.pack_binary_operation(pk, a, _CT_CODEC, b, _CT_CODEC)
                for a, b in pairs]

    def eng_op(pair):
        a, b = pair
        return eng.mul_relin(a, b, pk.relin)

    def byte_op(data):
        code, out = app.call("mul_cipheru64_cipheru64", data)
        assert code == 0, code
        return out

    import subprocess

    from fhe_precompiles_tpu.native import NativeFhe, _DIR
    subprocess.run(["make", "-C", _DIR, "libc_fhe_native.so"], check=True,
                   capture_output=True)
    nat = NativeFhe(os.path.join(_DIR, "libc_fhe_native.so"))

    def abi_op(data):
        code, out = nat.call("mul_cipheru64_cipheru64", data)
        assert code == 0, code
        return out

    results = {}
    for surface, fn, jobs in (("engine_mul_relin", eng_op, pairs),
                              ("byte_path_mul", byte_op, calldata),
                              ("c_abi_native_mul", abi_op, calldata)):
        base = None
        for t in range(1, max_threads + 1):
            rate = bench(fn, jobs, t)
            base = base or rate
            eff = rate / (base * t)
            results[(surface, t)] = rate
            print(json.dumps({
                "surface": surface, "threads": t,
                "ops_per_sec": round(rate, 1),
                "scaling_efficiency": round(eff, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
