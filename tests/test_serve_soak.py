"""ByteServer soak: sustained identical request windows through the
native codec stay byte-stable and do not grow host memory.

The native-codec path allocates per request (refcounted pk parse-cache
handles, malloc'd outputs crossing the ctypes boundary, thread-local
zstd contexts and scratch).  An unfreed output ciphertext (~260 KB) or a
leaked handle-backing buffer grows RSS by ~100 MB over the windows run
here; the bound catches that class while staying robust to allocator
noise on identical, already-warm windows.
"""
import gc
import hashlib
import threading

import numpy as np

from fhe_precompiles_tpu import FheApp, pack
from fhe_precompiles_tpu.app import _CT_CODEC
from fhe_precompiles_tpu.encoding import PLAIN_TYPES
from fhe_precompiles_tpu.serve import ByteServer
from fhe_precompiles_tpu.testnet import one

FHE = one.FHE


def _vmrss_kb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    raise RuntimeError("no VmRSS")


def test_byte_server_native_soak():
    app = FheApp(FHE.params, engine="jax")
    server = ByteServer(FHE.params, app=app, codec="native")
    pk1, _ = FHE.generate_keys()

    def ct(value, pk, tag):
        poly = PLAIN_TYPES["u64"].encode(value, FHE.params)
        return FHE.ctx.encrypt(poly, pk, hashlib.sha512(tag).digest())

    a, b = ct(9, pk1, b"s1"), ct(4, pk1, b"s2")
    reqs = []
    for i in range(48):
        op = ("add", "sub", "mul")[i % 3]
        reqs.append((f"{op}_cipheru64_cipheru64",
                     pack.pack_binary_operation(pk1, a, _CT_CODEC,
                                                b, _CT_CODEC)))
    reqs.append(("encrypt_u64",
                 pack.pack_two_arguments(5, pack.U64, b"pd", pack.BYTES)))
    reqs.append(("decrypt_u64", pack.pack_one_argument(
        ct(7, FHE.public_key, b"s3"), _CT_CODEC)))

    expected = [app.call(name, data) for name, data in reqs]
    assert server.run(reqs) == expected  # warm: batch-shape compiles

    # Prime EVERY pool thread's codec state deterministically: each
    # worker builds its zstd contexts (~3.5 MB) on first use, and which
    # threads have compressed yet is scheduling-dependent — without this
    # the plateau drifts in at 32 threads x ~3.5 MB and looks like a leak.
    barrier = threading.Barrier(server.workers)
    out_arr = np.asarray(FHE.ctx.mul_relin(a, b, pk1.relin).data)
    mul_data = reqs[2][1]

    def prime():
        barrier.wait()  # hold every worker so each takes exactly one task
        server.codec.pack_ciphertext(out_arr)           # CCtx
        server.codec.unpack_binary("mul_cipheru64_cipheru64",
                                   mul_data)[7].release()  # DCtx
        barrier.wait()

    for f in [server._pool.submit(prime) for _ in range(server.workers)]:
        f.result()

    # reach the steady state before baselining: the first couple of
    # windows still grow tens of MB one-time (per-thread glibc arenas,
    # remaining engine/cache state); the plateau is flat from there
    for _ in range(3):
        assert server.run(reqs) == expected

    gc.collect()
    rss0 = _vmrss_kb()
    for _ in range(8):
        assert server.run(reqs) == expected
    gc.collect()
    rss1 = _vmrss_kb()
    # 8 windows x 50 requests: a per-request output leak alone would add
    # ~100 MB; identical warm windows should add close to zero
    assert rss1 - rss0 < 60_000, f"RSS grew {rss1 - rss0} kB over soak"
