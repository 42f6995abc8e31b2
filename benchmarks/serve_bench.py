"""Decomposed byte-surface serving benchmark (VERDICT round-3 item 1).

The product surface is calldata in -> calldata out (c_fhe.rs:8-59).  This
bench separates the three components that bound it so an integrator can
tell what a co-located TPU host would do, instead of reading one number
dominated by this environment's ~20 MB/s dev tunnel:

  * codec-only ops/s/host   — C++ decode (zstd+bincode+checks) and encode
                              rates in worker threads, no device work
  * device compute ops/s    — the chip's batched mul+relin rate (from
                              report.py / bench.py; passed in or measured)
  * end-to-end ops/s/host   — the full ByteServer pipeline as measured
                              HERE (includes per-batch transfers over the
                              dev tunnel: an environment artifact, labeled)
  * co-located projection   — min(codec, device) under the pipelined
                              overlap (serve.py decode-ahead windows)

Usage: python benchmarks/serve_bench.py [--quick] [--device-rate R]
Emits one JSON line per metric; importable as run(emit, quick, ...).
"""
from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(pool, fn, items):
    """Wall time of one threaded pass of fn over items."""
    t0 = time.time()
    list(pool.map(fn, items))
    return time.time() - t0


def run(emit, quick: bool = False, device_rate: float | None = None,
        app=None, log=print, codec_only: bool = False,
        codec_rate: float | None = None):
    """codec_only: measure ONLY the host-codec rates (no device/e2e work)
    — meant to run in a fresh CPU-only process: a process that also holds
    the TPU client measures ~3x lower threaded codec rates (its resident
    threads serialize the pool).  codec_rate: skip the codec measurement
    and use this rate for the projection row (report.py passes the
    fresh-process number in)."""
    from fhe_precompiles_tpu import pack
    from fhe_precompiles_tpu.app import _CT_CODEC, FheApp
    from fhe_precompiles_tpu.encoding import encode_unsigned
    from fhe_precompiles_tpu.params import TESTNET_ONE
    from fhe_precompiles_tpu.serve import ByteServer
    from fhe_precompiles_tpu.testnet import one

    FHE = one.FHE
    if app is None and not codec_only:
        app = FheApp(TESTNET_ONE, engine="jax")
    if codec_only:
        from fhe_precompiles_tpu.native.codec import NativeCodec
        app = FheApp(TESTNET_ONE)  # golden: codec only needs the keys
        cod = NativeCodec(app)
        server = None
    else:
        server = ByteServer(TESTNET_ONE, app=app, codec="native")
        cod = server.codec
    net_pk = FHE.public_key

    ct_pairs = [(FHE.ctx.encrypt(encode_unsigned(i + 1, TESTNET_ONE, 64),
                                 net_pk, bytes([i]) * 64),
                 FHE.ctx.encrypt(encode_unsigned(i + 2, TESTNET_ONE, 64),
                                 net_pk, bytes([i + 64]) * 64))
                for i in range(8)]
    # codec_rate given (report mode): the tunnel-bound e2e rows don't need
    # 1024 requests' worth of transfer minutes
    NSRV = 128 if quick else (256 if codec_rate is not None else 1024)
    name = "mul_cipheru64_cipheru64"
    reqs = [(name, pack.pack_binary_operation(net_pk, ct_pairs[i % 8][0],
                                              _CT_CODEC, ct_pairs[i % 8][1],
                                              _CT_CODEC))
            for i in range(NSRV)]

    # ---- codec-only decode/encode (C++ worker threads, no device) -------
    # Steady-state rates: one full warm pass, then best of 3 timed passes.
    # A single cold pass pays one-time allocator growth / first-touch page
    # faults for the whole output set (~90 MB of fresh bytes objects) and
    # understates the sustained rate by up to ~1.5x — a long-running
    # serving host lives in the warmed regime, which is also how the
    # device rows are measured (best contention window, bench.py).
    if codec_rate is None:
        import os as _os
        workers = min(32, _os.cpu_count() or 1)

        def decode_only(data):
            code, _s, _o, _a, _b, _sa, _sb, pk = cod.unpack_binary(name,
                                                                   data)
            assert code == 0
            pk.release()

        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(decode_only, [d for _, d in reqs]))  # warm
            dt_dec = min(_timed(pool, decode_only,
                                [d for _, d in reqs]) for _ in range(3))
        emit("byte_codec_native_decode_mul_per_sec", NSRV / dt_dec,
             "reqs/s/host")

        # a realistic output ciphertext (post-mul residues, not zeros)
        out_ct = FHE.ctx.mul_relin(ct_pairs[0][0], ct_pairs[0][1],
                                   net_pk.relin).data
        outs = [np.array(out_ct) for _ in range(NSRV)]
        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(cod.pack_ciphertext, outs))  # warm
            dt_enc = min(_timed(pool, cod.pack_ciphertext, outs)
                         for _ in range(3))
        emit("byte_codec_native_encode_ct_per_sec", NSRV / dt_enc,
             "reqs/s/host")

        codec_rate = NSRV / (dt_dec + dt_enc)
        emit("byte_codec_native_roundtrip_per_sec", codec_rate,
             "reqs/s/host")

        # single-thread roundtrip: per-request host-codec latency, and
        # (vs the threaded row) the thread-scaling evidence behind
        # "host cores are the serving lever"
        N1 = max(32, NSRV // 8)

        def _one_pass():
            t0 = time.time()
            for _, d in reqs[:N1]:
                decode_only(d)
            for o in outs[:N1]:
                cod.pack_ciphertext(o)
            return time.time() - t0

        _one_pass()  # warm
        dt_1 = min(_one_pass() for _ in range(3))
        emit("byte_codec_native_roundtrip_1thread_per_sec", N1 / dt_1,
             "reqs/s/core")
        emit("byte_codec_native_thread_scaling",
             codec_rate / (N1 / dt_1 * workers), "fraction")
    if codec_only:
        return codec_rate

    # ---- end-to-end ByteServer (native codec, pipelined windows) --------
    server.run(reqs)  # warm: compile the EXACT batch shapes + pk caches
    t0 = time.time()
    got = server.run(reqs)
    dt_e2e = time.time() - t0
    assert all(c == 0 for c, _ in got)
    emit("byte_server_native_mul_ops_per_sec", NSRV / dt_e2e, "ops/s/host")

    # ---- python-codec end-to-end, for the before/after ------------------
    server_py = ByteServer(TESTNET_ONE, app=app, codec="python")
    NPY = max(64, NSRV // 8)
    server_py.run(reqs[:NPY])  # warm with identical shapes
    t0 = time.time()
    got = server_py.run(reqs[:NPY])
    dt_py = time.time() - t0
    assert all(c == 0 for c, _ in got)
    emit("byte_server_python_mul_ops_per_sec", NPY / dt_py, "ops/s/host")

    # ---- realistic MIXED stream: cc + cp/pc + threshold -----------------
    # The reference surface is all 36 binary ops + the threshold API, not
    # just cc mul.  Mix: 50% cc (add/sub/mul), 25% cp/pc (incl. mul_plain,
    # which carries real NTT work), 13% encrypt, 7% decrypt, 5% reencrypt.
    # The python codec batches only the cc block (cp/pc/threshold fall
    # back to sequential FheApp.call); the native codec batches everything.
    import random
    rng = random.Random(7)
    NMIX = 128 if quick else 512
    mixed = []
    for j in range(NMIX):
        r = rng.random()
        i = j % 8
        if r < 0.50:
            op = rng.choice(["add", "sub", "mul"])
            mixed.append((f"{op}_cipheru64_cipheru64",
                          pack.pack_binary_operation(
                              net_pk, ct_pairs[i][0], _CT_CODEC,
                              ct_pairs[i][1], _CT_CODEC)))
        elif r < 0.75:
            op = rng.choice(["add", "sub", "mul"])
            if rng.random() < 0.5:
                mixed.append((f"{op}_cipheru64_u64",
                              pack.pack_binary_operation(
                                  net_pk, ct_pairs[i][0], _CT_CODEC,
                                  j + 1, pack.U64)))
            else:
                mixed.append((f"{op}_u64_cipheru64",
                              pack.pack_binary_operation(
                                  net_pk, j + 1, pack.U64,
                                  ct_pairs[i][1], _CT_CODEC)))
        elif r < 0.88:
            mixed.append(("encrypt_u64",
                          pack.pack_two_arguments(j, pack.U64,
                                                  b"pd%d" % j, pack.BYTES)))
        elif r < 0.95:
            mixed.append(("decrypt_u64",
                          pack.pack_one_argument(ct_pairs[i][0],
                                                 _CT_CODEC)))
        else:
            mixed.append(("reencrypt_u64",
                          pack.pack_binary_operation(
                              net_pk, ct_pairs[i][0], _CT_CODEC,
                              b"rd%d" % j, pack.BYTES)))
    server.run(mixed)  # warm exact shapes
    t0 = time.time()
    got = server.run(mixed)
    dt_mix_nat = time.time() - t0
    assert all(c == 0 for c, _ in got)
    emit("byte_server_native_mixed_ops_per_sec", NMIX / dt_mix_nat,
         "ops/s/host")
    NMIXPY = max(32, NMIX // 4)
    server_py.run(mixed[:NMIXPY])
    t0 = time.time()
    got = server_py.run(mixed[:NMIXPY])
    dt_mix_py = time.time() - t0
    assert all(c == 0 for c, _ in got)
    emit("byte_server_python_mixed_ops_per_sec", NMIXPY / dt_mix_py,
         "ops/s/host")
    emit("byte_server_mixed_native_vs_python", (NMIX / dt_mix_nat)
         / (NMIXPY / dt_mix_py), "x")

    # ---- co-located projection ------------------------------------------
    # Host codec and device compute overlap (decode-ahead windows), so a
    # host wired to its chip by PCIe/ICI rather than this dev tunnel is
    # bounded by the slower of the two stages.  Transfer at PCIe gen4+
    # (>= 16 GB/s vs the tunnel's ~20 MB/s) adds <2% at these sizes.
    if device_rate is None:
        device_rate = _measure_device_rate(app, log)
    if device_rate:
        emit("byte_server_colocated_projection_per_sec",
             min(codec_rate, device_rate), "ops/s/host+chip")
        log(f"# components: codec {codec_rate:.0f}/s, device "
            f"{device_rate:.0f}/s, e2e-here {NSRV / dt_e2e:.0f}/s "
            "(dev-tunnel transfer bound; environment artifact)")
    return codec_rate


def _measure_device_rate(app, log):
    """Chip-side batched mul+relin rate (scan-chain slope, see bench.py)."""
    try:
        import jax
        import jax.numpy as jnp
        eng = app._engine
        ctx = eng.golden
        rng = np.random.default_rng(0)
        n, k = ctx.n, len(ctx.q_mods)
        B = 128
        a = jnp.asarray(np.stack([
            np.stack([rng.integers(0, p, size=(n,), dtype=np.uint64)
                      for p in ctx.q_mods]) for _ in range(2 * B)
        ]).reshape(B, 2, k, n))
        pk = app.public_key
        rk = jnp.asarray(pk.relin.data)
        rk_ws = jnp.asarray(eng.relin_shoup(pk.relin.data))

        def step(c):
            return eng._mul_relin.__wrapped__(
                c, jnp.roll(c, 1, axis=0), rk, rk_ws)[:, :2]

        def make(K):
            @jax.jit
            def f(x):
                y, _ = jax.lax.scan(lambda c, _: (step(c), None), x, None,
                                    length=K)
                return jnp.sum(y)
            return f
        lo, hi = make(4), make(24)
        np.asarray(lo(a))
        np.asarray(hi(a))
        best = None
        for _ in range(2):
            t0 = time.time()
            np.asarray(lo(a))
            t_lo = time.time() - t0
            t0 = time.time()
            np.asarray(hi(a))
            t_hi = time.time() - t0
            rate = B * 20 / (t_hi - t_lo)
            best = rate if best is None else max(best, rate)
        return best
    except Exception as exc:  # pragma: no cover - depends on device
        log(f"# device-rate measurement skipped: {exc}")
        return None


def main():
    quick = "--quick" in sys.argv
    codec_only = "--codec-only" in sys.argv
    device_rate = None
    if "--device-rate" in sys.argv:
        device_rate = float(sys.argv[sys.argv.index("--device-rate") + 1])
    import jax
    if codec_only:
        # no device work: stay off the (possibly busy) TPU entirely
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    def emit(metric, value, unit):
        print(json.dumps({"metric": metric, "value": round(value, 2),
                          "unit": unit}), flush=True)

    run(emit, quick=quick, device_rate=device_rate, codec_only=codec_only,
        log=lambda *a: print(*a, file=sys.stderr, flush=True))


if __name__ == "__main__":
    main()
