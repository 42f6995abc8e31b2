"""Full benchmark suite: every BASELINE.md config, one JSON line per metric.

Usage:  python benchmarks/report.py [--quick]

Configs (BASELINE.json):
  1. BFV ciphertext add, n=1024, single RNS modulus
  2. BFV ct-ct multiply + relinearization, n=4096 (headline; also in bench.py)
  3. Packed slot arithmetic (encode -> batched add/mul -> decode), n=8192
  4. Keyswitching + testnet public-key flow (relinearize at testnet params)
  5. Batched precompile request stream: 10k mixed add/mul ops
  +  NTT throughput (transforms/sec, n=4096)

Writes benchmarks/RESULTS.md with the measured table.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chain_time(step, x0, k_lo=4, k_hi=24, rounds=3):
    """Per-step seconds via single-dispatch scan-chain slope (see bench.py:
    dispatch/transfer latency cancels; robust on remote-attached chips).

    Interleaves `rounds` (t_lo, t_hi) measurements and slopes the per-K
    minima: a single-shot slope can straddle a contention-window edge on
    the shared chip and report impossible rates (observed once: a decrypt
    row at ~100x its HBM read floor)."""
    import jax
    import jax.numpy as jnp

    def make(K):
        @jax.jit
        def f(x):
            def body(c, _):
                return step(c), None
            y, _ = jax.lax.scan(body, x, None, length=K)
            return jnp.sum(jax.tree_util.tree_leaves(y)[0])
        return f

    fns = {K: make(K) for K in (k_lo, k_hi)}
    times = {K: [] for K in fns}
    for f in fns.values():
        np.asarray(f(x0))          # compile + sync
    for _ in range(rounds):
        for K, f in fns.items():
            t0 = time.time()
            np.asarray(f(x0))
            times[K].append(time.time() - t0)
    return (min(times[k_hi]) - min(times[k_lo])) / (k_hi - k_lo)


def rand_ct_batch(ctx, B, rng):
    n = ctx.n
    return np.stack([
        np.stack([rng.integers(0, p, size=(n,), dtype=np.uint64)
                  for p in ctx.q_mods]) for _ in range(2 * B)
    ]).reshape(B, 2, len(ctx.q_mods), n)


def host_rows(emit, quick: bool = False, log=log):
    """All host-CPU-only rows: the C-ABI byte path, the native C++
    engine, and the pure-native shared library.

    Run via ``python benchmarks/report.py --host-rows`` in a FRESH
    process BEFORE the report touches the TPU: a process that has pushed
    tunnel traffic (or co-runs with one) measures these host-core rates
    up to ~3x low (its resident transfer threads contend for the 4
    CPUs) — the same artifact that once understated the codec rows.
    Nothing here needs JAX or the device."""
    from fhe_precompiles_tpu import pack
    from fhe_precompiles_tpu.app import _CT_CODEC, FheApp
    from fhe_precompiles_tpu.bfv import BfvContext
    from fhe_precompiles_tpu.encoding import encode_unsigned
    from fhe_precompiles_tpu.params import TESTNET_ONE
    from fhe_precompiles_tpu.testnet import one as testnet_one

    FHE = testnet_one.FHE
    ctx = BfvContext(TESTNET_ONE)

    # ---- host byte-path decrypt throughput (C-ABI surface) ------------
    ct_u64 = ctx.encrypt(encode_unsigned(123456, TESTNET_ONE, 64),
                         FHE.public_key, b"\x47" * 64)
    calldata = pack.pack_one_argument(ct_u64, _CT_CODEC)
    code, _ = FHE.call("decrypt_u64", calldata)
    assert code == 0
    NDEC = 5 if quick else 20
    t0 = time.time()
    for _ in range(NDEC):
        FHE.call("decrypt_u64", calldata)
    dt = (time.time() - t0) / NDEC
    emit("byte_path_decrypt_u64_per_sec", 1.0 / dt, "ops/s/host-core")

    # ---- native C++ host engine (SEAL-analog CPU validator path) ------
    napp = FheApp(TESTNET_ONE, engine="native")
    neng = napp._engine
    ca_nat, cb_nat = ctx.encrypt(
        encode_unsigned(17, TESTNET_ONE, 64), FHE.public_key, b"\x11" * 64), \
        ctx.encrypt(encode_unsigned(4, TESTNET_ONE, 64),
                    FHE.public_key, b"\x22" * 64)
    NOP = 10 if quick else 50
    neng.mul_relin(ca_nat, cb_nat, FHE.public_key.relin)
    t0 = time.time()
    for _ in range(NOP):
        neng.mul_relin(ca_nat, cb_nat, FHE.public_key.relin)
    emit("native_mul_relin_per_sec", NOP / (time.time() - t0),
         "ops/s/host-core")
    t0 = time.time()
    for _ in range(NOP):
        neng.decrypt(ca_nat, FHE.private_key)
    emit("native_decrypt_per_sec", NOP / (time.time() - t0),
         "ops/s/host-core")
    t0 = time.time()
    for _ in range(NOP):
        neng.encrypt(encode_unsigned(9, TESTNET_ONE, 64), FHE.public_key,
                     b"\x33" * 64)
    emit("native_encrypt_per_sec", NOP / (time.time() - t0),
         "ops/s/host-core")
    # full byte path (calldata parse -> native op -> serialize)
    code, _ = napp.call("decrypt_u64", calldata)
    assert code == 0
    t0 = time.time()
    for _ in range(NDEC):
        napp.call("decrypt_u64", calldata)
    emit("native_byte_path_decrypt_u64_per_sec", NDEC / (time.time() - t0),
         "ops/s/host-core")

    # ---- pure-native C ABI (libc_fhe_native.so, zero Python) ----------
    # The deployment surface a non-Python node links; byte-identical to
    # FheApp.call (tests/test_native_byte_path.py).
    import subprocess as _sp

    from fhe_precompiles_tpu.native import _DIR as _NDIR, NativeFhe
    _sp.run(["make", "-C", _NDIR, "libc_fhe_native.so"], check=True,
            capture_output=True)
    nat = NativeFhe(os.path.join(_NDIR, "libc_fhe_native.so"))
    mul_calldata = pack.pack_binary_operation(
        FHE.public_key, ca_nat, _CT_CODEC, cb_nat, _CT_CODEC)
    code, _ = nat.call("mul_cipheru64_cipheru64", mul_calldata)
    assert code == 0
    t0 = time.time()
    for _ in range(NOP):
        nat.call("mul_cipheru64_cipheru64", mul_calldata)
    emit("c_abi_native_mul_per_sec", NOP / (time.time() - t0),
         "ops/s/host-core")


def main():
    quick = "--quick" in sys.argv
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp

    from fhe_precompiles_tpu.bfv import BfvContext
    from fhe_precompiles_tpu.encoding import BatchEncoder, encode_unsigned
    from fhe_precompiles_tpu.ops.engine import JaxEngine
    from fhe_precompiles_tpu.ops.ntt import build_tables, ntt as sntt
    from fhe_precompiles_tpu.params import (BENCH_N1024, BENCH_N8192,
                                            TESTNET_ONE)
    from fhe_precompiles_tpu.parallel import RequestStream

    rng = np.random.default_rng(0)
    results = []

    def emit(metric, value, unit, baseline=None):
        row = {"metric": metric, "value": round(value, 2), "unit": unit}
        if baseline:
            row["vs_baseline"] = round(value / baseline, 4)
        results.append(row)
        print(json.dumps(row), flush=True)

    # ---- host-codec rates FIRST, on a quiet host ----------------------
    # Measured in a CPU-only subprocess BEFORE this process touches the
    # TPU: after heavy tunnel traffic the host measures ~3x lower
    # threaded codec rates (the transfer proxy contends for the 4 CPUs),
    # which understated the canonical serving rows in earlier runs.
    import subprocess
    here = os.path.dirname(os.path.abspath(__file__))
    codec_rate = None
    sub = subprocess.run(
        [sys.executable, os.path.join(here, "serve_bench.py"),
         "--codec-only"] + (["--quick"] if quick else []),
        capture_output=True, text=True, timeout=1800)
    for line in sub.stdout.splitlines():
        try:
            row = json.loads(line)
        except ValueError:
            continue
        results.append(row)
        print(json.dumps(row), flush=True)
        if row["metric"] == "byte_codec_native_roundtrip_per_sec":
            codec_rate = row["value"]
    if codec_rate is None:
        log(f"codec-only subprocess failed: {sub.stderr[-400:]}")

    # ---- ALL remaining host-CPU rows, same fresh-process rule ---------
    # (native engine + C-ABI rows, then the virtual-mesh scaling
    # subprocesses): measured before this process opens the TPU client,
    # for the same reason as the codec rows above.
    sub = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--host-rows"]
        + (["--quick"] if quick else []),
        capture_output=True, text=True, timeout=1800)
    got_host = False
    for line in sub.stdout.splitlines():
        try:
            row = json.loads(line)
        except ValueError:
            continue
        results.append(row)
        print(json.dumps(row), flush=True)
        got_host = True
    if not got_host:
        log(f"host-rows subprocess failed: {sub.stderr[-400:]}")

    # ---- continuous-serving latency rows (host-CPU device) ------------
    # Queue-fed ByteServer p50/p99 vs offered load (VERDICT r4 item 4);
    # CPU-only fresh subprocess like every other host row.
    env_lat = dict(os.environ)
    env_lat.pop("PALLAS_AXON_POOL_IPS", None)
    env_lat["JAX_PLATFORMS"] = "cpu"
    sub = subprocess.run(
        [sys.executable, os.path.join(here, "serve_latency.py")]
        + (["--quick"] if quick else []),
        env=env_lat, capture_output=True, text=True, timeout=1800)
    got_lat = False
    for line in sub.stdout.splitlines():
        try:
            row = json.loads(line)
        except ValueError:
            continue
        results.append(row)
        print(json.dumps(row), flush=True)
        got_lat = True
    if not got_lat:
        log(f"serve-latency subprocess failed: {sub.stderr[-400:]}")

    # dp1/2/4/8 + the 2-process Gloo run; on by default so the cpu_mesh_*
    # rows the methodology notes describe are actually in the table
    # (opt out with --no-scaling on hosts without the CPU headroom).
    if "--no-scaling" not in sys.argv:
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        for cmd in (["--cpu", "--devices", "8"],
                    ["--multiprocess", "2", "--devices-per-proc", "4"]):
            out = subprocess.run(
                [sys.executable, os.path.join(here, "scaling.py")] + cmd,
                env=env, capture_output=True, text=True, timeout=900)
            for line in out.stdout.splitlines():
                try:
                    row = json.loads(line)
                except ValueError:
                    continue
                row["metric"] = "cpu_mesh_" + row["metric"]
                results.append(row)
                print(json.dumps(row), flush=True)

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    # ---- config 1: ct add, n=1024, single modulus --------------------
    ctx1 = BfvContext(BENCH_N1024)
    eng1 = JaxEngine(BENCH_N1024, golden=ctx1)
    B = 256 if quick else 1024
    a1 = jnp.asarray(rand_ct_batch(ctx1, B, rng))
    dt = chain_time(lambda c: eng1._add.__wrapped__(c, c), a1, 16, 2016)
    emit("bfv_add_n1024_ops_per_sec", B / dt, "ops/s/chip")

    # ---- config 2 + 4: mul + relin, n=4096 testnet -------------------
    ctx = BfvContext(TESTNET_ONE)
    eng = JaxEngine(TESTNET_ONE, golden=ctx)
    pk, sk = ctx.generate_keys(seed=b"\x42" * 64)
    rk = jnp.asarray(pk.relin.data)
    # per-key relin Shoup table (engine.relin_shoup): the serving default
    rk_ws = jnp.asarray(eng.relin_shoup(pk.relin.data))
    B = 32 if quick else 128
    a = jnp.asarray(rand_ct_batch(ctx, B, rng))
    # distinct operands: a squaring chain lets XLA CSE the two operands'
    # forward transforms and overstates general throughput by ~30%
    dt = chain_time(lambda c: eng._mul_relin.__wrapped__(
        c, jnp.roll(c, 1, axis=0), rk, rk_ws)[:, :2], a)
    emit("bfv_mul_relin_n4096_ops_per_sec", B / dt, "ops/s/chip", 1000.0)
    dt = chain_time(lambda c: eng._mul_relin.__wrapped__(
        c, c, rk, rk_ws)[:, :2], a)
    emit("bfv_mul_relin_square_n4096_ops_per_sec", B / dt, "ops/s/chip")

    ct3 = eng._multiply(a, a)
    jax.block_until_ready(ct3)

    def ks_step(c):
        out = eng._relinearize.__wrapped__(c, rk, rk_ws)  # (B, 2, k, n)
        return jnp.concatenate([out, out[:, :1]], axis=1)
    dt = chain_time(ks_step, ct3)
    emit("bfv_keyswitch_n4096_ops_per_sec", B / dt, "ops/s/chip")

    # ---- NTT throughput, n=4096 --------------------------------------
    tbq = build_tables(ctx.q_mods, ctx.n)
    x = jnp.asarray(rand_ct_batch(ctx, B, rng))
    dt = chain_time(lambda v: sntt(v, tbq), x, 8, 48)
    emit("ntt_n4096_transforms_per_sec", B * 2 * len(ctx.q_mods) / dt,
         "transforms/s/chip")
    from fhe_precompiles_tpu.ops.ntt_pair import (build_pair_tables,
                                                  ntt_pair)
    from fhe_precompiles_tpu.ops.pair import from_pair, to_pair
    tbp = build_pair_tables(ctx.q_mods, ctx.n)
    dt = chain_time(lambda v: from_pair(ntt_pair(to_pair(v), tbp)), x, 8, 48)
    emit("pair_ntt_n4096_transforms_per_sec",
         B * 2 * len(ctx.q_mods) / dt, "transforms/s/chip")
    from fhe_precompiles_tpu.ops.pallas_ntt import PallasNtt
    pn = PallasNtt(tuple(ctx.q_mods), ctx.n, C=64, tb=8)
    dt = chain_time(pn.ntt, x, 8, 48)
    emit("pallas_ntt_n4096_transforms_per_sec",
         B * 2 * len(ctx.q_mods) / dt, "transforms/s/chip")

    # ---- batched device decryption (exact multiword CRT, ops/wide.py;
    # measured 6.5% below the retired t-gamma approximation -- the price
    # of byte-exactness on adversarial inputs) ---------------------------
    from fhe_precompiles_tpu.ops.modmath import addmod as _addmod
    s_ntt = jnp.asarray(sk.s_ntt[:ctx.k])
    q_col = np.array(ctx.q_mods, dtype=np.uint64).reshape(-1, 1)

    def dec_chain(c):
        # decrypt is not self-composable; mix one bit of the plaintext back
        # into the ciphertext so the chain stays data-dependent
        m = eng._decrypt_core.__wrapped__(c, s_ntt)      # (B, n) mod t
        bump = m[:, None, None, :] & jnp.uint64(1)
        return _addmod(c, bump, q_col)
    dt = chain_time(dec_chain, a, 4, 24)
    emit("bfv_decrypt_n4096_ops_per_sec", B / dt, "ops/s/chip")

    # ---- config 3: packed slot arithmetic, n=8192 --------------------
    ctx8 = BfvContext(BENCH_N8192)
    eng8 = JaxEngine(BENCH_N8192, golden=ctx8)
    enc8 = BatchEncoder(BENCH_N8192)
    pk8, sk8 = ctx8.generate_keys(seed=b"\x43" * 64)
    vals = rng.integers(0, 1000, size=(2, enc8.slot_count), dtype=np.uint64)
    t0 = time.time()
    cta = ctx8.encrypt(enc8.encode(vals[0]), pk8, b"\x44" * 64)
    ctb = ctx8.encrypt(enc8.encode(vals[1]), pk8, b"\x45" * 64)
    log(f"n8192 encode+encrypt: {time.time() - t0:.1f}s")
    B8 = 8 if quick else 32
    a8 = jnp.asarray(np.tile(cta.data[None], (B8, 1, 1, 1)))
    b8 = jnp.asarray(np.tile(ctb.data[None], (B8, 1, 1, 1)))
    dt = chain_time(lambda c: eng8._add.__wrapped__(c, c), a8, 16, 2016)
    emit("packed_add_n8192_slotops_per_sec",
         B8 * enc8.slot_count / dt, "slot-ops/s/chip")
    rk8 = jnp.asarray(pk8.relin.data)
    dt = chain_time(
        lambda c: eng8._mul_relin.__wrapped__(
            c, jnp.roll(c, 1, axis=0), rk8)[:, :2], a8)
    emit("packed_mul_relin_n8192_slotops_per_sec",
         B8 * enc8.slot_count / dt, "slot-ops/s/chip")
    # correctness of the packed pipeline end-to-end
    out = np.asarray(eng8._mul_relin(a8, b8, rk8))[0]
    from fhe_precompiles_tpu.bfv.golden import Ciphertext
    got = enc8.decode(ctx8.decrypt(Ciphertext(BENCH_N8192, out), sk8))
    want = vals[0] * vals[1] % np.uint64(BENCH_N8192.t)
    assert np.array_equal(got, want), "packed mul mismatch"
    log("packed n8192 end-to-end verified")

    # ---- config 5: 10k mixed request stream --------------------------
    stream = RequestStream(eng)
    base_cts = [ctx.encrypt(encode_unsigned(v, TESTNET_ONE, 64), pk,
                            bytes([v]) * 64) for v in (2, 3, 4, 5)]
    NREQ = 1000 if quick else 10_000
    mix_rng = np.random.default_rng(1)
    ops = list(mix_rng.choice(["add", "sub", "mul"], size=NREQ,
                              p=[0.45, 0.1, 0.45]))
    idx_pairs = mix_rng.integers(0, len(base_cts), size=(NREQ, 2))
    pool = np.stack([c.data for c in base_cts])
    # warm with EXACT shapes (compile), then time the steady-state run
    warm = stream.run_pooled_fused(ops, idx_pairs, pool, pk)
    np.asarray(warm["mul"][1][:1])                           # hard sync
    t0 = time.time()
    res = stream.run_pooled_fused(ops, idx_pairs, pool, pk)
    np.asarray(res["mul"][1][:1])                            # hard barrier
    dt = time.time() - t0
    emit("mixed_stream_10k_ops_per_sec", NREQ / dt, "ops/s/chip")
    # host-roundtrip variant (includes host<->device transfer of every
    # request -- bandwidth-bound through the dev tunnel; logged for context)
    reqs = stream.make_mixed_requests(base_cts, min(NREQ, 512), seed=1)
    t0 = time.time()
    stream.run(reqs, pk)
    dt = time.time() - t0
    log(f"host-roundtrip stream: {len(reqs)/dt:.0f} ops/s "
        "(dev-tunnel transfer bound)")

    # ---- byte-level batched serving, decomposed (serve_bench.py) -------
    # The reference's own surface: calldata bytes in -> result bytes out.
    # Decomposed into codec-only (C++ host threads), device compute, the
    # end-to-end rate HERE (dev-tunnel transfer bound: environment
    # artifact) and the co-located projection min(codec, device).
    from fhe_precompiles_tpu.app import FheApp
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import serve_bench
    napp_jax = FheApp(TESTNET_ONE, engine="jax")
    napp_jax._engine = eng                      # reuse the warmed engine
    mr_rate_now = next(r["value"] for r in results
                       if r["metric"] == "bfv_mul_relin_n4096_ops_per_sec")
    # codec_rate was measured at the very top of main(), pre-TPU-traffic
    serve_bench.run(emit, quick=quick, device_rate=mr_rate_now,
                    app=napp_jax, log=log, codec_rate=codec_rate)

    # ---- roofline accounting ------------------------------------------
    compiled = jax.jit(
        lambda x, y, r: eng._mul_relin.__wrapped__(x, y, r)).lower(
        a, a, rk).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops_per_op = float(ca.get("flops", 0.0)) / B
    emit("mul_relin_xla_scalar_ops_per_op", flops_per_op, "ops")
    # Per-segment BEHZ-tail accounting (tail_roofline.py): replaces the
    # old whole-op vpu_utilization_estimate row, which stopped reflecting
    # the binding constraint once the NTT went HBM-bound.
    if not quick:
        import tail_roofline

        def tail_emit(metric, value, unit, **kw):
            row = {"metric": metric, "value": value, "unit": unit, **kw}
            results.append(row)
            print(json.dumps(row), flush=True)
        try:
            tail_roofline.main(emit_fn=tail_emit)
        except Exception as exc:  # pragma: no cover - device dependent
            log(f"tail_roofline failed: {exc}")

    # ---- write RESULTS.md --------------------------------------------
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "RESULTS.md")
    # group the table: device rows, serving/byte rows, diagnostics,
    # host-core rows, virtual-mesh rows (stable within each group —
    # measurement ORDER is host-rows-first, see the methodology note)
    def _group(r):
        m, u = r["metric"], r["unit"]
        if m.startswith("cpu_mesh_"):
            return 4
        if u in ("ops/s/chip", "transforms/s/chip", "slot-ops/s/chip"):
            return 0
        if m.startswith(("byte_codec_", "byte_server_")) or u in (
                "reqs/s/host", "ops/s/host", "x", "ops/s/host+chip"):
            return 1
        if u == "ops/s/host-core":
            return 3
        return 2

    with open(out_path, "w") as f:
        f.write("# Benchmark results (canonical; regenerate with "
                "`python benchmarks/report.py`)\n\n")
        f.write(f"Device: {dev.platform} {dev.device_kind}\n\n")
        f.write("| Metric | Value | Unit |\n|---|---|---|\n")
        for r in sorted(results, key=_group):
            f.write(f"| {r['metric']} | {r['value']:,} | {r['unit']} |\n")
        tail = [r for r in results if r["metric"].startswith("tail_")]
        if tail:
            f.write(
                "\n## BEHZ-tail per-segment roofline "
                "(benchmarks/tail_roofline.py)\n\n"
                "Minimum modmul counts per op by primitive (algorithmic "
                "floors), the no-fusion primitive-sustained time model, "
                "the HBM read+write floor, and the measured segment time "
                "(scan-chain slope, chain-mix subtracted).  Measured "
                "values BELOW the model/HBM floor mean XLA fused the "
                "segment into its consumer (outputs never materialize) — "
                "exactly what happens inside the real pipeline.\n\n"
                "| Segment | share of op | min Shoup/gen/Barrett | "
                "measured | model | HBM floor | vs model | vs HBM |\n"
                "|---|---|---|---|---|---|---|---|\n")
            for r in tail:
                seg = r["metric"][5:-12]  # tail_<seg>_time_per_op
                f.write(
                    f"| {seg} | {r.get('share_of_op', '—')} | "
                    f"{r.get('min_shoup', 0)}/{r.get('min_general', 0)}/"
                    f"{r.get('min_barrett', 0)} | "
                    f"{r['value'] * 1e6:.2f} µs | "
                    f"{r.get('model_s', 0) * 1e6:.2f} µs | "
                    f"{r.get('hbm_floor_s', 0) * 1e6:.2f} µs | "
                    f"{r.get('ratio_vs_model', '—')} | "
                    f"{r.get('ratio_vs_hbm', '—')} |\n")
            acc = next((r for r in results
                        if r["metric"] == "accounted_fraction"), None)
            if acc:
                f.write(f"\nSegment + NTT times reconstruct "
                        f"{acc['value'] * 100:.1f}% of the measured op "
                        "time; the remainder is cross-segment fusion "
                        "boundaries and per-dispatch overhead.\n")
        f.write(
            "\n## Serving: prepared-operand pooling\n\n"
            "Streams that reuse ciphertexts (the pooled 10k-request"
            " benchmark, and any realistic serving mix) run the"
            " operand-independent BEHZ half (Bsk lift + forward NTTs, ~1/3"
            " of a multiply) once per pooled ciphertext"
            " (JaxEngine._prepare / _mul_relin_prepared) instead of once"
            " per request -- worth ~+55% on the mixed stream; outputs"
            " bit-identical.\n\n"
            "Round 5 wires this into the BYTE surface: ByteServer dedups"
            " each cc window's operands by content digest (+ exact-byte"
            " verification on digest hits) and runs the pooled"
            " prepared-mul path with bucketed direct dispatch"
            " (serve.py _run_cc_pooled; tests/test_serve_pooled.py pins"
            " byte-equality).  Each distinct ciphertext transfers once"
            " AND prepares once -- on the tunnel-bound dev setup this"
            " lifted the e2e mul row ~25 -> ~155 ops/s, and on a"
            " co-located host it raises the device-side ceiling toward"
            " the pooled 10k-stream rate.\n"
            "\n## Serving: byte-surface decomposition\n\n"
            "The byte_server_* / byte_codec_* rows decompose the product"
            " surface (calldata in -> calldata out, c_fhe.rs:8-59):"
            " codec-only rows are the C++ host codec"
            " (libc_fhe_native.so fhe_tpu_* entry points) in worker"
            " threads with NO device work; byte_server_*_mul rows are the"
            " full pipeline measured HERE and are bound by the ~20 MB/s"
            " dev-tunnel transfer (~525 KB/request round trip) -- an"
            " environment artifact, labeled as such; the colocated"
            " projection row is min(codec, device) under the server's"
            " decode-ahead window overlap, i.e. what a host wired to its"
            " chip by PCIe/ICI would sustain (PCIe gen4 transfer adds <2%"
            " at these sizes).  On this 4-core host the projection is"
            " host-codec-bound; production hosts with more cores move it"
            " toward the device rate.  The codec itself runs near its"
            " zstd floor: level-3 compress of one output ciphertext"
            " measures ~860 us/core here (the LEVEL is consensus-pinned"
            " byte format, not a tunable) and each input decompress"
            " ~160 us, so the ~1.6 ms/request single-core roundtrip is"
            " ~75% raw zstd — remaining copies/checks are not the lever;"
            " host cores are.\n"
            "\n## Serving: continuous-mode latency (serve_latency rows)\n\n"
            "The serve_latency_* rows drive the queue-fed continuous"
            " ByteServer (start_continuous, flush_ms=5 window policy) with"
            " open-loop Poisson arrivals at fractions of the measured"
            " saturation rate, on the host-CPU XLA device in a fresh"
            " subprocess (a co-located accelerator only shrinks the device"
            " term).  Batch shapes bucket to powers of two"
            " (parallel/stream.bucket_batch) with ON-DEVICE padding, so"
            " the jit ladder is ~log2(max_batch) programs per op family"
            " and transfers stay at the real batch size; unbucketed"
            " variable windows recompiled per length (p50 was ~6 s)."
            "  See docs/SERVING.md 'Continuous serving & latency'.\n"
            "\n## Methodology notes\n\n"
            "* The headline mul+relin metric uses DISTINCT operands"
            " (mul_relin(c, roll(c,1))): a squaring chain lets XLA CSE the"
            " two operands' forward transforms and reads ~45% higher (kept"
            " as the separate _square_ row; round 1's 8,702 figure was"
            " squaring-based).\n"
            "* ALL host-CPU rows (byte_codec_*, *host-core* rows, and the"
            " cpu_mesh_* subprocesses) are measured FIRST, in fresh"
            " processes, before this report opens the TPU client: a"
            " process that has pushed tunnel traffic (or co-runs with"
            " one) measures host-core rates up to ~3x low — its resident"
            " transfer threads contend for the 4 physical CPUs.\n"
            "* cpu_mesh_* rows run on virtual CPU devices sharing physical"
            " cores: they validate the sharded program and multi-process"
            " plumbing (the 2-process Gloo row vs the single-process dp8"
            " row), NOT chip-scaling efficiency -- no pod hardware is"
            " available, so the >=80% 2-host north star remains unmeasured"
            " on real chips.\n"
            "* Remote-tunnel measurement noise is +-10-15% run-to-run;"
            " chain-slope timing is used throughout.  The shared dev chip"
            " additionally shows multi-minute CONTENTION WINDOWS (identical"
            " code measured 6.7k/12.8k/19.4k mul+relin/s within an hour):"
            " all optimization decisions use interleaved A/B"
            " (tools/ab_bench.py); absolute rows here come from one run and"
            " carry that window's bias.\n"
            "* The decrypt row uses the EXACT multiword-CRT path"
            " (ops/wide.py; round 5): interleaved A/B vs the retired"
            " t-gamma approximation measured -6.5% in one window and"
            " neutral-to-faster in others — within contention noise;"
            " exactness on adversarial inputs is a consensus requirement,"
            " not a tunable.\n"
            "\n## Roofline notes (round-3 state: u32-pair backend)\n\n"
            "* The radix-4 shoup40 pair NTT measures ~1.0M transforms/s at"
            " n=4096 x 786KB HBM read+write per transform (6 fused chunk"
            " passes) = ~95% of v5e's 819 GB/s HBM peak -- the NTT is"
            " MEMORY-BANDWIDTH-BOUND at speed-of-light for this"
            " formulation.  mul+relin spends ~60% of its time in its 47"
            " transforms; the BEHZ tail between transforms is"
            " compute/occupancy-bound VPU work.\n"
            "* Directions measured and closed (interleaved A/B, all"
            " bit-exact, code kept with tests): (1) VMEM-resident fused"
            " Pallas NTT = 0.46x -- removing 5 of 6 HBM passes costs the"
            " SIMD select-both penalty, 2x products/point"
            " (ops/pallas_pair_ntt.py); (2) u8 hi-plane chunk boundaries ="
            " 0.89-0.96x -- (32,128)-tile u8 pack/unpack exceeds the 3"
            " bytes/residue saved (ntt_pair hi8 flag); (3) radix-8 chunks"
            " lose to vreg spills standalone AND e2e; (4) MXU"
            " digit-decomposition NTT: >=5 8-bit digit planes inflate work"
            " ~25x vs the MXU's ~10x rate advantage at n=4096"
            " (ops/mxu_ntt.py).\n"
            "* The old whole-op vpu_utilization_estimate row is RETIRED:"
            " the binding constraints are now accounted per segment (the"
            " BEHZ-tail table above): the NTT runs at ~95% of HBM peak"
            " and carries ~60% of op time; every tail segment measures"
            " BELOW its no-fusion primitive-sustained model (XLA already"
            " fuses passes), and the only segment above 1.3x its model"
            " (mod_down) carries ~4% of op time, bounding its possible"
            " whole-op gain under 3%.  Further gains must remove"
            " transforms or modmuls (algorithmic), not improve"
            " occupancy.\n")
    log("wrote benchmarks/RESULTS.md")


if __name__ == "__main__":
    if "--host-rows" in sys.argv:
        # fresh-process host-CPU rows (no JAX, no TPU): see host_rows()
        def _emit(metric, value, unit, baseline=None):
            print(json.dumps({"metric": metric, "value": round(value, 2),
                              "unit": unit}), flush=True)
        host_rows(_emit, quick="--quick" in sys.argv)
    else:
        main()
