"""Pooled byte-serving: window-level operand dedup == per-request bytes.

Serving streams reuse ciphertexts; ByteServer dedups each window's cc
operands by content digest and runs the pooled-fused engine path (each
distinct operand transfers once and, for muls, runs the operand-
independent BEHZ half once -- engine._prepare).  The contract stays
byte-equality with FheApp.call per request.
"""
import hashlib

import numpy as np
import pytest

from fhe_precompiles_tpu import FheApp, pack
from fhe_precompiles_tpu.app import _CT_CODEC
from fhe_precompiles_tpu.encoding import PLAIN_TYPES
from fhe_precompiles_tpu.serve import ByteServer
from fhe_precompiles_tpu.testnet import one

FHE = one.FHE


@pytest.fixture(scope="module")
def setup():
    app = FheApp(FHE.params, engine="jax")
    server = ByteServer(FHE.params, app=app, codec="native")
    return app, server


def _ct(value, tag):
    poly = PLAIN_TYPES["u64"].encode(value, FHE.params)
    return FHE.ctx.encrypt(poly, FHE.public_key,
                           hashlib.sha512(tag).digest())


def _reuse_stream(n_requests=40, n_distinct=4, seed=3):
    cts = [_ct(v + 1, b"pool%d" % v) for v in range(n_distinct)]
    rng = np.random.default_rng(seed)
    reqs = []
    for _ in range(n_requests):
        op = rng.choice(["add", "sub", "mul"])
        a, b = cts[rng.integers(n_distinct)], cts[rng.integers(n_distinct)]
        reqs.append((f"{op}_cipheru64_cipheru64",
                     pack.pack_binary_operation(FHE.public_key, a, _CT_CODEC,
                                                b, _CT_CODEC)))
    return reqs


def test_pooled_path_engages_and_matches(setup, monkeypatch):
    app, server = setup
    calls = []
    orig = ByteServer._run_cc_pooled

    def spy(self, items, pairs, pool_list, view):
        calls.append((len(items), len(pool_list)))
        return orig(self, items, pairs, pool_list, view)
    monkeypatch.setattr(ByteServer, "_run_cc_pooled", spy)
    reqs = _reuse_stream()
    got = server.run(reqs)
    assert calls, "reuse-heavy window should take the pooled path"
    n_items, n_pool = calls[0]
    assert n_pool < 2 * n_items
    for (name, data), res in zip(reqs, got):
        assert res == app.call(name, data), name


def test_distinct_operands_take_plain_path(setup, monkeypatch):
    app, server = setup
    pooled_calls = []
    monkeypatch.setattr(
        ByteServer, "_run_cc_pooled",
        lambda self, *a: pooled_calls.append(1) or
        ByteServer.__dict__["_run_cc_pooled"](self, *a))
    reqs = []
    for v in range(6):  # every operand distinct: pool == 2 * items
        a, b = _ct(v, b"da%d" % v), _ct(v + 50, b"db%d" % v)
        reqs.append(("add_cipheru64_cipheru64",
                     pack.pack_binary_operation(FHE.public_key, a, _CT_CODEC,
                                                b, _CT_CODEC)))
    got = server.run(reqs)
    assert not pooled_calls
    for (name, data), res in zip(reqs, got):
        assert res == app.call(name, data)


def test_pooled_mixed_with_fallbacks_and_errors(setup):
    app, server = setup
    reqs = _reuse_stream(24, 3, seed=9)
    # interleave threshold + error requests between pooled cc ones
    reqs.insert(5, ("encrypt_u64",
                    pack.pack_two_arguments(9, pack.U64, b"x", pack.BYTES)))
    reqs.insert(11, ("mul_cipheru64_cipheru64", b"\x00\x01"))
    net = _ct(7, b"pnet")
    reqs.insert(17, ("decrypt_u64", pack.pack_one_argument(net, _CT_CODEC)))
    got = server.run(reqs)
    for (name, data), res in zip(reqs, got):
        assert res == app.call(name, data), name


def test_pooled_squaring_requests(setup):
    """a == b (squares): both operands dedup to ONE pool entry."""
    app, server = setup
    c = _ct(12, b"sq")
    data = pack.pack_binary_operation(FHE.public_key, c, _CT_CODEC,
                                      c, _CT_CODEC)
    reqs = [("mul_cipheru64_cipheru64", data)] * 10
    got = server.run(reqs)
    want = app.call(*reqs[0])
    assert all(r == want for r in got)


def test_adversarial_cts_through_server(setup):
    """Boundary (c1=0) and garbage ciphertexts through the SERVER's
    batched decrypt/reencrypt/add paths: bytes must equal FheApp.call
    exactly (the server rides the same exact-CRT decrypt; pin it at this
    surface too)."""
    app, server = setup
    P = FHE.params
    k, n = len(P.ct_moduli), P.n
    from fhe_precompiles_tpu.bfv.golden import Ciphertext
    q, t = P.q, P.t
    reqs = []
    for m in (0, 1, t - 1):
        x = (m * q - q // 2) // t % q
        data = np.zeros((2, k, n), dtype=np.uint64)
        for j, p in enumerate(P.ct_moduli):
            data[0, j, 0] = x % p
        blob = Ciphertext(P, data).to_bytes()
        reqs.append(("decrypt_i64", pack.pack_one_argument(blob, pack.BYTES)))
        reqs.append(("decrypt_frac64",
                     pack.pack_one_argument(blob, pack.BYTES)))
        reqs.append(("reencrypt_i64", pack.pack_binary_operation(
            FHE.public_key, Ciphertext.from_bytes(blob), _CT_CODEC,
            b"\x01", pack.BYTES)))
        # and through the pooled add path (steered garbage operands)
        other = _ct(3, b"adv%d" % m)
        reqs.append(("add_cipheri64_cipheri64", pack.pack_binary_operation(
            FHE.public_key, Ciphertext.from_bytes(blob), _CT_CODEC,
            other, _CT_CODEC)))
    got = server.run(reqs)
    for (name, data), res in zip(reqs, got):
        assert res == app.call(name, data), name


def test_pooled_continuous_mode(setup):
    app, server = setup
    reqs = _reuse_stream(30, 3, seed=21)
    server.start_continuous(flush_ms=10.0)
    try:
        futs = [server.submit(name, data) for name, data in reqs]
        got = [f.result(timeout=300) for f in futs]
    finally:
        server.stop_continuous()
    for (name, data), res in zip(reqs, got):
        assert res == app.call(name, data), name


def test_concurrent_submitters(setup):
    """submit() from many threads: thread-safe queueing, every future
    resolves to the per-request bytes."""
    import concurrent.futures
    app, server = setup
    reqs = _reuse_stream(32, 3, seed=33)
    want = [app.call(name, data) for name, data in reqs]
    server.start_continuous(flush_ms=5.0)
    try:
        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
            futs = list(ex.map(
                lambda nd: server.submit(*nd).result(timeout=300), reqs))
    finally:
        server.stop_continuous()
    assert futs == want


def test_serving_metrics(setup):
    from fhe_precompiles_tpu import metrics
    app, server = setup
    reqs = _reuse_stream(20, 3, seed=40)
    reqs.append(("mul_cipheru64_cipheru64", b"\x00"))  # error request
    metrics.GLOBAL.reset()
    metrics.enable()
    try:
        server.run(reqs)
        snap = metrics.GLOBAL.snapshot()
    finally:
        metrics.disable()
        metrics.GLOBAL.reset()
    total = sum(s.count for op, s in snap.items()
                if op.endswith("cipheru64_cipheru64"))
    assert total == len(reqs)
    errs = sum(s.errors for s in snap.values())
    assert errs == 1
    assert snap["byteserver.pooled_windows"].count >= 1
    assert (snap["byteserver.pool_distinct"].count
            < snap["byteserver.pool_requests"].count)
    # wall time attributed: ops_per_sec computable
    any_op = next(op for op in snap if op.endswith("cipheru64_cipheru64"))
    assert snap[any_op].ops_per_sec > 0
