"""ByteServer fault isolation + continuous (queue-fed) serving.

Round-4 VERDICT item 5: a device-phase exception must degrade THAT
window's requests to the per-request fallback (bytes still identical to
FheApp.call), never abort the stream, and pk handles must release on all
error paths.  Item 4: the queue-fed mode must answer with per-call
futures under a window-timeout policy (reference contract is per-call,
c_fhe.rs:8-59).
"""
import pytest

from fhe_precompiles_tpu import FheApp
from fhe_precompiles_tpu.native.codec import PkRef
from fhe_precompiles_tpu.serve import ByteServer
from fhe_precompiles_tpu.testnet import one

from test_serve import _mixed_stream

FHE = one.FHE


@pytest.fixture(scope="module")
def setup():
    app = FheApp(FHE.params, engine="jax")
    server = ByteServer(FHE.params, app=app, codec="native")
    pk1, _ = FHE.generate_keys()
    pk2, _ = FHE.generate_keys()
    return app, server, pk1, pk2


def _expect(app, reqs):
    return [app.call(name, data) for name, data in reqs]


def _assert_stream_matches(app, server, reqs):
    got = server.run(reqs)
    for (name, data), res, want in zip(reqs, got, _expect(app, reqs)):
        assert res == want, name


def _count_pk_balance(monkeypatch):
    """Patch PkRef to count constructions vs releases."""
    counts = {"acq": 0, "rel": 0}
    orig_init = PkRef.__init__
    orig_release = PkRef.release

    def init(self, lib, handle):
        counts["acq"] += 1
        orig_init(self, lib, handle)

    def release(self):
        if self._handle:
            counts["rel"] += 1
        orig_release(self)

    monkeypatch.setattr(PkRef, "__init__", init)
    monkeypatch.setattr(PkRef, "release", release)
    return counts


def test_stream_run_failure_degrades_to_fallback(setup, monkeypatch):
    app, server, pk1, pk2 = setup
    reqs = _mixed_stream(pk1, pk2)
    counts = _count_pk_balance(monkeypatch)

    def boom(*_a, **_k):
        raise RuntimeError("injected device failure")
    monkeypatch.setattr(server.stream, "run", boom)
    _assert_stream_matches(app, server, reqs)
    assert counts["acq"] > 0
    assert counts["rel"] == counts["acq"], "pk handle leaked on error path"


def test_encrypt_batch_failure_degrades_to_fallback(setup, monkeypatch):
    app, server, pk1, pk2 = setup
    reqs = _mixed_stream(pk1, pk2)
    monkeypatch.setattr(server.app._engine, "encrypt_batch",
                        lambda *_a, **_k: (_ for _ in ()).throw(
                            RuntimeError("injected encrypt failure")))
    _assert_stream_matches(app, server, reqs)


def test_decrypt_batch_failure_degrades_to_fallback(setup, monkeypatch):
    app, server, pk1, pk2 = setup
    reqs = _mixed_stream(pk1, pk2)
    monkeypatch.setattr(server.app._engine, "decrypt_batch",
                        lambda *_a, **_k: (_ for _ in ()).throw(
                            RuntimeError("injected decrypt failure")))
    _assert_stream_matches(app, server, reqs)


def test_everything_failing_still_matches(setup, monkeypatch):
    """All device batching broken at once: the server becomes a slow
    per-request server, never a wrong or aborted one."""
    app, server, pk1, pk2 = setup
    counts = _count_pk_balance(monkeypatch)
    for attr in ("encrypt_batch", "decrypt_batch"):
        monkeypatch.setattr(server.app._engine, attr,
                            lambda *_a, **_k: (_ for _ in ()).throw(
                                RuntimeError("injected")))
    monkeypatch.setattr(server.stream, "run",
                        lambda *_a, **_k: (_ for _ in ()).throw(
                            RuntimeError("injected")))
    _assert_stream_matches(app, server, reqs=_mixed_stream(pk1, pk2))
    assert counts["rel"] == counts["acq"]


def test_python_codec_stream_failure_degrades(monkeypatch):
    app = FheApp(FHE.params, engine="jax")
    server = ByteServer(FHE.params, app=app, codec="python")
    pk1, _ = FHE.generate_keys()
    pk2, _ = FHE.generate_keys()
    reqs = _mixed_stream(pk1, pk2)
    monkeypatch.setattr(server.stream, "run",
                        lambda *_a, **_k: (_ for _ in ()).throw(
                            RuntimeError("injected")))
    _assert_stream_matches(app, server, reqs)
    server.close()


# ---------------------------------------------------------------------------
# continuous (queue-fed) mode
# ---------------------------------------------------------------------------

def test_continuous_mode_matches_fheapp_call(setup):
    app, server, pk1, pk2 = setup
    reqs = _mixed_stream(pk1, pk2)
    server.start_continuous(flush_ms=5.0)
    try:
        futs = [server.submit(name, data) for name, data in reqs]
        got = [f.result(timeout=120) for f in futs]
    finally:
        server.stop_continuous()
    for (name, data), res, want in zip(reqs, got, _expect(app, reqs)):
        assert res == want, name


def test_continuous_lone_request_answers_promptly(setup):
    """An idle server must flush a lone request after ~flush_ms, not wait
    for a full window."""
    import time
    app, server, pk1, _pk2 = setup
    reqs = _mixed_stream(pk1, pk1)[:1]
    server.start_continuous(flush_ms=2.0, max_window=10_000)
    try:
        # warm the compile caches so the timed request measures the policy,
        # not XLA compilation
        server.submit(*reqs[0]).result(timeout=300)
        t0 = time.monotonic()
        fut = server.submit(*reqs[0])
        res = fut.result(timeout=60)
        dt = time.monotonic() - t0
    finally:
        server.stop_continuous()
    assert res == app.call(*reqs[0])
    # generous bound: flush_ms(2ms) + one-request compute; the point is
    # "milliseconds-to-seconds", not "until 10k requests arrive"
    assert dt < 30.0


def test_continuous_drains_on_stop(setup):
    app, server, pk1, pk2 = setup
    reqs = _mixed_stream(pk1, pk2)[:6]
    server.start_continuous(flush_ms=50.0)
    futs = [server.submit(name, data) for name, data in reqs]
    server.stop_continuous()  # must drain, not drop
    got = [f.result(timeout=0.1) for f in futs]
    for (name, data), res in zip(reqs, got):
        assert res == app.call(name, data), name


def test_submit_requires_started_loop(setup):
    _app, server, _pk1, _pk2 = setup
    with pytest.raises(RuntimeError, match="start_continuous"):
        server.submit("public_key_bytes", b"")
