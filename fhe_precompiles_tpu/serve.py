"""ByteServer: batched byte-in/byte-out precompile serving for TPU hosts.

The reference's deployment surface is one calldata blob per call
(``/root/reference/src/c_fhe.rs:8-59`` — bytes in, bytes out, error code).
A TPU wants large batches.  This driver bridges the two worlds end to end:

  host threads  unpack calldata (zstd + bincode release the GIL)
  device        cipher∘cipher groups run as batched XLA programs
                (RequestStream over an optional mesh)
  host threads  repack result ciphertexts (zstd)

Per-request outputs — payload bytes AND error codes — are byte-identical
to ``FheApp.call`` one at a time (tests/test_serve.py pins this against
both the jax and golden engines), so a node can front a TPU with this
server while CPU validators replay the same stream call-by-call and stay
in consensus.

Two host codecs:

* ``codec="python"`` — the pack/keyio/zstd stack in Python; batches the
  12 cipher∘cipher ops, everything else falls back to per-request
  ``FheApp.call``.
* ``codec="native"`` — the C++ codec in libc_fhe_native.so (fhe_tpu_*
  extension, native/codec.py): decode/encode run GIL-free in C++ worker
  threads, and the batched surface widens to all 36 binary ops (cp/pc
  plain ops batch on device too) plus the full threshold API —
  encrypt_*, decrypt_* and reencrypt_* (network-key decrypt batch, C++
  decode/seed/re-encode, target-key encrypt batch grouped by key).
  Only odd-sized ciphertexts fall back.

Requests are grouped by (op kind, public key): the pk parse caches (both
stacks) return one identity per distinct key bytes, and each group shares
one device-resident relin key.
"""
from __future__ import annotations

import contextlib
import hashlib
import os
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence, Tuple

import numpy as np

from . import pack
from .app import _CT_CODEC, _PK_CODEC, FheApp, PRECOMPILE_NAMES
from .bfv.golden import Ciphertext
from .errors import FheError, FheErrorCode
from .params import Params


class _EncPk:
    """Duck-typed PublicKey carrying only pk data (encrypt_batch reads
    pk.data[:, :k])."""

    __slots__ = ("data",)

    def __init__(self, data):
        self.data = data


class _PkView:
    """Duck-typed PublicKey carrying only relin data (RequestStream's
    contract: pk.relin is None or pk.relin.data is the (k_ct,2,k_key,n)
    array)."""

    class _Relin:
        __slots__ = ("data",)

        def __init__(self, data):
            self.data = data

    __slots__ = ("relin",)

    def __init__(self, rk_data=None):
        self.relin = None if rk_data is None else _PkView._Relin(rk_data)

#: name -> (op, shape, tname) for the 36 binary precompiles
#: (same generation rule as app._install_ops, fhe.rs:161-576).
BINARY_SPECS = {}
for _t in ("u256", "u64", "i64", "frac64"):
    _c = f"cipher{_t}"
    for _op in ("add", "sub", "mul"):
        BINARY_SPECS[f"{_op}_{_c}_{_c}"] = (_op, "cc", _t)
        BINARY_SPECS[f"{_op}_{_c}_{_t}"] = (_op, "cp", _t)
        BINARY_SPECS[f"{_op}_{_t}_{_c}"] = (_op, "pc", _t)


class ByteServer:
    """Serve byte-level precompile requests batched on a TPU (or CPU) host."""

    def __init__(self, params: Params, mesh=None, workers: Optional[int] = None,
                 max_batch: int = 128, app: Optional[FheApp] = None,
                 codec: str = "python"):
        from .ops.engine import JaxEngine  # deferred: heavy import
        from .parallel.stream import RequestStream

        self.app = app if app is not None else FheApp(params, engine="jax")
        if self.app._engine is None or not isinstance(self.app._engine,
                                                      JaxEngine):
            raise ValueError("ByteServer requires an FheApp(engine='jax')")
        self.params = params
        self.stream = RequestStream(self.app._engine, mesh=mesh,
                                    max_batch=max_batch)
        self.workers = workers or min(32, os.cpu_count() or 1)
        self.max_batch = max_batch
        #: requests per pipeline window (native codec): one window decodes
        #: ahead while the previous computes/serializes.  Two device batches
        #: per window keeps batches full without delaying overlap.
        self.pipeline_window = 2 * max_batch
        if codec == "native":
            from .native.codec import NativeCodec
            self.codec: Optional[NativeCodec] = NativeCodec(self.app)
        elif codec == "python":
            self.codec = None
        else:
            raise ValueError(f"unknown codec {codec!r}")
        # ONE worker pool for the server's lifetime: a pool per run() would
        # spawn fresh OS threads every window, each paying thread-local
        # codec state (zstd contexts, scratch) again
        self._pool = ThreadPoolExecutor(max_workers=self.workers)

    def close(self) -> None:
        """Shut down the continuous loop (if running) and the worker pool
        (idempotent)."""
        self.stop_continuous()
        self._pool.shutdown(wait=True)

    # ------------------------------------------------------------------
    # continuous (queue-fed) serving: per-call latency surface
    # ------------------------------------------------------------------
    def start_continuous(self, flush_ms: float = 5.0,
                         max_window: Optional[int] = None) -> None:
        """Start the queue-fed serving loop.

        The reference's product contract is per-call (c_fhe.rs:8-59); a
        batching front end must bound how long a request waits for its
        window.  Policy: a window flushes when it reaches ``max_window``
        requests OR ``flush_ms`` milliseconds after its first request
        arrived, whichever comes first -- so an idle server answers a lone
        request within ~flush_ms + one-request compute time, and a loaded
        server runs full windows back to back (latency-vs-load curves:
        benchmarks/serve_latency.py, docs/SERVING.md).
        """
        import queue
        import threading
        if getattr(self, "_cthread", None) is not None:
            raise RuntimeError("continuous mode already running")
        self._cq: "queue.Queue" = queue.Queue()
        self._cstop = threading.Event()
        self._cthread = threading.Thread(
            target=self._continuous_loop,
            args=(flush_ms / 1000.0, max_window or self.pipeline_window),
            name="byteserver-continuous", daemon=True)
        self._cthread.start()

    def submit(self, name: str, data: bytes):
        """Enqueue one request; returns a Future of (code, payload_bytes)
        identical to ``FheApp.call(name, data)``."""
        from concurrent.futures import Future
        if getattr(self, "_cthread", None) is None:
            raise RuntimeError("call start_continuous() first")
        fut: "Future" = Future()
        self._cq.put((name, data, fut))
        return fut

    def stop_continuous(self) -> None:
        """Stop the loop after draining every queued request (idempotent)."""
        t = getattr(self, "_cthread", None)
        if t is None:
            return
        self._cstop.set()
        t.join()
        self._cthread = None

    def _continuous_loop(self, flush_s: float, max_window: int) -> None:
        import queue
        import time
        while True:
            try:
                item = self._cq.get(timeout=0.02)
            except queue.Empty:
                if self._cstop.is_set():
                    return
                continue
            window = [item]
            deadline = time.monotonic() + flush_s
            while len(window) < max_window:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    window.append(self._cq.get(timeout=remaining))
                except queue.Empty:
                    break
            reqs = [(name, data) for name, data, _f in window]
            try:
                outs = self.run(reqs)
            except Exception as exc:  # device-phase faults degrade to the
                # per-request fallback inside run(); reaching here means a
                # harness-level failure -- surface it on every future
                for _n, _d, f in window:
                    f.set_exception(exc)
                continue
            for (_n, _d, f), out in zip(window, outs):
                f.set_result(out)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------------
    def _decode_cc(self, name: str, data: bytes):
        """Replicates FheApp._binary_op's decode + validation exactly
        (same codecs, same checks, same error codes) and returns
        (op, pk, ct_a, ct_b) or raises FheError."""
        op, shape, _tname = BINARY_SPECS[name]
        assert shape == "cc"
        pk, a, b = pack.unpack_binary_operation(
            data, _PK_CODEC, _CT_CODEC, _CT_CODEC)
        self.app._check_params(pk, FheErrorCode.RUNTIME_ERROR)
        self.app._check_params(a, FheErrorCode.RUNTIME_ERROR)
        self.app._check_params(b, FheErrorCode.RUNTIME_ERROR)
        if op == "mul" and pk.relin is None:
            raise FheError(FheErrorCode.RUNTIME_ERROR,
                           "public key lacks relinearization keys")
        if op == "mul" and pk.relin.params != self.params:
            # app.py _run_op rk-params guard (consensus: see that comment)
            raise FheError(FheErrorCode.RUNTIME_ERROR,
                           "relin key parameter set mismatch")
        return op, pk, a, b

    # ------------------------------------------------------------------
    def run(self, requests: Sequence[Tuple[str, bytes]]
            ) -> List[Tuple[int, bytes]]:
        """Execute a mixed byte-request stream; returns per-request
        (error_code, payload) in input order, byte-equal to FheApp.call.

        With ``metrics.enable()``, per-op counters/bytes/errors are
        recorded (batch wall time attributed per op share) plus pooled-
        window stats under ``byteserver.pool*`` keys."""
        from . import metrics
        if not metrics.GLOBAL.enabled:
            if self.codec is not None:
                return self._run_native(requests)
            return self._run_python(requests)
        import time as _time
        t0 = _time.perf_counter()
        results = (self._run_native(requests) if self.codec is not None
                   else self._run_python(requests))
        dt = _time.perf_counter() - t0
        per_op: dict = {}
        for (name, data), (code, payload) in zip(requests, results):
            c, e, bi, bo = per_op.get(name, (0, 0, 0, 0))
            per_op[name] = (c + 1, e + (1 if code else 0),
                            bi + len(data), bo + len(payload))
        total = max(1, len(requests))
        for name, (c, e, bi, bo) in per_op.items():
            metrics.GLOBAL.record_batch(name, c, dt * c / total, bi, bo, e)
        return results

    # ------------------------------------------------------------------
    def _bucket(self, b: int) -> int:
        """Bucketed (power-of-two) batch size: XLA compiles one program
        per bucket instead of one per window length (continuous serving
        produces arbitrary lengths).  Padding happens ON DEVICE
        (ops/engine.pad_rows via the *_batch target_batch params), so
        host->device transfers stay at the real batch size; pad rows are
        trimmed by the callers, bytes unchanged."""
        from .parallel.stream import bucket_batch
        return bucket_batch(b, 1, self.max_batch)

    # ------------------------------------------------------------------
    def _run_cc_pooled(self, items, pairs, pool_list, view):
        """Pooled-fused cc execution (one device dispatch per op kind).

        items: [(req_idx, op, a, b)]; pairs[j] = (pool_ia, pool_ib);
        pool_list: distinct (2, k, n) operand arrays.  Pool size and each
        dispatch's batch are bucketed to powers of two (device-side
        padding) so continuous windows reuse a bounded jit ladder --
        deliberately NOT the fixed-chunk fused-scan path
        (stream._fused_ops), which pads every window up to max_batch and
        wastes up to CBx device work on small continuous windows
        (measured: dev-host saturation 160 -> ~100 reqs/s).  Returns
        per-item host (2, k, n) arrays in item order, bit-identical to
        the unpooled path (prepared-mul equality is pinned by the engine
        tests; the server equality by test_serve_pooled.py)."""
        import jax.numpy as jnp
        from .ops.engine import pad_rows
        from .parallel.stream import bucket_batch
        eng = self.app._engine
        CB = self.stream.max_batch
        pool_raw = pad_rows(jnp.asarray(np.stack(pool_list)),
                            bucket_batch(len(pool_list), 1, CB))
        order: dict = {}
        for j, (_i, op, _a, _b) in enumerate(items):
            order.setdefault(op, []).append(j)
        pool_prep = rk = rk_ws = None
        if "mul" in order:
            rk = jnp.asarray(view.relin.data)
            rk_ws = jnp.asarray(eng.relin_shoup(view.relin.data))
            # operand-independent BEHZ half ONCE per pooled ciphertext
            pool_prep = eng._prepare(pool_raw)
        results: list = [None] * len(items)
        for op, idxs in order.items():
            for c0 in range(0, len(idxs), CB):
                chunk = idxs[c0:c0 + CB]
                t = bucket_batch(len(chunk), 1, CB)
                ia = np.zeros(t, dtype=np.int64)
                ib = np.zeros(t, dtype=np.int64)
                for s, j in enumerate(chunk):
                    ia[s], ib[s] = pairs[j]
                if op == "mul":
                    a = jnp.take(pool_prep, jnp.asarray(ia), axis=0)
                    b = jnp.take(pool_prep, jnp.asarray(ib), axis=0)
                    out = eng._mul_relin_prepared(a, b, rk, rk_ws)
                else:
                    a = jnp.take(pool_raw, jnp.asarray(ia), axis=0)
                    b = jnp.take(pool_raw, jnp.asarray(ib), axis=0)
                    out = eng._add(a, b) if op == "add" else eng._sub(a, b)
                host = np.asarray(out)
                for s, j in enumerate(chunk):
                    results[j] = host[s]
        return results

    # ------------------------------------------------------------------
    def _decode_native(self, name: str, data: bytes):
        """One request through the C++ codec: (kind, payload) routing."""
        cod = self.codec
        if name not in PRECOMPILE_NAMES:
            return "err", int(FheErrorCode.INVALID_ENCODING)
        if name == "public_key_bytes":
            return "done", (0, self.app.public_key_bytes())
        head, _, rest = name.partition("_")
        if head == "encrypt":
            code, m, seed = cod.unpack_encrypt(rest, data)
            return ("err", code) if code else ("enc", (m, seed))
        if head == "decrypt":
            code, ct, size = cod.unpack_decrypt(data)
            if code:
                return "err", code
            if size != 2:
                return "fallback", None
            return "dec", (rest, ct)
        if head == "reencrypt":
            code, ct, size, pk = cod.unpack_reencrypt(data)
            if code:
                return "err", code
            if size != 2:
                return "fallback_pk", pk
            return "reenc", (rest, ct, pk)
        code, shape, op, ct, other, ct_size, other_size, pk = \
            cod.unpack_binary(name, data)
        if code:
            return "err", code
        if shape == "cc":
            if ct_size != 2 or other_size != 2:
                return "fallback_pk", pk
            return "cc", (op, pk, ct, other)
        # cp/pc plain ops never touch the pk
        if ct_size != 2:
            return "fallback_pk", pk
        if op == "add":
            fn = "add_plain"
        elif op == "mul":
            fn = "mul_plain"
        else:
            fn = "sub_plain" if shape == "cp" else "plain_sub"
        return "plain_pk", (fn, ct, other, pk)

    def _run_native(self, requests: Sequence[Tuple[str, bytes]]
                    ) -> List[Tuple[int, bytes]]:
        """Native-codec path: C++ decode/encode in worker threads (GIL-free,
        ctypes releases it per call), device compute batched per op family.
        Batches all 36 binary ops (cp/pc plaintext polys encoded by the C++
        codec) plus the full threshold API (encrypt/decrypt/reencrypt);
        only odd-size ciphertexts fall back to the per-request path (same
        bytes either way).

        The stream is processed in windows of ``pipeline_window`` requests
        with one-window decode-ahead: while window w computes on device and
        its outputs serialize, window w+1's calldata is already decoding in
        the C++ worker threads — host codec and device compute overlap
        instead of running in distinct phases."""
        from .parallel.stream import Request

        cod = self.codec
        app = self.app
        eng = app._engine
        n_req = len(requests)
        results: List[Optional[Tuple[int, bytes]]] = [None] * n_req
        fallback: list[int] = []

        W = self.pipeline_window
        windows = [list(range(w0, min(w0 + W, n_req)))
                   for w0 in range(0, n_req, W)]

        def decode(i: int):
            name, data = requests[i]
            kind, payload = self._decode_native(name, data)
            return i, kind, payload

        def encode(job):
            i, data = job
            return i, (0, cod.pack_ciphertext(data))

        def decode_scalar(job):
            i, tname, poly = job
            return i, cod.decode_scalar(tname, poly)

        # one shared pool for the server's lifetime (see __init__)
        with contextlib.nullcontext(self._pool) as pool:
            futs = [pool.submit(decode, i) for i in windows[0]]
            for w in range(len(windows)):
                decoded = [f.result() for f in futs]
                if w + 1 < len(windows):  # decode-ahead: overlaps all below
                    futs = [pool.submit(decode, i) for i in windows[w + 1]]

                cc_groups: dict[int, list] = {}
                pk_by_id: dict[int, object] = {}
                plain_jobs: dict[str, list] = {}
                enc_jobs: list = []
                dec_jobs: list = []
                reenc_jobs: list = []
                refs: list = []
                for i, kind, payload in decoded:
                    if kind == "err":
                        results[i] = (payload, b"")
                    elif kind == "done":
                        results[i] = payload
                    elif kind == "fallback":
                        fallback.append(i)
                    elif kind == "fallback_pk":
                        fallback.append(i)
                        refs.append(payload)
                    elif kind == "enc":
                        enc_jobs.append((i,) + payload)
                    elif kind == "dec":
                        dec_jobs.append((i,) + payload)
                    elif kind == "reenc":
                        reenc_jobs.append((i,) + payload)
                        refs.append(payload[2])
                    elif kind == "plain_pk":
                        fn, ct, other, pk = payload
                        plain_jobs.setdefault(fn, []).append((i, ct, other))
                        refs.append(pk)
                    else:  # cc
                        op, pk, a, b = payload
                        cc_groups.setdefault(pk.id, []).append((i, op, a, b))
                        if pk_by_id.setdefault(pk.id, pk) is not pk:
                            refs.append(pk)

                # ---- device phase (this window) --------------------------
                # Every sub-batch is fault-isolated: an exception anywhere
                # in a device chunk routes THAT chunk's requests through
                # the per-request fallback (bytes identical either way)
                # instead of aborting the stream; pk handles release in the
                # finally regardless (tests/test_serve_faults.py).
                encode_jobs: list[Tuple[int, np.ndarray]] = []

                def guarded(idxs, fn):
                    try:
                        fn()
                    except Exception:
                        fallback.extend(idxs)

                try:
                    # cipher∘cipher: one device pass per distinct pk.
                    # Windows with operand REUSE run pooled-fused: each
                    # distinct ciphertext transfers and (for muls)
                    # prepares ONCE (engine._prepare: Bsk lift + forward
                    # NTTs, ~1/3 of a multiply), requests gather from the
                    # on-device pool -- the serving analog of the pooled
                    # mixed-stream benchmark (+~55% device rate, and a
                    # transfer reduction proportional to the reuse).
                    for key, items in cc_groups.items():
                        def do_cc(items=items, pk=pk_by_id[key]):
                            need_relin = any(op == "mul"
                                             for _, op, _, _ in items)
                            view = _PkView(pk.relin(cod.k, cod.kk, cod.n)
                                           if need_relin else None)
                            # dedup by digest + EXACT bytes (the same
                            # collision-proof standard as the pk caches:
                            # a digest collision must never compute with
                            # the wrong operand)
                            pool_list: list = []
                            pool_idx: dict = {}
                            pairs = []
                            for _i, _op, a, b in items:
                                pr = []
                                for operand in (a, b):
                                    h = hashlib.blake2b(
                                        operand.tobytes(),
                                        digest_size=16).digest()
                                    slot = pool_idx.get(h)
                                    if slot is not None and not \
                                            np.array_equal(
                                                pool_list[slot], operand):
                                        slot = None  # collision: new entry
                                    if slot is None:
                                        slot = len(pool_list)
                                        pool_idx[h] = slot
                                        pool_list.append(operand)
                                    pr.append(slot)
                                pairs.append(pr)
                            if len(pool_list) < 2 * len(items):
                                from . import metrics
                                metrics.GLOBAL.record_batch(
                                    "byteserver.pooled_windows", 1)
                                metrics.GLOBAL.record_batch(
                                    "byteserver.pool_requests", len(items))
                                metrics.GLOBAL.record_batch(
                                    "byteserver.pool_distinct",
                                    len(pool_list))
                                outs = self._run_cc_pooled(
                                    items, pairs, pool_list, view)
                            else:  # no reuse: plain batched path
                                reqs = [Request(op, a, b)
                                        for _, op, a, b in items]
                                outs = self.stream.run(reqs, view)
                            for (i, _op, _a, _b), out in zip(items, outs):
                                encode_jobs.append((i, out))
                        guarded([i for i, *_ in items], do_cc)

                    # cipher∘plain / plain∘cipher: batched device plain ops
                    for fn, items in plain_jobs.items():
                        dev_fn = getattr(eng, "_" + fn)
                        for c0 in range(0, len(items), self.max_batch):
                            chunk = items[c0:c0 + self.max_batch]

                            def do_plain(chunk=chunk, fn=fn, dev_fn=dev_fn):
                                import jax.numpy as jnp
                                from .ops.engine import pad_rows
                                t = self._bucket(len(chunk))
                                cts = pad_rows(jnp.asarray(
                                    np.stack([c for _, c, _ in chunk])), t)
                                ms = pad_rows(jnp.asarray(
                                    np.stack([m for _, _, m in chunk])), t)
                                if fn == "plain_sub":
                                    host = np.asarray(dev_fn(ms, cts))
                                else:
                                    host = np.asarray(dev_fn(cts, ms))
                                for slot, (i, _c, _m) in enumerate(chunk):
                                    encode_jobs.append((i, host[slot]))
                            guarded([i for i, *_ in chunk], do_plain)

                    # threshold encrypt: batched seeded encrypt, network key
                    for c0 in range(0, len(enc_jobs), self.max_batch):
                        chunk = enc_jobs[c0:c0 + self.max_batch]

                        def do_enc(chunk=chunk):
                            plains = np.stack([m for _, m, _ in chunk])
                            seeds = [s for _, _, s in chunk]
                            host = np.asarray(eng.encrypt_batch(
                                plains, app.public_key, seeds,
                                target_batch=self._bucket(len(chunk))))
                            for slot, (i, _m, _s) in enumerate(chunk):
                                encode_jobs.append((i, host[slot]))
                        guarded([i for i, *_ in chunk], do_enc)

                    # threshold decrypt: device decrypt, C++ scalar decode
                    dec_polys: list[Tuple[int, str, np.ndarray]] = []
                    for c0 in range(0, len(dec_jobs), self.max_batch):
                        chunk = dec_jobs[c0:c0 + self.max_batch]

                        def do_dec(chunk=chunk):
                            cts = np.stack([c for _, _, c in chunk])
                            host = np.asarray(eng.decrypt_batch(
                                cts, app.private_key,
                                target_batch=self._bucket(len(chunk))))
                            for slot, (i, tname, _c) in enumerate(chunk):
                                dec_polys.append((i, tname, host[slot]))
                        guarded([i for i, *_ in chunk], do_dec)

                    # reencrypt: batched network-key decrypt, C++ decode/
                    # seed/re-encode, then batched encrypt per TARGET key
                    if reenc_jobs:
                        polys: dict[int, np.ndarray] = {}
                        for c0 in range(0, len(reenc_jobs), self.max_batch):
                            chunk = reenc_jobs[c0:c0 + self.max_batch]

                            def do_rdec(chunk=chunk, c0=c0):
                                cts = np.stack([c for _, _, c, _ in chunk])
                                host = np.asarray(eng.decrypt_batch(
                                    cts, app.private_key,
                                    target_batch=self._bucket(len(chunk))))
                                for s in range(len(chunk)):
                                    polys[c0 + s] = host[s]
                            guarded([i for i, *_ in chunk], do_rdec)

                        def finish(idx):
                            i, tname, _ct, pk = reenc_jobs[idx]
                            try:
                                code, m, seed = cod.reencrypt_finish(
                                    tname, requests[i][1], polys[idx])
                            except Exception:
                                return idx, None, None, None
                            return idx, code, m, seed
                        re_groups: dict[int, list] = {}
                        for idx, code, m, seed in pool.map(
                                finish, sorted(polys)):
                            i, _t, _c, pk = reenc_jobs[idx]
                            if code is None:
                                fallback.append(i)
                            elif code:
                                results[i] = (code, b"")
                            else:
                                re_groups.setdefault(pk.id, []).append(
                                    (i, m, seed, pk))
                        for items in re_groups.values():
                            for c0 in range(0, len(items), self.max_batch):
                                chunk = items[c0:c0 + self.max_batch]

                                def do_renc(chunk=chunk, items=items):
                                    target = _EncPk(
                                        items[0][3].data(cod.kk, cod.n))
                                    plains = np.stack(
                                        [m for _, m, _, _ in chunk])
                                    seeds = [s for _, _, s, _ in chunk]
                                    host = np.asarray(eng.encrypt_batch(
                                        plains, target, seeds,
                                        target_batch=self._bucket(
                                            len(chunk))))
                                    for slot, (i, _m, _s, _p) in enumerate(
                                            chunk):
                                        encode_jobs.append((i, host[slot]))
                                guarded([i for i, *_ in chunk], do_renc)

                    # ---- host encode (C++ zstd/bincode, GIL-free) --------
                    def encode_safe(job):
                        try:
                            return encode(job)
                        except Exception:
                            return job[0], None

                    def decode_scalar_safe(job):
                        try:
                            return decode_scalar(job)
                        except Exception:
                            return job[0], None

                    for i, payload in pool.map(encode_safe, encode_jobs):
                        if payload is None:
                            fallback.append(i)
                        else:
                            results[i] = payload
                    for i, payload in pool.map(decode_scalar_safe, dec_polys):
                        if payload is None:
                            fallback.append(i)
                        else:
                            results[i] = payload
                finally:
                    # explicit release on ALL paths (GC finalizers are a
                    # backstop, not the mechanism)
                    for pk in list(pk_by_id.values()) + refs:
                        try:
                            pk.release()
                        except Exception:
                            pass

        # remaining surface: identical per-request path
        for i in fallback:
            name, data = requests[i]
            results[i] = app.call(name, data)
        return results  # type: ignore[return-value]

    # ------------------------------------------------------------------
    def _run_python(self, requests: Sequence[Tuple[str, bytes]]
                    ) -> List[Tuple[int, bytes]]:
        from .parallel.stream import Request

        n_req = len(requests)
        results: List[Optional[Tuple[int, bytes]]] = [None] * n_req
        # (idx, op, pk, a, b) for batchable requests, keyed by pk identity
        groups: dict[int, list] = {}
        pk_by_id: dict[int, object] = {}
        fallback: list[int] = []

        def decode(i: int):
            name, data = requests[i]
            if name not in PRECOMPILE_NAMES:
                return i, "err", int(FheErrorCode.INVALID_ENCODING)
            spec = BINARY_SPECS.get(name)
            if spec is None or spec[1] != "cc":
                return i, "fallback", None
            try:
                op, pk, a, b = self._decode_cc(name, data)
            except FheError as e:
                return i, "err", int(e.code)
            except Exception:
                return i, "err", int(FheErrorCode.RUNTIME_ERROR)
            # only homogeneous (size-2) ciphertexts stack into one batch
            k, n = len(self.params.ct_moduli), self.params.n
            if a.data.shape != (2, k, n) or b.data.shape != a.data.shape:
                return i, "fallback", None
            return i, "batch", (op, pk, a, b)

        with contextlib.nullcontext(self._pool) as pool:
            for i, kind, payload in pool.map(decode, range(n_req)):
                if kind == "err":
                    results[i] = (payload, b"")
                elif kind == "fallback":
                    fallback.append(i)
                else:
                    op, pk, a, b = payload
                    groups.setdefault(id(pk), []).append((i, op, a, b))
                    pk_by_id[id(pk)] = pk

            # device phase: one RequestStream.run per distinct public key;
            # a failing group degrades to the per-request fallback instead
            # of aborting the stream (tests/test_serve_faults.py)
            encode_jobs: list[Tuple[int, np.ndarray]] = []
            for key, items in groups.items():
                pk = pk_by_id[key]
                try:
                    reqs = [Request(op, a.data, b.data)
                            for _, op, a, b in items]
                    outs = self.stream.run(reqs, pk)
                except Exception:
                    fallback.extend(i for i, *_ in items)
                    continue
                for (i, _op, _a, _b), out in zip(items, outs):
                    encode_jobs.append((i, out))

            def encode(job):
                i, data = job
                try:
                    ct = Ciphertext(self.params,
                                    np.asarray(data, dtype=np.uint64))
                    return i, ct.to_bytes()
                except Exception:
                    return i, None

            for i, payload in pool.map(encode, encode_jobs):
                if payload is None:
                    fallback.append(i)
                else:
                    results[i] = (0, payload)

        # non-batchable surface: identical per-request path (sequential:
        # the jax engine's jit caches are not hammered from many threads)
        for i in fallback:
            name, data = requests[i]
            results[i] = self.app.call(name, data)
        return results  # type: ignore[return-value]
