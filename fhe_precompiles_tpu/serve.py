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

Scope: the 12 cipher∘cipher binary ops are batched (they carry all the
FHE compute — mul+relin dominates); cipher∘plain, plain∘cipher and the
threshold API fall back to per-request ``FheApp.call`` on the same jax
engine.  Requests are grouped by (op kind, public key): the pk parse
cache (app._CachedPkCodec) returns one object per distinct key bytes, so
grouping is by object identity, and each group shares one device-resident
relin key.
"""
from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence, Tuple

import numpy as np

from . import pack
from .app import _CT_CODEC, _PK_CODEC, FheApp, PRECOMPILE_NAMES
from .bfv.golden import Ciphertext
from .errors import FheError, FheErrorCode
from .params import Params

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
                 max_batch: int = 128, app: Optional[FheApp] = None):
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
        return op, pk, a, b

    # ------------------------------------------------------------------
    def run(self, requests: Sequence[Tuple[str, bytes]]
            ) -> List[Tuple[int, bytes]]:
        """Execute a mixed byte-request stream; returns per-request
        (error_code, payload) in input order, byte-equal to FheApp.call."""
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

        with ThreadPoolExecutor(max_workers=self.workers) as pool:
            for i, kind, payload in pool.map(decode, range(n_req)):
                if kind == "err":
                    results[i] = (payload, b"")
                elif kind == "fallback":
                    fallback.append(i)
                else:
                    op, pk, a, b = payload
                    groups.setdefault(id(pk), []).append((i, op, a, b))
                    pk_by_id[id(pk)] = pk

            # device phase: one RequestStream.run per distinct public key
            encode_jobs: list[Tuple[int, np.ndarray]] = []
            for key, items in groups.items():
                pk = pk_by_id[key]
                reqs = [Request(op, a.data, b.data) for _, op, a, b in items]
                outs = self.stream.run(reqs, pk)
                for (i, _op, _a, _b), out in zip(items, outs):
                    encode_jobs.append((i, out))

            def encode(job):
                i, data = job
                ct = Ciphertext(self.params, np.asarray(data, dtype=np.uint64))
                return i, ct.to_bytes()

            for i, payload in pool.map(encode, encode_jobs):
                results[i] = (0, payload)

        # non-batchable surface: identical per-request path (sequential:
        # the jax engine's jit caches are not hammered from many threads)
        for i in fallback:
            name, data = requests[i]
            results[i] = self.app.call(name, data)
        return results  # type: ignore[return-value]
