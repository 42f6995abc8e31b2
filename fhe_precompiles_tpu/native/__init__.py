"""Native C ABI shim: build helper + ctypes binding for self-tests.

The shared library exposes the same 51 extern-C symbols as the reference
(c_fhe.rs): 49 ``c_fhe_*`` precompiles + ``fhe_free`` + ``fhe_error``.
Host-node software links ``libc_fhe.so`` directly; the ctypes wrapper here
exists so the Python test suite can exercise the ABI end-to-end.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

_DIR = os.path.dirname(os.path.abspath(__file__))
LIB_PATH = os.path.join(_DIR, "libc_fhe.so")


def build(force: bool = False) -> str:
    """Compile libc_fhe.so (idempotent); returns its path."""
    if force or not os.path.exists(LIB_PATH):
        subprocess.run(["make", "-C", _DIR, "libc_fhe.so"], check=True,
                       capture_output=True)
    return LIB_PATH


class NativeFhe:
    """ctypes view of the C ABI (for tests and Python-hosted callers)."""

    def __init__(self, path: Optional[str] = None):
        self.lib = ctypes.CDLL(path or build())
        self.lib.fhe_free.argtypes = [ctypes.c_void_p]
        self.lib.fhe_free.restype = None
        self.lib.fhe_error.argtypes = [ctypes.c_int32]
        self.lib.fhe_error.restype = ctypes.c_void_p
        # The pure-C++ library (libc_fhe_native.so) must emit
        # consensus-CANONICAL zstd frames; its linked system build may not
        # be canonical, so swap the dispatch to a verified build before
        # the first call (libc_fhe.so routes through Python's canonical
        # wheel and has no fhe_tpu_* surface -- skip).
        self.zstd_source = None
        if hasattr(self.lib, "fhe_tpu_use_libzstd"):
            from .codec import autoprobe_zstd
            self.zstd_source = autoprobe_zstd(self.lib)

    def call(self, name: str, data: bytes) -> Tuple[int, bytes]:
        fn = getattr(self.lib, f"c_fhe_{name}")
        fn.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                       ctypes.POINTER(ctypes.c_void_p),
                       ctypes.POINTER(ctypes.c_int64)]
        fn.restype = ctypes.c_int32
        out = ctypes.c_void_p()
        out_len = ctypes.c_int64()
        code = fn(data, len(data), ctypes.byref(out), ctypes.byref(out_len))
        payload = b""
        if code == 0 and out.value:
            payload = ctypes.string_at(out.value, out_len.value)
            self.lib.fhe_free(out)
        return code, payload

    def error_str(self, code: int) -> str:
        ptr = self.lib.fhe_error(code)
        try:
            return ctypes.string_at(ptr).decode()
        finally:
            self.lib.fhe_free(ptr)
