"""C ABI shim tests: the 51-symbol extern-C surface (c_fhe.rs parity).

Builds libc_fhe.so on demand (gcc + embedded CPython) and exercises it via
ctypes, plus a fully standalone C host binary.
"""
import ctypes
import os
import shutil
import subprocess

import pytest

from fhe_precompiles_tpu import pack
from fhe_precompiles_tpu.app import PRECOMPILE_NAMES

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


@pytest.fixture(scope="module")
def native():
    from fhe_precompiles_tpu.native import NativeFhe, build
    build()
    return NativeFhe()


def test_all_51_symbols_exported(native):
    for name in PRECOMPILE_NAMES:
        assert hasattr(native.lib, f"c_fhe_{name}"), name
    assert native.lib.fhe_free is not None
    assert native.lib.fhe_error is not None


def test_error_strings(native):
    assert native.error_str(1) == "Unexpected end of file"
    assert native.error_str(3) == "Invalid encoding"
    assert native.error_str(7) == "Base sunscreen error"
    assert native.error_str(42) == "Unknown error"


def test_public_key_bytes(native):
    import importlib.resources
    code, out = native.call("public_key_bytes", b"")
    assert code == 0
    embedded = (importlib.resources.files("fhe_precompiles_tpu")
                / "data" / "network.pub").read_bytes()
    assert out == embedded


def test_encrypt_decrypt_roundtrip(native):
    data = pack.pack_two_arguments(12, pack.U256, b"\x01\x02\x03", pack.BYTES)
    code, ct = native.call("encrypt_u256", data)
    assert code == 0 and len(ct) > 1000
    code, out = native.call("decrypt_u256", ct)
    assert code == 0
    assert pack.U256.deserialize(out) == 12


def test_error_codes_through_abi(native):
    code, out = native.call("add_cipheru256_cipheru256", b"\x00")
    assert code == 1 and out == b""
    code, _ = native.call("decrypt_u64", b"garbage")
    assert code == 3


def test_standalone_c_host():
    """A pure C program (no Python parent) linking the shim end-to-end."""
    d = os.path.dirname(os.path.abspath(__import__(
        "fhe_precompiles_tpu.native", fromlist=["x"]).__file__))
    from fhe_precompiles_tpu.native import build
    build()
    exe = os.path.join(d, "host_test")
    subprocess.run(
        ["gcc", os.path.join(d, "host_test.c"), "-o", exe,
         f"-L{d}", "-lc_fhe", "-lpthread", "-Wl,-rpath,$ORIGIN"],
        check=True, capture_output=True)
    res = subprocess.run([exe], capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr
    assert "HOST TEST PASSED" in res.stdout


def test_concurrent_host_threads(native):
    """Regression: after interpreter init the GIL must be released so a
    second host thread can call in (deadlocked before the PyEval_SaveThread
    fix in initialize_runtime)."""
    import concurrent.futures

    def worker(_):
        code, out = native.call("public_key_bytes", b"")
        return code == 0 and len(out) > 0

    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
        assert all(ex.map(worker, range(8), timeout=60))
