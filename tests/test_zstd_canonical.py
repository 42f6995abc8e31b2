"""Consensus-canonical zstd frames across stacks.

Round-5 discovery: zstd BUILDS diverge on sparse-centered-noise ciphertext
payloads (system 1.5.4 vs the canonical 1.5.7 wheel), and such payloads are
attacker-steerable through any binary op's output (inputs are arbitrary
wire-valid residues; add output = a+b mod p is fully chosen).  Before the
fix, the pure-C++ ABI (linked 1.5.4) emitted code 0 with DIFFERENT payload
bytes than the Python app on such outputs -- a live cross-stack consensus
split of exactly the class the reference's per-platform golden hashes
acknowledge (fhe.rs:2103-2119).

The framework pins canonical = zstd 1.5.7 (the build golden_hashes.json
was produced with) via checked-in frame hashes over a deterministic probe
corpus (data/zstd_canonical.json / native/zstd_canonical.h); every stack
verifies its active build and the native library auto-swaps to a verified
candidate (NativeFhe/NativeCodec autoprobe_zstd; FHE_TPU_LIBZSTD env).
"""
import ctypes
import os
import shutil
import subprocess

import numpy as np
import pytest

from fhe_precompiles_tpu import pack
from fhe_precompiles_tpu.app import _CT_CODEC
from fhe_precompiles_tpu.bfv.golden import Ciphertext
from fhe_precompiles_tpu.serialization.zstd_probes import (
    PROBES, build_probe, check_python_zstd_canonical, load_canonical)
from fhe_precompiles_tpu.testnet import one

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")

FHE = one.FHE
P = FHE.params
K, N = len(P.ct_moduli), P.n


@pytest.fixture(scope="module")
def native():
    from fhe_precompiles_tpu.native import NativeFhe
    d = os.path.join(os.path.dirname(
        os.path.abspath(__import__("fhe_precompiles_tpu").__file__)), "native")
    subprocess.run(["make", "-C", d, "libc_fhe_native.so"], check=True,
                   capture_output=True)
    nf = NativeFhe(os.path.join(d, "libc_fhe_native.so"))
    nf.lib.fhe_tpu_zstd_canonical.restype = ctypes.c_int32
    nf.lib.fhe_tpu_zstd_canonical.argtypes = []
    yield nf
    # leave the process-global dispatch canonical for later tests
    if nf.zstd_source and nf.zstd_source != "system":
        nf.lib.fhe_tpu_use_libzstd(nf.zstd_source.encode())


def _steered_add_calldata(seed: int = 3) -> bytes:
    """add calldata whose OUTPUT is a sparse-noise (divergence-window) ct."""
    rng = np.random.default_rng(seed)
    target = np.zeros((2, K, N), dtype=np.uint64)
    for comp in range(2):
        for j, p in enumerate(P.ct_moduli):
            v = np.zeros(N, dtype=np.uint64)
            idx = rng.integers(0, N, size=N // 2)
            v[idx] = rng.integers(0, 40, size=len(idx)).astype(np.uint64)
            neg = rng.integers(0, N, size=N // 4)
            v[neg] = p - rng.integers(1, 40, size=len(neg)).astype(np.uint64)
            target[comp, j] = v
    a = np.zeros_like(target)
    b = np.zeros_like(target)
    for j, p in enumerate(P.ct_moduli):
        a[:, j] = rng.integers(0, p, size=(2, N), dtype=np.uint64)
        b[:, j] = (target[:, j] + p - a[:, j]) % p
    return pack.pack_binary_operation(FHE.public_key, Ciphertext(P, a),
                                      _CT_CODEC, Ciphertext(P, b), _CT_CODEC)


def test_python_zstandard_is_canonical():
    """This environment's wheel must reproduce every canonical frame (it is
    the canonical build; a failure means the fixtures or wheel changed)."""
    assert check_python_zstd_canonical(warn=False)


def test_fixture_probe_spec_in_sync():
    doc = load_canonical()
    assert len(doc["probes"]) == len(PROBES)
    for p, e in zip(PROBES, doc["probes"]):
        assert p["id"] == e["id"]
        assert len(build_probe(p)) == e["payload_len"]


def test_native_autoprobe_lands_canonical(native):
    assert native.zstd_source not in (None, "system"), (
        "expected the canonical zstandard wheel to be found and accepted")
    assert native.lib.fhe_tpu_zstd_canonical() == 1


def test_steered_add_byte_identical_python_vs_native_abi(native):
    """The live consensus split this work fixed: an attacker-steered add
    output in the zstd divergence window must be byte-identical between
    the Python app and the pure-C++ ABI."""
    data = _steered_add_calldata()
    gp = FHE.call("add_cipheru64_cipheru64", data)
    gn = native.call("add_cipheru64_cipheru64", data)
    assert gp[0] == gn[0] == 0
    assert gp[1] == gn[1]


def test_system_build_reported_non_canonical(native):
    """On this machine the linked system build (1.5.4) is NOT canonical:
    the status API must say so, and the steered payload demonstrates the
    divergence the canonical pin protects against."""
    wheel = native.zstd_source
    assert native.lib.fhe_tpu_use_libzstd(b"system") == 0
    try:
        assert native.lib.fhe_tpu_zstd_canonical() == 0
        data = _steered_add_calldata()
        gp = FHE.call("add_cipheru64_cipheru64", data)
        gn = native.call("add_cipheru64_cipheru64", data)
        # code 0 on both, but frames differ -- the documented 1.5.4 delta
        assert gp[0] == gn[0] == 0
        assert gp[1] != gn[1]
    finally:
        assert native.lib.fhe_tpu_use_libzstd(wheel.encode()) == 0
    assert native.lib.fhe_tpu_zstd_canonical() == 1


def test_non_window_payloads_agree_even_on_system_build(native):
    """Uniform-noise ct payloads compress identically on both builds --
    pins that the divergence window is what the sparse probes say it is
    (and that ordinary traffic was never affected)."""
    wheel = native.zstd_source
    import hashlib
    seed = hashlib.sha512(b"zc").digest()
    from fhe_precompiles_tpu.encoding import PLAIN_TYPES
    ct = FHE.ctx.encrypt(PLAIN_TYPES["u64"].encode(9, P), FHE.public_key,
                         seed)
    data = pack.pack_binary_operation(FHE.public_key, ct, _CT_CODEC, ct,
                                      _CT_CODEC)
    gp = FHE.call("add_cipheru64_cipheru64", data)
    assert native.lib.fhe_tpu_use_libzstd(b"system") == 0
    try:
        gn = native.call("add_cipheru64_cipheru64", data)
        assert gp == gn
    finally:
        assert native.lib.fhe_tpu_use_libzstd(wheel.encode()) == 0


def test_explicit_bad_override_warns(tmp_path, monkeypatch):
    from fhe_precompiles_tpu.native import codec as codec_mod

    lib = type("L", (), {})()
    calls = []

    def fake_use(path):
        calls.append(path)
        return 1  # dlopen failure

    lib.fhe_tpu_use_libzstd = fake_use
    monkeypatch.setenv("FHE_TPU_LIBZSTD", str(tmp_path / "nope.so"))
    with pytest.warns(RuntimeWarning, match="failed verification"):
        src = codec_mod.autoprobe_zstd(lib)
    assert src == "system"
    assert calls  # the explicit candidate was tried
