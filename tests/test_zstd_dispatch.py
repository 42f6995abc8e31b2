"""Runtime-selectable zstd build (fhe_tpu_use_libzstd).

The serving encode path is zstd-floor-bound (level-3 compress of the
output ciphertext payload is most of the encode cost) and the system
libzstd build in some images is substantially slower than the zstd
builds shipped inside Python wheels.  The native codec therefore lets a
faster library be dlopen'd at runtime — but the compressed frames are
CONSENSUS BYTES (every validator must emit identical ciphertext blobs,
reference contract c_fhe.rs:8-59), so the swap is gated on an in-C
byte-verification against the linked library, and every test here is a
byte-equality pin across the swap.
"""
import ctypes.util
import hashlib
import importlib.util

import numpy as np
import pytest

from fhe_precompiles_tpu import FheApp
from fhe_precompiles_tpu.encoding import PLAIN_TYPES
from fhe_precompiles_tpu.native.codec import NativeCodec
from fhe_precompiles_tpu.serialization import keyio
from fhe_precompiles_tpu.testnet import one

FHE = one.FHE


@pytest.fixture(scope="module")
def setup():
    app = FheApp(FHE.params)
    cod = NativeCodec(app)
    pk = app.public_key
    poly = PLAIN_TYPES["u64"].encode(5, FHE.params)
    ct_a = FHE.ctx.encrypt(poly, pk, hashlib.sha512(b"a").digest())
    poly_b = PLAIN_TYPES["u64"].encode(7, FHE.params)
    ct_b = FHE.ctx.encrypt(poly_b, pk, hashlib.sha512(b"b").digest())
    out = FHE.ctx.mul_relin(ct_a, ct_b, pk.relin)
    arr = np.ascontiguousarray(np.array(out.data), dtype=np.uint64)
    want = keyio.save_ciphertext(out)
    yield cod, arr, want
    # leave the process on the probed (fast) library for later tests
    if cod.zstd_source != "system":
        assert cod.lib.fhe_tpu_use_libzstd(cod.zstd_source.encode()) == 0


def test_auto_probe_and_byte_equality(setup):
    """Whatever library the constructor probe selected, the emitted
    ciphertext bytes equal the Python serializer's (the consensus pin —
    this is what makes the swap safe to ship enabled by default)."""
    cod, arr, want = setup
    assert cod.pack_ciphertext(arr) == want
    # the probe either kept the linked library or found the wheel build
    assert cod.zstd_source == "system" or cod.zstd_source.endswith(".so")


def test_swap_roundtrip_bytes_pinned(setup):
    """system -> candidate -> system: identical bytes at every step."""
    cod, arr, want = setup
    assert cod.lib.fhe_tpu_use_libzstd(b"system") == 0
    assert cod.pack_ciphertext(arr) == want
    spec = importlib.util.find_spec("zstandard._cffi")
    if spec is None or not spec.origin:
        pytest.skip("no zstandard._cffi wheel build in this environment")
    rc = cod.lib.fhe_tpu_use_libzstd(spec.origin.encode())
    # rc 3 (frame mismatch) would also be a correct *refusal*; but on a
    # known-good 1.5.x candidate the swap must succeed
    assert rc == 0
    assert cod.pack_ciphertext(arr) == want
    # decode half runs through the swapped library too
    assert cod.lib.fhe_tpu_use_libzstd(b"system") == 0


def test_bad_candidates_rejected_and_codec_unharmed(setup):
    """dlopen failure and missing-symbol libraries are refused without
    touching the active dispatch."""
    cod, arr, want = setup
    assert cod.lib.fhe_tpu_use_libzstd(b"/nonexistent/libzstd.so") == 1
    libm = ctypes.util.find_library("m")
    if libm:
        assert cod.lib.fhe_tpu_use_libzstd(libm.encode()) == 2
    assert cod.pack_ciphertext(arr) == want


def test_decode_through_swapped_library(setup):
    """unpack paths (decompress half) stay byte-faithful after a swap:
    decode a real calldata blob and re-encode the ct operand."""
    cod, arr, want = setup
    from fhe_precompiles_tpu import pack
    from fhe_precompiles_tpu.app import _CT_CODEC
    pk = one.FHE.public_key
    poly = PLAIN_TYPES["u64"].encode(5, FHE.params)
    ct_a = FHE.ctx.encrypt(poly, pk, hashlib.sha512(b"a").digest())
    poly_b = PLAIN_TYPES["u64"].encode(7, FHE.params)
    ct_b = FHE.ctx.encrypt(poly_b, pk, hashlib.sha512(b"b").digest())
    blob = pack.pack_binary_operation(pk, ct_a, _CT_CODEC, ct_b, _CT_CODEC)

    def decode_cts():
        code, shape, op, ct, other, sa, sb, pkh = cod.unpack_binary(
            "mul_cipheru64_cipheru64", blob)
        assert code == 0 and shape == "cc" and op == "mul"
        pkh.release()
        return ct.copy(), other.copy()

    assert cod.lib.fhe_tpu_use_libzstd(b"system") == 0
    ref = decode_cts()
    spec = importlib.util.find_spec("zstandard._cffi")
    if spec is not None and spec.origin:
        assert cod.lib.fhe_tpu_use_libzstd(spec.origin.encode()) == 0
        got = decode_cts()
        assert all(np.array_equal(r, g) for r, g in zip(ref, got))
    assert np.array_equal(ref[0], np.array(ct_a.data))
