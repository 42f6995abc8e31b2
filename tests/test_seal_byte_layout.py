"""Byte-level SEAL serialization facts, pinned against the reference blobs.

Everything here is verified directly against /root/reference's embedded key
material (mirrored in fhe_precompiles_tpu/data): member field order, zstd
level/parameters, and the exact extent of the known zstd-version deviation
(docs/GOLDEN_SEARCH_LOG.md).
"""
import importlib.resources
import re
import struct

import pytest
import zstandard

from fhe_precompiles_tpu.serialization import keyio


def _blob(name: str) -> bytes:
    return (importlib.resources.files("fhe_precompiles_tpu")
            / "data" / name).read_bytes()


def _frames(raw: bytes):
    out = []
    for m in re.finditer(re.escape(b"\x28\xb5\x2f\xfd"), raw):
        p = m.start()
        *_, size = struct.unpack("<HBBBBHQ", raw[p - 16:p])
        out.append(raw[p:p - 16 + size])
    return out


def test_ciphertext_member_field_order_matches_blob():
    """parms_id | is_ntt | size | n | k | scale f64 | correction u64 |
    DynArray(hdr 4.0 compr 0) -- byte-verified against network.pub."""
    raw = _blob("network.pub")
    f = _frames(raw)[0]
    d = zstandard.ZstdDecompressor().decompress(f, max_output_size=1 << 30)
    is_ntt, size, n, k = struct.unpack_from("<BQQQ", d, 32)
    assert (is_ntt, size, n, k) == (1, 2, 4096, 3)
    scale = struct.unpack_from("<d", d, 57)[0]
    corr = struct.unpack_from("<Q", d, 65)[0]
    assert scale == 1.0 and corr == 1
    magic, hsz, mj, mi, compr, _res, total = struct.unpack_from("<HBBBBHQ",
                                                                d, 73)
    assert (magic, mj, mi, compr) == (0xA15E, 4, 0, 0)
    count = struct.unpack_from("<Q", d, 89)[0]
    assert count == size * k * n
    assert total == 16 + 8 + 8 * count
    assert 97 + 8 * count == len(d)


@pytest.mark.parametrize("blob_name", ["network.pub"])
def test_pk_frame_recompresses_byte_exact(blob_name):
    """The 196KB pk frames reproduce at zstd level 3 byte-for-byte --
    pinning SEAL's compression level and frame parameters (and showing
    the emit path matches the reference's for this size class)."""
    raw = _blob(blob_name)
    f = _frames(raw)[0]
    d = zstandard.ZstdDecompressor().decompress(f, max_output_size=1 << 30)
    c = zstandard.ZstdCompressor(level=3, write_content_size=True).compress(d)
    assert c == f


def test_key_roundtrip_semantically_exact_with_known_zstd_deviation():
    """save(load(blob)) reproduces every byte except inside the relin/sk
    zstd frames (generator used SEAL 4.0's vendored zstd 1.4.5; ours is
    1.5.x -- docs/GOLDEN_SEARCH_LOG.md).  The decompressed payloads must
    be bit-identical, so any SEAL build loads our emission."""
    dec = zstandard.ZstdDecompressor()
    for name, loader, saver in (
            ("network.pub", keyio.load_public_key, keyio.save_public_key),
            ("network.pri", keyio.load_private_key, keyio.save_private_key)):
        raw = _blob(name)
        out = saver(loader(raw))
        of, nf = _frames(raw), _frames(out)
        assert len(of) == len(nf)
        for a, b in zip(of, nf):
            assert (dec.decompress(a, max_output_size=1 << 30)
                    == dec.decompress(b, max_output_size=1 << 30))
        # and the pk frame itself is byte-exact (same zstd row behavior)
        if name == "network.pub":
            assert of[0] == nf[0]
        # loading our own emission yields an identical object again
        assert saver(loader(out)) == out


@pytest.mark.skipif(not __import__("os").path.isdir("/root/reference"),
                    reason="reference repo not mounted")
def test_fixture_keypair_roundtrip_and_pk_frame_byte_exact():
    """Same guarantees against the independent fixture keypair."""
    dec = zstandard.ZstdDecompressor()
    pub = open("/root/reference/tests/data/public_key.bin", "rb").read()
    pri = open("/root/reference/tests/data/private_key.bin", "rb").read()
    out_pub = keyio.save_public_key(keyio.load_public_key(pub))
    out_pri = keyio.save_private_key(keyio.load_private_key(pri))
    for orig, ours in ((pub, out_pub), (pri, out_pri)):
        of, nf = _frames(orig), _frames(ours)
        assert len(of) == len(nf)
        for a, b in zip(of, nf):
            assert (dec.decompress(a, max_output_size=1 << 30)
                    == dec.decompress(b, max_output_size=1 << 30))
    assert _frames(pub)[0] == _frames(out_pub)[0]    # pk frame byte-exact
