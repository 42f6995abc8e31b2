"""BLAKE2xb extensible-output function (the BLAKE2X construction over
BLAKE2b), matching SEAL's vendored ``util/blake2xb.c``.

BLAKE2X (Aumasson-Neves-Wilcox-O'Hearn-Winnerlein, 2016) computes

    H0   = BLAKE2b(input, key; parameter block with xof_length = outlen)
    B(i) = BLAKE2b(H0; digest_length = min(64, remaining), fanout = 0,
                   depth = 0, leaf_length = 64, node_offset = i,
                   node_depth = 0, inner_length = 64, xof_length = outlen)
    out  = B(0) || B(1) || ...

In the BLAKE2b parameter block the 8-byte ``node_offset`` field is split by
BLAKE2X into node_offset (low 4 bytes) and xof_length (high 4 bytes); Python's
``hashlib.blake2b`` exposes the raw 8-byte field, so both are encoded as
``node_offset | (xof_length << 32)``.
"""
from __future__ import annotations

import hashlib

_B2B_OUT = 64


def blake2xb(outlen: int, data: bytes, key: bytes = b"") -> bytes:
    """BLAKE2xb XOF: `outlen` bytes of output for (data, key)."""
    if not 0 < outlen < 0xFFFFFFFF:
        raise ValueError("outlen out of range for blake2xb")
    xof_no = outlen << 32
    root = hashlib.blake2b(data, digest_size=_B2B_OUT, key=key,
                           fanout=1, depth=1, leaf_size=0,
                           node_offset=xof_no, node_depth=0,
                           inner_size=0).digest()
    out = bytearray()
    i = 0
    remaining = outlen
    while remaining > 0:
        dlen = min(_B2B_OUT, remaining)
        h = hashlib.blake2b(root, digest_size=dlen,
                            fanout=0, depth=0, leaf_size=_B2B_OUT,
                            node_offset=xof_no | i, node_depth=0,
                            inner_size=_B2B_OUT)
        out += h.digest()
        remaining -= dlen
        i += 1
    return bytes(out)
