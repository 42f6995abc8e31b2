"""Golden-hash oracle search, wave 3: sunscreen `Ciphertext.data_type`.

sunscreen_runtime's Ciphertext struct is

    pub struct Ciphertext { pub(crate) data_type: Type, pub(crate) inner: InnerCiphertext }
    pub struct Type { pub name: String, pub version: Version, pub is_encrypted: bool }
    pub enum InnerCiphertext { Seal(Vec<WithContext<SealCiphertext>>) }

None of the wave-1/2 framings carried the leading Type record.  The exact
name string (module path + generic rendering) and semver serde form are
unknown offline, so they are enumerated jointly with the randomness
dimensions.  The SEAL stream is compressed once per ciphertext; framings
only re-wrap bytes, so the joint product is cheap.
"""
from __future__ import annotations

import hashlib
import itertools
import struct
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from tools.golden_search import (LINUX_ENCRYPT, PARAMS, FHE, N,  # noqa
                                 encrypt_seed, seal_stream)
from tools.golden_search2 import TERNARIES, S, cbd, get_stream, plain_poly  # noqa
from fhe_precompiles_tpu.serialization.bincode import Writer  # noqa: E402
from fhe_precompiles_tpu.serialization.keyio import write_params  # noqa: E402

NAMES = [
    "sunscreen::types::bfv::Unsigned256",
    "sunscreen::types::bfv::Unsigned<4>",
    "sunscreen::types::bfv::Unsigned<256>",
    "sunscreen::types::bfv::unsigned::Unsigned256",
    "sunscreen::types::bfv::Unsigned<crypto_bigint::uint::UInt<4>>",
    "sunscreen::types::bfv::Unsigned<crypto_bigint::uint::Uint<4>>",
    "sunscreen_runtime::types::bfv::Unsigned256",
    "sunscreen::types::intern::Unsigned256",
]
VERSIONS = ["0.8.1", "0.8.0", None]     # None = semver as 3 u64 + empty pre/build


def write_version(w: Writer, v):
    if v is None:
        w.u64(0); w.u64(8); w.u64(1)
        w.u64(0)                         # pre: empty Vec
        w.u64(0)                         # build: empty Vec
    else:
        w.byte_vec(v.encode())


def write_type(w: Writer, name: str, version, encrypted: bool):
    w.byte_vec(name.encode())
    write_version(w, version)
    w.u8(1 if encrypted else 0)


def framings(stream: bytes):
    """Yield (label, bytes) for every candidate serialization."""
    for name, ver, enc in itertools.product(NAMES, VERSIONS, (True, False)):
        for layout in ("t_ev", "t_p_ev", "p_t_ev"):
            w = Writer()
            if layout == "t_ev":
                write_type(w, name, ver, enc)
            elif layout == "t_p_ev":
                write_type(w, name, ver, enc)
                write_params(w, PARAMS)
            else:
                write_params(w, PARAMS)
                write_type(w, name, ver, enc)
            w.u32(0)
            w.u64(1)
            write_params(w, PARAMS)
            w.byte_vec(stream)
            yield (f"{layout}|{name}|{ver}|enc={enc}", w.getvalue())
    # no-type variants (wave-1 coverage, kept for the joint product)
    for layout in ("enum", "params_enum", "plain"):
        w = Writer()
        if layout == "params_enum":
            write_params(w, PARAMS)
        if layout != "plain":
            w.u32(0)
        w.u64(1)
        write_params(w, PARAMS)
        w.byte_vec(stream)
        yield (f"{layout}", w.getvalue())


def candidate_ct(stream_key, ternary, order, msb):
    s = S(get_stream(encrypt_seed(), stream_key))
    tern = TERNARIES[ternary]
    if order == "ueo":
        u = tern(s); e0 = cbd(s); e1 = cbd(s)
    else:
        e0 = cbd(s); e1 = cbd(s); u = tern(s)
    return FHE.ctx.encrypt_with_randomness(plain_poly(msb), FHE.public_key,
                                           u, e0, e1)


def main():
    stream_keys = [
        (4096, "<Q", 0, False), (4096, "<Q", 1, False),
        (4096, ">Q", 0, False), (4096, "<Q", 0, True),
        (512, "<Q", 0, False), (1024, "<Q", 0, False),
        (8192, "<Q", 0, False), (4096, "<I", 0, False),
    ]
    ternaries = ["libstdcxx", "lemire", "modulo", "libstdcxx64", "libcxx"]
    orders = ["ueo", "eou"]
    msbs = [False, True]
    tried = 0
    t0 = time.time()
    for key, tern, order, msb in itertools.product(
            stream_keys, ternaries, orders, msbs):
        ct = candidate_ct(key, tern, order, msb)
        for compress in (True, False):
            stream = seal_stream(ct, compress)
            for label, out in framings(stream):
                tried += 1
                if hashlib.sha512(out).digest() == LINUX_ENCRYPT:
                    print(f"MATCH! stream={key} ternary={tern} order={order} "
                          f"msb={msb} compress={compress} framing={label}")
                    return
        if tried % 20000 < 300:
            print(f"... {tried} candidates ({time.time()-t0:.0f}s)",
                  flush=True)
    print(f"wave 3: no match after {tried} candidates "
          f"({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
