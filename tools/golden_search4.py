"""Golden-hash oracle search, wave 4: broadened Type-name space.

The sunscreen TypeName derive renders ``format!("{}::{}", module_path!(),
ident)`` -- module_path!() includes the file module (e.g.
``sunscreen::types::bfv::unsigned``) -- and the const-generic Unsigned is
rendered with its limb count (crypto-bigint 0.5: U256 = Uint<4>).  This
wave crosses the full plausible name grammar with the randomness grid.
"""
from __future__ import annotations

import hashlib
import itertools
import sys
import time

sys.path.insert(0, ".")

from tools.golden_search import (LINUX_ENCRYPT, PARAMS, FHE,  # noqa
                                 encrypt_seed, seal_stream)
from tools.golden_search2 import TERNARIES, S, cbd, get_stream, plain_poly  # noqa
from tools.golden_search3 import write_type  # noqa: E402
from fhe_precompiles_tpu.serialization.bincode import Writer  # noqa: E402
from fhe_precompiles_tpu.serialization.keyio import write_params  # noqa: E402

BASES = [
    "sunscreen::types::bfv::unsigned",
    "sunscreen::types::bfv",
    "sunscreen_runtime::types::bfv::unsigned",
    "sunscreen::types::intern::bfv",
]
FORMS = [
    "Unsigned<4>", "Unsigned256", "Unsigned<256>", "Unsigned<U256>",
    "Unsigned<crypto_bigint::uint::Uint<4>>",
    "Unsigned<crypto_bigint::Uint<4>>",
    "Unsigned",
]
NAMES = [f"{b}::{f}" for b in BASES for f in FORMS]
VERSIONS = ["0.8.1", "0.8.0", None]


def framings(stream: bytes):
    for name, ver, enc, layout in itertools.product(
            NAMES, VERSIONS, (True, False), ("t_ev", "ev_t")):
        w = Writer()
        if layout == "t_ev":
            write_type(w, name, ver, enc)
        w.u32(0)
        w.u64(1)
        write_params(w, PARAMS)
        w.byte_vec(stream)
        if layout == "ev_t":
            write_type(w, name, ver, enc)
        yield (f"{layout}|{name}|{ver}|{enc}", w.getvalue())


def main():
    stream_keys = [
        (4096, "<Q", 0, False), (4096, "<Q", 1, False),
        (4096, ">Q", 0, False), (4096, "<Q", 0, True),
        (512, "<Q", 0, False), (1024, "<Q", 0, False),
    ]
    ternaries = ["libstdcxx", "lemire", "modulo", "libstdcxx64"]
    orders = ["ueo", "eou"]
    tried = 0
    t0 = time.time()
    for key, tern, order in itertools.product(stream_keys, ternaries, orders):
        s = S(get_stream(encrypt_seed(), key))
        fn = TERNARIES[tern]
        if order == "ueo":
            u = fn(s); e0 = cbd(s); e1 = cbd(s)
        else:
            e0 = cbd(s); e1 = cbd(s); u = fn(s)
        ct = FHE.ctx.encrypt_with_randomness(plain_poly(False),
                                             FHE.public_key, u, e0, e1)
        for compress in (True, False):
            stream = seal_stream(ct, compress)
            for label, out in framings(stream):
                tried += 1
                if hashlib.sha512(out).digest() == LINUX_ENCRYPT:
                    print(f"MATCH! stream={key} ternary={tern} "
                          f"order={order} compress={compress} "
                          f"framing={label}")
                    return
    print(f"wave 4: no match after {tried} candidates "
          f"({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
