"""Golden-hash oracle search, wave 9: exhaustive Type-name grammar.

Since the zstd row analysis makes the serialization stack likely-correct,
sweep a generated grammar of sunscreen Type-name strings (module paths x
type renderings) and extra Type layouts (swapped field order, bare 3-u64
semver) against the most plausible randomness candidates.
"""
from __future__ import annotations

import hashlib
import itertools
import sys
import time

sys.path.insert(0, ".")

from tools.golden_search import LINUX_ENCRYPT, PARAMS, FHE, encrypt_seed, seal_stream  # noqa
from tools.golden_search2 import TERNARIES, S, cbd, get_stream, plain_poly  # noqa
from fhe_precompiles_tpu.serialization.bincode import Writer  # noqa: E402
from fhe_precompiles_tpu.serialization.keyio import write_params  # noqa: E402

PREFIXES = [
    "sunscreen::types::bfv::unsigned", "sunscreen::types::bfv",
    "sunscreen::types::unsigned", "sunscreen::types",
    "sunscreen_runtime::types::bfv::unsigned", "sunscreen_runtime::types::bfv",
    "sunscreen_compiler::types::bfv", "sunscreen::types::intern::bfv",
    "sunscreen::crates::types::bfv", "types::bfv::unsigned", "bfv::unsigned",
]
FORMS = [
    "Unsigned256", "Unsigned<4>", "Unsigned<256>", "Unsigned<4usize>",
    "Unsigned<4_usize>", "Unsigned", "Unsigned<U256>",
    "Unsigned<{U256::LIMBS}>", "Unsigned<LIMBS>",
    "Unsigned<crypto_bigint::uint::Uint<4>>",
    "Unsigned<crypto_bigint::uint::UInt<4>>",
    "Unsigned<crypto_bigint::Uint<4>>",
    "Unsigned<crypto_bigint::U256>", "U256", "Unsigned256Fe",
]
NAMES = [f"{p}::{f}" for p in PREFIXES for f in FORMS]

VERSION_ENCODINGS = [
    ("s081", lambda w: w.byte_vec(b"0.8.1")),
    ("s080", lambda w: w.byte_vec(b"0.8.0")),
    ("s082", lambda w: w.byte_vec(b"0.8.2")),
    ("u3",   lambda w: (w.u64(0), w.u64(8), w.u64(1))),            # bare 3xu64
    ("u3pb", lambda w: (w.u64(0), w.u64(8), w.u64(1),
                        w.u64(0), w.u64(0))),                      # + empty pre/build
]


def framings(stream: bytes):
    for name, (vl, vfn), enc, layout in itertools.product(
            NAMES, VERSION_ENCODINGS, (True, False),
            ("nve", "vne", "nev")):
        w = Writer()
        nb = name.encode()
        if layout == "nve":
            w.byte_vec(nb); vfn(w); w.u8(1 if enc else 0)
        elif layout == "vne":
            vfn(w); w.byte_vec(nb); w.u8(1 if enc else 0)
        else:  # name, enc, version
            w.byte_vec(nb); w.u8(1 if enc else 0); vfn(w)
        w.u32(0)
        w.u64(1)
        write_params(w, PARAMS)
        w.byte_vec(stream)
        yield w.getvalue()


def main():
    rand_cands = [
        ((4096, "<Q", 0, False), "libstdcxx", "ueo"),
        ((4096, "<Q", 0, False), "modulo", "ueo"),
        ((4096, "<Q", 1, False), "libstdcxx", "ueo"),
        ((4096, "<Q", 0, False), "libstdcxx64", "ueo"),
    ]
    tried = 0
    t0 = time.time()
    for key, tern, order in rand_cands:
        s = S(get_stream(encrypt_seed(), key))
        tf = TERNARIES[tern]
        u = tf(s); e0 = cbd(s); e1 = cbd(s)
        ct = FHE.ctx.encrypt_with_randomness(plain_poly(False),
                                             FHE.public_key, u, e0, e1)
        for compress in (True, False):
            stream = seal_stream(ct, compress)
            for out in framings(stream):
                tried += 1
                if hashlib.sha512(out).digest() == LINUX_ENCRYPT:
                    print(f"MATCH! key={key} tern={tern} "
                          f"compress={compress} len={len(out)}")
                    open("/tmp/golden_match.bin", "wb").write(out)
                    return
        print(f"... {tried} after {tern}/{key} ({time.time()-t0:.0f}s)",
              flush=True)
    print(f"wave 9: no match after {tried} ({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
