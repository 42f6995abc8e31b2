"""Golden-hash oracle search, wave 6: SHAKE-256 PRNG variants.

SEAL 4.x has two PRNGs: Blake2xbPRNG and Shake256PRNG (util/randomgen.h).
Shake256PRNG refills via shake256(seed_ext) where seed_ext = the 8 seed
u64s + the counter u64 (72 bytes, LE).  If sunscreen's deterministic
encrypt selected the shake factory, waves 1-5 could never match.
"""
from __future__ import annotations

import hashlib
import itertools
import sys
import time

sys.path.insert(0, ".")

from tools.golden_search import (LINUX_ENCRYPT, PARAMS, FHE,  # noqa
                                 encrypt_seed, seal_stream)
from tools.golden_search2 import TERNARIES, S, cbd, plain_poly  # noqa
from tools.golden_search5 import all_framings  # noqa: E402

import struct  # noqa: E402

SEED = encrypt_seed()
STREAM_BYTES = 40 * PARAMS.n


def stream_shake_seal(buf=4096):
    out = bytearray()
    ctr = 0
    while len(out) < STREAM_BYTES:
        out += hashlib.shake_256(SEED + struct.pack("<Q", ctr)).digest(buf)
        ctr += 1
    return bytes(out)


def stream_shake_ctr_first(buf=4096):
    out = bytearray()
    ctr = 0
    while len(out) < STREAM_BYTES:
        out += hashlib.shake_256(struct.pack("<Q", ctr) + SEED).digest(buf)
        ctr += 1
    return bytes(out)


def stream_shake_oneshot():
    return hashlib.shake_256(SEED).digest(STREAM_BYTES)


def stream_b2xb_concat(order="seed_ctr"):
    from fhe_precompiles_tpu.seal_compat.blake2xb import blake2xb
    out = bytearray()
    ctr = 0
    while len(out) < STREAM_BYTES:
        msg = (SEED + struct.pack("<Q", ctr) if order == "seed_ctr"
               else struct.pack("<Q", ctr) + SEED)
        out += blake2xb(4096, msg, b"")
        ctr += 1
    return bytes(out)


STREAMS = {
    "shake_seal": stream_shake_seal,
    "shake_ctr_first": stream_shake_ctr_first,
    "shake_oneshot": stream_shake_oneshot,
    "b2xb_seed_ctr": lambda: stream_b2xb_concat("seed_ctr"),
    "b2xb_ctr_seed": lambda: stream_b2xb_concat("ctr_seed"),
    "shake_seal_512": lambda: stream_shake_seal(512),
}


def main():
    tried = 0
    t0 = time.time()
    for sname, sfn in STREAMS.items():
        data = sfn()
        for tern, order in itertools.product(
                ["libstdcxx", "modulo", "libstdcxx64", "libcxx"],
                ["ueo", "eou"]):
            s = S(data)
            tf = TERNARIES[tern]
            if order == "ueo":
                u = tf(s); e0 = cbd(s); e1 = cbd(s)
            else:
                e0 = cbd(s); e1 = cbd(s); u = tf(s)
            ct = FHE.ctx.encrypt_with_randomness(
                plain_poly(False), FHE.public_key, u, e0, e1)
            for compress in (True, False):
                stream = seal_stream(ct, compress)
                for out in all_framings(stream):
                    tried += 1
                    if hashlib.sha512(out).digest() == LINUX_ENCRYPT:
                        print(f"MATCH! stream={sname} ternary={tern} "
                              f"order={order} compress={compress}")
                        return
    print(f"wave 6: no match after {tried} ({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
