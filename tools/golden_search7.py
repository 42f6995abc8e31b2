"""Golden-hash oracle search, wave 7: complete cartesian, no coverage holes.

Union of all randomness variants from waves 1-6 crossed with the union of
all framing variants (incl. Type records) and both compression modes.
"""
from __future__ import annotations

import hashlib
import itertools
import sys
import time

sys.path.insert(0, ".")

from tools.golden_search import LINUX_ENCRYPT, PARAMS, FHE, encrypt_seed, seal_stream  # noqa
from tools.golden_search2 import TERNARIES, S, cbd, get_stream, plain_poly  # noqa
from tools.golden_search5 import NOISES, all_framings  # noqa
from tools.golden_search6 import STREAMS as SHAKE_STREAMS  # noqa

B2XB_KEYS = [
    (4096, "<Q", 0, False), (4096, "<Q", 1, False),
    (4096, ">Q", 0, False), (4096, "<Q", 0, True),
    (512, "<Q", 0, False), (1024, "<Q", 0, False),
    (8192, "<Q", 0, False), (4096, "<I", 0, False),
]


def stream_bytes(name):
    if isinstance(name, tuple):
        return get_stream(encrypt_seed(), name)
    return SHAKE_STREAMS[name]()


def main():
    streams = B2XB_KEYS + list(SHAKE_STREAMS)
    ternaries = ["libstdcxx", "libstdcxx64", "modulo", "libcxx"]
    noises = ["cbd", "gauss_t", "gauss_r"]
    orders = ["ueo", "eou"]
    msbs = [False, True]
    tried = 0
    rnd = 0
    t0 = time.time()
    stream_cache = {}
    for sk_, tern, noise, order, msb in itertools.product(
            streams, ternaries, noises, orders, msbs):
        key = str(sk_)
        if key not in stream_cache:
            stream_cache[key] = stream_bytes(sk_)
        s = S(stream_cache[key])
        tf = TERNARIES[tern]
        nf = NOISES[noise]
        n = PARAMS.n
        try:
            if order == "ueo":
                u = tf(s); e0 = nf(s, n); e1 = nf(s, n)
            else:
                e0 = nf(s, n); e1 = nf(s, n); u = tf(s)
        except Exception:
            continue
        ct = FHE.ctx.encrypt_with_randomness(plain_poly(msb),
                                             FHE.public_key, u, e0, e1)
        rnd += 1
        for compress in (True, False):
            st = seal_stream(ct, compress)
            for out in all_framings(st):
                tried += 1
                if hashlib.sha512(out).digest() == LINUX_ENCRYPT:
                    print(f"MATCH! stream={sk_} tern={tern} noise={noise} "
                          f"order={order} msb={msb} compress={compress}")
                    open("/tmp/golden_match.bin", "wb").write(out)
                    return
        if rnd % 50 == 0:
            print(f"... {rnd} randomness combos, {tried} total "
                  f"({time.time()-t0:.0f}s)", flush=True)
    print(f"wave 7: no match after {rnd} randomness x framings = {tried} "
          f"({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
