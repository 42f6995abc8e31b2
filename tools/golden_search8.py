"""Golden-hash oracle search, wave 8: residual dimensions.

The zstd size-class analysis (GOLDEN_SEARCH_LOG) shows the ciphertext
frames live in the same cparams row as the two pk frames that DO
reproduce byte-exactly under zstd 1.5.x -- so zstd is unlikely to be the
ct-path blocker after all.  This wave covers previously-uncrossed
randomness dims: e1-before-e0 noise order, fresh-PRNG-per-sampler, and
extra version strings.
"""
from __future__ import annotations

import hashlib
import itertools
import sys
import time

sys.path.insert(0, ".")

from tools.golden_search import LINUX_ENCRYPT, PARAMS, FHE, encrypt_seed, seal_stream  # noqa
from tools.golden_search2 import TERNARIES, S, cbd, get_stream, plain_poly  # noqa
import tools.golden_search3 as g3  # noqa: E402
from tools.golden_search5 import all_framings  # noqa: E402

g3_versions_orig = list(g3.VERSIONS)


def randomness(key, tern, order, fresh):
    n = PARAMS.n
    tf = TERNARIES[tern]
    if not fresh:
        s = S(get_stream(encrypt_seed(), key))
        streams = [s, s, s]
    else:
        data = get_stream(encrypt_seed(), key)
        streams = [S(data), S(data), S(data)]   # each sampler restarts
    su, s0, s1 = streams
    if order == "u01":
        u = tf(su); e0 = cbd(s0 if fresh else su); e1 = cbd(s1 if fresh else su)
    elif order == "u10":
        u = tf(su); e1 = cbd(s0 if fresh else su); e0 = cbd(s1 if fresh else su)
    elif order == "01u":
        e0 = cbd(s0); e1 = cbd(s1 if fresh else s0); u = tf(su if fresh else s0)
    else:
        raise KeyError(order)
    return u, e0, e1


def main():
    import tools.golden_search5 as g5
    # extend version candidates for the Type record (g5 has its own list)
    g5.VERSIONS = ["0.8.1", "0.8.0", "0.8.2", "0.1.0", None]
    keys = [(4096, "<Q", 0, False), (4096, "<Q", 1, False)]
    tried = 0
    t0 = time.time()
    for key, tern, order, fresh in itertools.product(
            keys, ["libstdcxx", "modulo", "libstdcxx64"],
            ["u01", "u10", "01u"], [False, True]):
        u, e0, e1 = randomness(key, tern, order, fresh)
        ct = FHE.ctx.encrypt_with_randomness(plain_poly(False),
                                             FHE.public_key, u, e0, e1)
        for compress in (True, False):
            stream = seal_stream(ct, compress)
            for out in g5.all_framings(stream):
                tried += 1
                if hashlib.sha512(out).digest() == LINUX_ENCRYPT:
                    print(f"MATCH! key={key} tern={tern} order={order} "
                          f"fresh={fresh} compress={compress}")
                    open("/tmp/golden_match.bin", "wb").write(out)
                    return
    print(f"wave 8: no match after {tried} ({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
