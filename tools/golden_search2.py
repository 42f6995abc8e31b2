"""Golden-hash oracle search, wave 2: cached PRNG streams, vectorized
samplers, prioritized dimensions, extra sampler/encoding variants.

See tools/golden_search.py for the fixture definitions.  Search log:
docs/GOLDEN_SEARCH_LOG.md.
"""
from __future__ import annotations

import hashlib
import itertools
import struct
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from tools.golden_search import (FRAMINGS, LINUX_ENCRYPT, PARAMS,  # noqa
                                 FHE, N, encrypt_seed, frame, prng_stream)
from fhe_precompiles_tpu.encoding import PLAIN_TYPES  # noqa: E402
from fhe_precompiles_tpu.seal_compat.sampler import _PAST, _POPCNT, _SCALING  # noqa

STREAM_BYTES = 40 * N

_stream_cache: dict = {}


def get_stream(seed: bytes, key) -> bytes:
    got = _stream_cache.get(key)
    if got is None:
        buf, ctr_fmt, ctr_start, swap = key
        got = prng_stream(seed, STREAM_BYTES, buf=buf, ctr_fmt=ctr_fmt,
                          ctr_start=ctr_start, swap=swap)
        _stream_cache[key] = got
    return got


class S:
    def __init__(self, data):
        self.d = data
        self.pos = 0

    def words(self, n):
        out = np.frombuffer(self.d, dtype="<u4", count=n,
                            offset=self.pos).copy()
        self.pos += 4 * n
        return out

    def words64(self, n):
        out = np.frombuffer(self.d, dtype="<u8", count=n,
                            offset=self.pos).copy()
        self.pos += 8 * n
        return out

    def bytes(self, n):
        out = np.frombuffer(self.d, dtype=np.uint8, count=n,
                            offset=self.pos).copy()
        self.pos += n
        return out


def t_libstdcxx(s: S) -> np.ndarray:
    r = s.words(N).astype(np.uint64)
    if (r >= _PAST).any():          # prob 2^-32 per draw; redo with rejection
        out = []
        i = 0
        vals = list(r)
        while len(out) < N:
            if i >= len(vals):
                vals.extend(list(s.words(64).astype(np.uint64)))
            v = vals[i]; i += 1
            if v < _PAST:
                out.append(v)
        r = np.array(out, dtype=np.uint64)
    return (r // np.uint64(_SCALING)).astype(np.int64) - 1


def t_libstdcxx64(s: S) -> np.ndarray:
    """If RandomToStandardAdapter yielded u64 (8 bytes per draw)."""
    scaling = (2**64 - 1) // 3
    r = s.words64(N)
    # past = 3*scaling = 2^64-1 -> rejects only all-ones
    return (r // np.uint64(scaling)).astype(np.int64) - 1


def t_modulo(s: S) -> np.ndarray:
    return (s.words(N).astype(np.int64) % 3) - 1


def t_lemire(s: S) -> np.ndarray:
    """Lemire multiply-shift: value = (r * 3) >> 32, reject low==0 cases."""
    r = s.words(N).astype(np.uint64)
    m = r * np.uint64(3)
    low = m & np.uint64(0xFFFFFFFF)
    if (low < 1).any():
        raise RuntimeError("lemire rejection hit; implement loop")
    return (m >> np.uint64(32)).astype(np.int64) - 1


def t_libcxx(s: S) -> np.ndarray:
    """libc++: 2-bit independent-bits chunks with rejection of 3."""
    out = np.empty(N, dtype=np.int64)
    i = 0
    buf = list(s.words(N + 64))
    bi = 0
    while i < N:
        if bi >= len(buf):
            buf.extend(list(s.words(64)))
        v = buf[bi] & 0x3
        bi += 1
        if v <= 2:
            out[i] = int(v) - 1
            i += 1
    return out


def cbd(s: S) -> np.ndarray:
    raw = s.bytes(6 * N).reshape(N, 6).copy()
    raw[:, 2] &= 0x1F
    raw[:, 5] &= 0x1F
    w = _POPCNT[raw]
    return w[:, 0] + w[:, 1] + w[:, 2] - w[:, 3] - w[:, 4] - w[:, 5]


TERNARIES = {"libstdcxx": t_libstdcxx, "libstdcxx64": t_libstdcxx64,
             "modulo": t_modulo, "lemire": t_lemire, "libcxx": t_libcxx}


def plain_poly(msb_first: bool) -> np.ndarray:
    m = PLAIN_TYPES["u256"].encode(12, PARAMS)
    if msb_first:
        out = np.zeros_like(m)
        out[:256] = m[:256][::-1]
        return out
    return m


def candidate(stream_key, ternary, order, msb) -> np.ndarray:
    s = S(get_stream(encrypt_seed(), stream_key))
    tern = TERNARIES[ternary]
    if order == "ueo":
        u = tern(s); e0 = cbd(s); e1 = cbd(s)
    else:
        e0 = cbd(s); e1 = cbd(s); u = tern(s)
    ct = FHE.ctx.encrypt_with_randomness(plain_poly(msb), FHE.public_key,
                                         u, e0, e1)
    return ct


def check(ct) -> str | None:
    for f in FRAMINGS:
        for comp in (True, False):
            out = frame(ct, f, comp)
            if hashlib.sha512(out).digest() == LINUX_ENCRYPT:
                return f"{f} compress={comp}"
    return None


def main():
    # dimension order: cheapest + most-likely first
    stream_keys = [
        (4096, "<Q", 0, False),   # base: SEAL rng.h semantics
        (4096, "<Q", 1, False),
        (4096, ">Q", 0, False),
        (4096, "<Q", 0, True),    # in/key swapped
        (512, "<Q", 0, False),
        (1024, "<Q", 0, False),
        (8192, "<Q", 0, False),
        (4096, "<I", 0, False),
    ]
    ternaries = ["libstdcxx", "lemire", "modulo", "libstdcxx64", "libcxx"]
    orders = ["ueo", "eou"]
    msbs = [False, True]
    tried = 0
    t0 = time.time()
    for key, tern, order, msb in itertools.product(
            stream_keys, ternaries, orders, msbs):
        ct = candidate(key, tern, order, msb)
        hit = check(ct)
        tried += 1
        if hit:
            print(f"MATCH! stream={key} ternary={tern} order={order} "
                  f"msb={msb} framing={hit}")
            return
        if tried % 10 == 0:
            print(f"... {tried} randomness combos "
                  f"({time.time()-t0:.0f}s)", flush=True)
    print(f"wave 2: no match after {tried} combos")


if __name__ == "__main__":
    main()
