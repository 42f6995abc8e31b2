"""Golden-hash oracle search, wave 5: full joint grid.

Randomness axes: PRNG stream structure x ternary semantics x noise
distribution (SEAL CBD *and* a faithful libstdc++ clipped-gaussian, in
case the reference SEAL build had SEAL_USE_GAUSSIAN_NOISE=ON) x sampling
order.  Framing axes: no-Type layouts + Type layouts x name grammar x
version encodings x is_encrypted.
"""
from __future__ import annotations

import hashlib
import itertools
import math
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from tools.golden_search import (LINUX_ENCRYPT, PARAMS, FHE,  # noqa
                                 encrypt_seed, seal_stream)
from tools.golden_search2 import TERNARIES, S, cbd, get_stream, plain_poly  # noqa
from tools.golden_search3 import write_type  # noqa: E402
from fhe_precompiles_tpu.serialization.bincode import Writer  # noqa: E402
from fhe_precompiles_tpu.serialization.keyio import write_params  # noqa: E402


# ---- libstdc++ std::normal_distribution + SEAL ClippedNormal --------------

class Canon:
    """std::generate_canonical<double, 53> over a u32 engine: 2 draws."""

    def __init__(self, s: S):
        self.s = s

    def __call__(self) -> float:
        u0 = float(self.s.words(1)[0])
        u1 = float(self.s.words(1)[0])
        return (u0 + u1 * 4294967296.0) / 18446744073709551616.0


def gaussian(s: S, n: int, sigma=3.2, max_dev=19.2, trunc=True) -> np.ndarray:
    canon = Canon(s)
    out = np.empty(n, dtype=np.int64)
    saved = None
    for i in range(n):
        while True:
            if saved is not None:
                val = saved
                saved = None
            else:
                while True:
                    x = 2.0 * canon() - 1.0
                    y = 2.0 * canon() - 1.0
                    r2 = x * x + y * y
                    if r2 <= 1.0 and r2 != 0.0:
                        break
                mult = math.sqrt(-2.0 * math.log(r2) / r2)
                saved = x * mult
                val = y * mult
            v = val * sigma
            if abs(v) <= max_dev:
                break
        out[i] = int(v) if trunc else round(v)
    return out


def noise_cbd(s, n):
    return cbd(s)


def noise_gauss_trunc(s, n):
    return gaussian(s, n, trunc=True)


def noise_gauss_round(s, n):
    return gaussian(s, n, trunc=False)


NOISES = {"cbd": noise_cbd, "gauss_t": noise_gauss_trunc,
          "gauss_r": noise_gauss_round}


# ---- framings -------------------------------------------------------------

BASES = [
    "sunscreen::types::bfv::unsigned", "sunscreen::types::bfv",
    "sunscreen_runtime::types::bfv::unsigned",
    "sunscreen_runtime::types::bfv", "sunscreen::types",
]
FORMS = [
    "Unsigned<4>", "Unsigned256", "Unsigned<256>", "Unsigned",
    "Unsigned<U256>", "Unsigned<4_usize>",
    "Unsigned<crypto_bigint::uint::Uint<4>>",
]
NAMES = [f"{b}::{f}" for b in BASES for f in FORMS]
VERSIONS = ["0.8.1", "0.8.0", "0.1.0", None]


def all_framings(stream: bytes):
    # no-Type layouts
    for layout in ("enum", "params_enum", "plain", "bare"):
        w = Writer()
        if layout == "params_enum":
            write_params(w, PARAMS)
        if layout in ("enum", "params_enum"):
            w.u32(0)
        if layout != "bare":
            w.u64(1)
        write_params(w, PARAMS)
        w.byte_vec(stream)
        yield w.getvalue()
    # Type-bearing layouts
    for name, ver, enc in itertools.product(NAMES, VERSIONS, (True, False)):
        w = Writer()
        write_type(w, name, ver, enc)
        w.u32(0)
        w.u64(1)
        write_params(w, PARAMS)
        w.byte_vec(stream)
        yield w.getvalue()


def main():
    stream_keys = [
        (4096, "<Q", 0, False), (4096, "<Q", 1, False),
        (512, "<Q", 0, False), (4096, "<Q", 0, True),
    ]
    ternaries = ["libstdcxx", "lemire", "modulo"]
    noises = ["cbd", "gauss_t", "gauss_r"]
    orders = ["ueo", "eou"]
    tried = 0
    t0 = time.time()
    for key, tern, noise, order in itertools.product(
            stream_keys, ternaries, noises, orders):
        s = S(get_stream(encrypt_seed(), key))
        tf = TERNARIES[tern]
        nf = NOISES[noise]
        n = PARAMS.n
        if order == "ueo":
            u = tf(s); e0 = nf(s, n); e1 = nf(s, n)
        else:
            e0 = nf(s, n); e1 = nf(s, n); u = tf(s)
        ct = FHE.ctx.encrypt_with_randomness(plain_poly(False),
                                             FHE.public_key, u, e0, e1)
        for compress in (True, False):
            stream = seal_stream(ct, compress)
            for out in all_framings(stream):
                tried += 1
                if hashlib.sha512(out).digest() == LINUX_ENCRYPT:
                    print(f"MATCH! stream={key} ternary={tern} noise={noise} "
                          f"order={order} compress={compress} "
                          f"out_len={len(out)}")
                    with open("/tmp/golden_match.bin", "wb") as fh:
                        fh.write(out)
                    return
        if tried and tried % 50000 < 600:
            print(f"... {tried} ({time.time()-t0:.0f}s)", flush=True)
    print(f"wave 5: no match after {tried} candidates "
          f"({time.time()-t0:.0f}s)")


def selftest():
    """Plumbing check: inject a synthetic target, confirm the grid finds it."""
    key = (4096, "<Q", 1, False)
    s = S(get_stream(encrypt_seed(), key))
    u = TERNARIES["lemire"](s)
    e0 = cbd(s); e1 = cbd(s)
    ct = FHE.ctx.encrypt_with_randomness(plain_poly(False), FHE.public_key,
                                         u, e0, e1)
    stream = seal_stream(ct, True)
    target_frame = None
    for i, out in enumerate(all_framings(stream)):
        if i == 37:
            target_frame = hashlib.sha512(out).digest()
    global LINUX_ENCRYPT
    import tools.golden_search5 as me
    me.LINUX_ENCRYPT = target_frame
    me.main()


if __name__ == "__main__":
    if "--selftest" in sys.argv:
        selftest()
    else:
        main()
