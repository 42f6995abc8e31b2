"""Oracle search for the reference's linux golden SHA-512 hashes.

The reference pins SHA-512 digests of the exact output bytes of three
consensus fixtures (fhe.rs:2083-2245, linux branch at :2110-2119):

  1. encrypt:   FHE.encrypt::<Unsigned256>(pack_two_arguments(12, [1,2,3]))
  2. refresh:   reencrypt of encrypt_deterministic(12, pk_net, seed=0)
  3. reencrypt: reencrypt of fixture-key flow

Each digest is all-or-nothing, so this tool enumerates the byte-level
unknowns (PRNG construction, sampler semantics, serde framing, compression)
as independent dimensions, computes the candidate output bytes, and compares
SHA-512.  Run:  python tools/golden_search.py
"""
from __future__ import annotations

import hashlib
import itertools
import struct
import sys

import numpy as np
import zstandard

sys.path.insert(0, ".")

from fhe_precompiles_tpu.app import ENCRYPT_PRIVATE_CONSTANT  # noqa: E402
from fhe_precompiles_tpu.bfv.golden import Ciphertext  # noqa: E402
from fhe_precompiles_tpu.encoding import PLAIN_TYPES  # noqa: E402
from fhe_precompiles_tpu.seal_compat.blake2xb import blake2xb  # noqa: E402
from fhe_precompiles_tpu.seal_compat.sampler import (  # noqa: E402
    _PAST, _POPCNT, _SCALING)
from fhe_precompiles_tpu.serialization import seal  # noqa: E402
from fhe_precompiles_tpu.serialization.bincode import Writer  # noqa: E402
from fhe_precompiles_tpu.serialization.keyio import write_params  # noqa: E402
from fhe_precompiles_tpu.testnet import one  # noqa: E402

FHE = one.FHE
PARAMS = FHE.params
N = PARAMS.n

LINUX_ENCRYPT = bytes([
    190, 214, 153, 167, 205, 130, 61, 102, 188, 80, 220, 159, 38, 110, 126,
    216, 148, 46, 220, 80, 18, 189, 177, 187, 108, 99, 32, 72, 250, 225, 2,
    166, 33, 155, 22, 86, 221, 82, 4, 174, 144, 196, 45, 28, 190, 100, 194,
    192, 37, 81, 203, 227, 46, 179, 59, 153, 20, 118, 191, 69, 244, 113,
    180, 123])
LINUX_REFRESH = bytes([
    131, 114, 41, 214, 205, 49, 231, 175, 22, 173, 98, 109, 197, 9, 217, 40,
    55, 92, 148, 233, 141, 65, 126, 198, 160, 93, 170, 47, 86, 9, 22, 96,
    127, 122, 9, 104, 175, 217, 65, 221, 247, 106, 80, 165, 58, 197, 218, 5,
    138, 166, 250, 52, 159, 13, 226, 118, 189, 235, 203, 156, 112, 165, 84,
    183])
LINUX_REENCRYPT = bytes([
    130, 189, 175, 155, 159, 130, 159, 220, 70, 102, 26, 228, 211, 59, 132,
    240, 108, 2, 240, 176, 42, 236, 90, 30, 232, 41, 62, 25, 27, 239, 158,
    39, 224, 40, 62, 212, 113, 151, 199, 5, 155, 15, 9, 35, 77, 46, 238, 46,
    133, 185, 243, 242, 89, 101, 121, 56, 85, 103, 101, 0, 201, 200, 182, 64])


# --------------------------------------------------------------------------
# PRNG byte-stream variants
# --------------------------------------------------------------------------

def prng_stream(seed: bytes, nbytes: int, *, buf=4096, ctr_fmt="<Q",
                ctr_start=0, swap=False) -> bytes:
    out = bytearray()
    ctr = ctr_start
    while len(out) < nbytes:
        msg = struct.pack(ctr_fmt, ctr)
        if swap:
            out += blake2xb(buf, seed, msg)
        else:
            out += blake2xb(buf, msg, seed)
        ctr += 1
    return bytes(out[:nbytes])


class Stream:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def take(self, n):
        b = self.data[self.pos:self.pos + n]
        self.pos += n
        return b

    def u32(self):
        return struct.unpack("<I", self.take(4))[0]


# --------------------------------------------------------------------------
# Sampler variants
# --------------------------------------------------------------------------

def ternary_libstdcxx(s: Stream, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        while True:
            r = s.u32()
            if r < _PAST:
                break
        out[i] = r // _SCALING - 1
    return out


def ternary_modulo(s: Stream, n: int) -> np.ndarray:
    """Naive r % 3 (what a hand-rolled sampler would do)."""
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        out[i] = s.u32() % 3 - 1
    return out


def ternary_libcxx(s: Stream, n: int) -> np.ndarray:
    """libc++: independent-bits rejection on the minimal bit width (2 bits).

    libc++'s uniform_int_distribution builds an __independent_bits_engine
    over the URBG producing _Wd-bit chunks (here 2 bits from one 32-bit
    draw -- low bits) and rejects values > 2.
    """
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        while True:
            r = s.u32() & 0x3
            if r <= 2:
                break
        out[i] = r - 1
    return out


def cbd_seal(s: Stream, n: int) -> np.ndarray:
    raw = np.frombuffer(s.take(6 * n), dtype=np.uint8).reshape(n, 6).copy()
    raw[:, 2] &= 0x1F
    raw[:, 5] &= 0x1F
    w = _POPCNT[raw]
    return w[:, 0] + w[:, 1] + w[:, 2] - w[:, 3] - w[:, 4] - w[:, 5]


TERNARIES = {"libstdcxx": ternary_libstdcxx, "modulo": ternary_modulo,
             "libcxx": ternary_libcxx}


def randomness(seed: bytes, *, ternary="libstdcxx", order="ueo",
               **prng_kw):
    # Generous stream: ternary worst-case ~4n bytes + 12n cbd bytes
    s = Stream(prng_stream(seed, 40 * N, **prng_kw))
    tern = TERNARIES[ternary]
    if order == "ueo":
        u = tern(s, N)
        e0 = cbd_seal(s, N)
        e1 = cbd_seal(s, N)
    else:  # noise first
        e0 = cbd_seal(s, N)
        e1 = cbd_seal(s, N)
        u = tern(s, N)
    return u, e0, e1


# --------------------------------------------------------------------------
# Serialization variants
# --------------------------------------------------------------------------

def seal_stream(ct: Ciphertext, compress=True) -> bytes:
    blob = seal.SealCiphertextBlob(
        parms_id=seal.compute_parms_id(PARAMS.n, PARAMS.ct_moduli, PARAMS.t),
        is_ntt_form=False, n=PARAMS.n, k=len(PARAMS.ct_moduli), data=ct.data)
    return blob.to_stream(compress)


def frame(ct: Ciphertext, variant: str, compress=True) -> bytes:
    stream = seal_stream(ct, compress)
    w = Writer()
    if variant == "enum_vec_ctx":      # enum Seal(Vec<WithContext<SealCt>>)
        w.u32(0)
        w.u64(1)
        write_params(w, PARAMS)
        w.byte_vec(stream)
    elif variant == "params_enum_vec_ctx":  # struct{params, inner: enum}
        write_params(w, PARAMS)
        w.u32(0)
        w.u64(1)
        write_params(w, PARAMS)
        w.byte_vec(stream)
    elif variant == "params_vec":      # round-1 framework framing
        write_params(w, PARAMS)
        w.u64(1)
        w.byte_vec(stream)
    elif variant == "vec_ctx":         # Vec<WithContext> without enum tag
        w.u64(1)
        write_params(w, PARAMS)
        w.byte_vec(stream)
    elif variant == "bare":            # just the SEAL stream, length-prefixed
        w.byte_vec(stream)
    elif variant == "raw":             # just the SEAL stream
        w.raw(stream)
    else:
        raise KeyError(variant)
    return w.getvalue()


FRAMINGS = ["enum_vec_ctx", "params_enum_vec_ctx", "params_vec", "vec_ctx",
            "bare", "raw"]


# --------------------------------------------------------------------------
# The three fixtures
# --------------------------------------------------------------------------

def encrypt_seed() -> bytes:
    h = hashlib.sha512()
    h.update(bytes([1, 2, 3]))
    h.update(ENCRYPT_PRIVATE_CONSTANT)
    h.update((12).to_bytes(32, "big"))
    return h.digest()


def try_encrypt_fixture(rand_kw: dict, framing: str, compress=True) -> bool:
    u, e0, e1 = randomness(encrypt_seed(), **rand_kw)
    plain = PLAIN_TYPES["u256"].encode(12, PARAMS)
    ct = FHE.ctx.encrypt_with_randomness(plain, FHE.public_key, u, e0, e1)
    out = frame(ct, framing, compress)
    return hashlib.sha512(out).digest() == LINUX_ENCRYPT


def main():
    base = dict(ternary="libstdcxx", order="ueo")
    # Dimension grids, base guess first in each
    grids = {
        "ternary": ["libstdcxx", "modulo", "libcxx"],
        "order": ["ueo", "eou"],
        "buf": [4096, 512, 1024, 64],
        "ctr_fmt": ["<Q", ">Q", "<I"],
        "ctr_start": [0, 1],
        "swap": [False, True],
    }
    # Pass 1: base randomness x all framings x compression
    tried = 0
    for framing in FRAMINGS:
        for compress in (True, False):
            tried += 1
            if try_encrypt_fixture(base, framing, compress):
                print(f"MATCH! framing={framing} compress={compress} "
                      f"rand={base}")
                return
    # Pass 2: vary one randomness dim at a time (x all framings, zstd only)
    for dim, vals in grids.items():
        for v in vals[1:]:
            kw = dict(base)
            kw[dim] = v
            for framing in FRAMINGS:
                tried += 1
                if try_encrypt_fixture(kw, framing):
                    print(f"MATCH! framing={framing} rand={kw}")
                    return
    # Pass 3: full cartesian over randomness dims (zstd, all framings)
    keys = list(grids)
    for combo in itertools.product(*(grids[k] for k in keys)):
        kw = dict(zip(keys, combo))
        for framing in FRAMINGS:
            tried += 1
            if try_encrypt_fixture(kw, framing):
                print(f"MATCH! framing={framing} rand={kw}")
                return
        if tried % 60 == 0:
            print(f"... {tried} candidates tried", flush=True)
    print(f"no match after {tried} candidates")


if __name__ == "__main__":
    main()
