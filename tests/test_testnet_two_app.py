"""Byte-level cross-engine consensus at the future-testnet preset.

testnet.two-candidate (n=8192, t=65537, 3 ct limbs + special prime) is
the registry's `one` -> `two` versioning slot (reference testnet.rs
pattern).  The byte surface must already hold consensus there: FheApp
bound to generated network keys at that preset produces identical
(code, payload) on golden / jax / native for ops, threshold API, and
adversarial decrypt inputs (the exact-CRT path at k=3 exercises wider
multiword limbs than testnet-one's k=2).
"""
import hashlib

import numpy as np
import pytest

from fhe_precompiles_tpu import pack
from fhe_precompiles_tpu.app import _CT_CODEC, FheApp
from fhe_precompiles_tpu.bfv.golden import BfvContext, Ciphertext
from fhe_precompiles_tpu.params import TESTNET_TWO_CANDIDATE as P2
from fhe_precompiles_tpu.serialization import keyio

ENGINES = ("golden", "jax", "native")


@pytest.fixture(scope="module")
def apps():
    ctx = BfvContext(P2)
    pk, sk = ctx.generate_keys(seed=b"\x77" * 64)
    pub = keyio.save_public_key(pk)
    pri = keyio.save_private_key(sk)
    return {e: FheApp(P2, pub, pri, engine=e) for e in ENGINES}


def _identical(outs, label):
    assert len({v for v in outs.values()}) == 1, (
        label + ": " + repr({e: (c, len(p)) for e, (c, p) in outs.items()}))
    return outs["golden"]


def test_threshold_roundtrip_byte_consensus(apps):
    enc_in = pack.pack_two_arguments(123456789, pack.U64, b"t2", pack.BYTES)
    code, ct = _identical({e: a.call("encrypt_u64", enc_in)
                           for e, a in apps.items()}, "encrypt")
    assert code == 0
    dec_in = pack.pack_one_argument(ct, pack.BYTES)
    code, out = _identical({e: a.call("decrypt_u64", dec_in)
                            for e, a in apps.items()}, "decrypt")
    assert code == 0
    assert int.from_bytes(out, "big") == 123456789


def test_mul_and_mixed_sizes_byte_consensus(apps):
    g = apps["golden"]

    def ct(v, tag):
        from fhe_precompiles_tpu.encoding import PLAIN_TYPES
        return g.ctx.encrypt(PLAIN_TYPES["u64"].encode(v, P2), g.public_key,
                             hashlib.sha512(tag).digest())

    a, b = ct(1234567, b"a"), ct(89, b"b")
    data = pack.pack_binary_operation(g.public_key, a, _CT_CODEC,
                                      b, _CT_CODEC)
    code, out = _identical({e: app.call("mul_cipheru64_cipheru64", data)
                            for e, app in apps.items()}, "mul")
    assert code == 0
    dec_in = pack.pack_one_argument(out, pack.BYTES)
    code, val = _identical({e: app.call("decrypt_u64", dec_in)
                            for e, app in apps.items()}, "mul decrypt")
    assert int.from_bytes(val, "big") == 1234567 * 89
    # mismatched sizes (SEAL zero-extension) at k=3 too
    c3 = g.ctx.multiply(a, b)
    data3 = pack.pack_binary_operation(g.public_key, c3, _CT_CODEC,
                                       a, _CT_CODEC)
    code, _ = _identical({e: app.call("sub_cipheru64_cipheru64", data3)
                          for e, app in apps.items()}, "size-3 sub")
    assert code == 0


def test_boundary_dots_byte_consensus_at_k3(apps):
    """c1=0 boundary dots with the k=3 modulus stack: the exact multiword
    rounding runs wider limbs (q ~ 2^111) than testnet-one."""
    k, n = len(P2.ct_moduli), P2.n
    q, t = P2.q, P2.t
    xs = [0, q - 1]
    for m in (0, 1, t // 2, t - 1, t):
        for d in (-1, 0, 1):
            x = (m * q - q // 2 + d) // t
            if 0 <= x < q:
                xs.append(x)
    for x in xs:
        data = np.zeros((2, k, n), dtype=np.uint64)
        for j, p in enumerate(P2.ct_moduli):
            data[0, j, 0] = x % p
        blob = Ciphertext(P2, data).to_bytes()
        calldata = pack.pack_one_argument(blob, pack.BYTES)
        for tname in ("i64", "frac64"):
            _identical({e: a.call(f"decrypt_{tname}", calldata)
                        for e, a in apps.items()},
                       f"boundary {x} {tname}")
