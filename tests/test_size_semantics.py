"""SEAL zero-extension add/sub semantics for arbitrary component counts.

The wire accepts ciphertexts of ANY size >= 1 (keyio.load_ciphertext), and
SEAL's Evaluator defines add/sub on mismatched sizes as zero-extension:
result size = max(sa, sb), shared components combine, the larger operand's
extras are copied (negated when they come from the subtrahend).  Before
round 5, the three engines disagreed here -- jnp broadcasting silently
"added d0 to every component" for a size-1 operand (code 0, wrong bytes),
golden's numpy broadcast was accidentally asymmetric, and the native
stacks rejected with 7 -- a consensus split on wire-valid data.

All four stacks (golden / jax / native engine / pure-C++ ABI) now agree
byte-for-byte, and the semantics are verified against plaintext values.
"""
import hashlib
import os
import shutil
import subprocess

import numpy as np
import pytest

from fhe_precompiles_tpu import pack
from fhe_precompiles_tpu.app import _CT_CODEC, FheApp
from fhe_precompiles_tpu.bfv.golden import Ciphertext
from fhe_precompiles_tpu.encoding import PLAIN_TYPES
from fhe_precompiles_tpu.params import TESTNET_ONE
from fhe_precompiles_tpu.testnet import one

P = TESTNET_ONE
K, N = len(P.ct_moduli), P.n
FHE = one.FHE


@pytest.fixture(scope="module")
def apps():
    return {e: FheApp(P, engine=e) for e in ("golden", "jax", "native")}


@pytest.fixture(scope="module")
def native_abi():
    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    from fhe_precompiles_tpu.native import NativeFhe
    d = os.path.join(os.path.dirname(
        os.path.abspath(__import__("fhe_precompiles_tpu").__file__)), "native")
    subprocess.run(["make", "-C", d, "libc_fhe_native.so"], check=True,
                   capture_output=True)
    return NativeFhe(os.path.join(d, "libc_fhe_native.so"))


def _rand_ct(size, seed):
    rng = np.random.default_rng(seed)
    d = np.zeros((size, K, N), dtype=np.uint64)
    for j, p in enumerate(P.ct_moduli):
        d[:, j] = rng.integers(0, p, size=(size, N), dtype=np.uint64)
    return Ciphertext(P, d)


@pytest.mark.parametrize("op", ["add", "sub"])
def test_mismatched_sizes_byte_identical_all_stacks(apps, native_abi, op):
    name = f"{op}_cipheru64_cipheru64"
    for sa in (1, 2, 3):
        for sb in (1, 2, 3):
            a, b = _rand_ct(sa, 10 * sa + sb), _rand_ct(sb, 100 + sb)
            data = pack.pack_binary_operation(FHE.public_key, a, _CT_CODEC,
                                              b, _CT_CODEC)
            outs = {e: app.call(name, data) for e, app in apps.items()}
            outs["native-abi"] = native_abi.call(name, data)
            distinct = {v for v in outs.values()}
            assert len(distinct) == 1, (
                f"{name} ({sa},{sb}): "
                + {e: (c, len(p)) for e, (c, p) in outs.items()}.__repr__())
            code, payload = outs["golden"]
            assert code == 0
            got = Ciphertext.from_bytes(payload)
            assert got.size == max(sa, sb)


def test_zero_extension_semantics_against_plaintexts(apps):
    """add/sub with a genuine size-3 (unrelinearized product) operand must
    track the plaintext algebra through decryption on every engine."""
    ctx = FHE.ctx
    sk = FHE.private_key

    def enc(v, tag):
        return ctx.encrypt(PLAIN_TYPES["u64"].encode(v, P), FHE.public_key,
                           hashlib.sha512(tag).digest())

    prod3 = ctx.multiply(enc(6, b"za"), enc(7, b"zb"))       # size 3, m=42
    c2 = enc(100, b"zc")                                     # size 2
    for e, app in apps.items():
        eng = app._engine if app._engine is not None else app.ctx
        s = eng.add(Ciphertext(P, prod3.data.copy()), c2)
        assert s.size == 3
        assert PLAIN_TYPES["u64"].decode(ctx.decrypt(s, sk), P) == 142, e
        # subtrahend larger: extras must be NEGATED
        d2 = eng.sub(c2, Ciphertext(P, prod3.data.copy()))
        assert d2.size == 3
        assert PLAIN_TYPES["u64"].decode(ctx.decrypt(d2, sk), P) == 100 - 42, e
        # addend larger: extras copied
        s2 = eng.add(c2, Ciphertext(P, prod3.data.copy()))
        assert PLAIN_TYPES["u64"].decode(ctx.decrypt(s2, sk), P) == 142, e


def test_plain_ops_on_odd_sizes_byte_identical(apps, native_abi):
    """cipher-plain ops on size-1/size-3 cts: engines must agree too."""
    for size in (1, 3):
        ct = _rand_ct(size, 500 + size)
        data = pack.pack_binary_operation(FHE.public_key, ct, _CT_CODEC,
                                          5, pack.U64)
        for name in ("add_cipheru64_u64", "mul_cipheru64_u64"):
            outs = {e: app.call(name, data) for e, app in apps.items()}
            outs["native-abi"] = native_abi.call(name, data)
            assert len({v for v in outs.values()}) == 1, (name, size)


def test_size5_ct_through_decrypt_and_add(apps, native_abi):
    """Large component counts: decrypt folds s^4 identically everywhere;
    zero-extension add handles (5,2)."""
    c5 = _rand_ct(5, 901)
    c2 = _rand_ct(2, 902)
    dec_in = pack.pack_one_argument(c5.to_bytes(), pack.BYTES)
    outs = {e: app.call("decrypt_frac64", dec_in) for e, app in apps.items()}
    outs["native-abi"] = native_abi.call("decrypt_frac64", dec_in)
    assert len({v for v in outs.values()}) == 1
    add_in = pack.pack_binary_operation(FHE.public_key, c5, _CT_CODEC,
                                        c2, _CT_CODEC)
    outs = {e: app.call("add_cipheru64_cipheru64", add_in)
            for e, app in apps.items()}
    outs["native-abi"] = native_abi.call("add_cipheru64_cipheru64", add_in)
    assert len({v for v in outs.values()}) == 1
    assert outs["golden"][0] == 0


def test_reencrypt_to_relinless_target_pk(apps, native_abi):
    """reencrypt only ENCRYPTS under the target key, so a pk without relin
    keys is legal; all stacks must agree (and succeed)."""
    import dataclasses
    pk1, _ = FHE.generate_keys()
    pk_norelin = dataclasses.replace(pk1, relin=None)
    ct = FHE.ctx.encrypt(PLAIN_TYPES["u64"].encode(7, P), FHE.public_key,
                         hashlib.sha512(b"rr").digest())
    data = pack.pack_binary_operation(pk_norelin, ct, _CT_CODEC,
                                      b"\x05", pack.BYTES)
    outs = {e: app.call("reencrypt_u64", data) for e, app in apps.items()}
    outs["native-abi"] = native_abi.call("reencrypt_u64", data)
    assert len({v for v in outs.values()}) == 1
    assert outs["golden"][0] == 0


def test_byte_server_matches_on_mismatched_sizes(apps):
    """The batched server must route odd sizes through the fallback and
    stay byte-equal."""
    from fhe_precompiles_tpu.serve import ByteServer
    app = FheApp(P, engine="jax")
    server = ByteServer(P, app=app, codec="native")
    reqs = []
    for sa, sb in ((1, 2), (2, 1), (3, 2), (1, 3)):
        a, b = _rand_ct(sa, 20 * sa + sb), _rand_ct(sb, 300 + sb)
        reqs.append(("sub_cipheru64_cipheru64",
                     pack.pack_binary_operation(FHE.public_key, a, _CT_CODEC,
                                                b, _CT_CODEC)))
    got = server.run(reqs)
    for (name, data), res in zip(reqs, got):
        assert res == app.call(name, data)
    server.close()
