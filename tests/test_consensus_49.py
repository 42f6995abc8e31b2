"""Full 49-op byte-path consensus: FheApp(engine="jax"/"native") vs golden.

The consensus claim (app.py: "TPU and CPU validators stay in byte
consensus") requires every PRECOMPILE_NAMES entry -- not just a sample --
to emit byte-identical output under both engines.  Reference test breadth
analog: fhe.rs:1024-2338.
"""
import hashlib

import pytest

from fhe_precompiles_tpu import FheApp, pack
from fhe_precompiles_tpu.app import _CT_CODEC, PRECOMPILE_NAMES
from fhe_precompiles_tpu.encoding import PLAIN_TYPES
from fhe_precompiles_tpu.testnet import one

FHE = one.FHE
SCALARS = {"u256": pack.U256, "u64": pack.U64, "i64": pack.I64,
           "frac64": pack.FRAC64}


@pytest.fixture(scope="module", params=["jax", "native"])
def accel_app(request):
    return FheApp(FHE.params, engine=request.param)


@pytest.fixture(scope="module")
def user_keys():
    return FHE.generate_keys()


def _value(tname, x):
    return float(x) if tname == "frac64" else x


def _inputs_for(name, user_keys):
    """Build valid packed calldata for any precompile name."""
    pk, _sk = user_keys
    kind, _, rest = name.partition("_")
    if kind in ("encrypt", "reencrypt", "decrypt"):
        tname = rest
        scalar = SCALARS[tname]
        if kind == "encrypt":
            return pack.pack_two_arguments(_value(tname, 12), scalar,
                                           b"\x01\x02\x03", pack.BYTES)
        seed = hashlib.sha512(name.encode()).digest()
        ct = FHE.ctx.encrypt(
            PLAIN_TYPES[tname].encode(_value(tname, 12), FHE.params),
            FHE.public_key, seed)
        if kind == "decrypt":
            return pack.pack_one_argument(ct, _CT_CODEC)
        return pack.pack_binary_operation(pk, ct, _CT_CODEC,
                                         b"\x01\x02\x03", pack.BYTES)
    if name == "public":  # public_key_bytes splits oddly; handled by caller
        return b""
    op, a_t, b_t = name.split("_")
    tname = a_t.replace("cipher", "")
    scalar = SCALARS[tname]
    a_cipher = a_t.startswith("cipher")
    b_cipher = b_t.startswith("cipher")
    seed_a = hashlib.sha512((name + "a").encode()).digest()
    seed_b = hashlib.sha512((name + "b").encode()).digest()
    enc = lambda v, s: FHE.ctx.encrypt(
        PLAIN_TYPES[tname].encode(_value(tname, v), FHE.params), pk, s)
    a = enc(16, seed_a) if a_cipher else _value(tname, 16)
    b = enc(4, seed_b) if b_cipher else _value(tname, 4)
    ca = _CT_CODEC if a_cipher else scalar
    cb = _CT_CODEC if b_cipher else scalar
    return pack.pack_binary_operation(pk, a, ca, b, cb)


@pytest.mark.parametrize("name", PRECOMPILE_NAMES)
def test_op_byte_consensus(accel_app, user_keys, name):
    if name == "public_key_bytes":
        data = b""
    else:
        data = _inputs_for(name, user_keys)
    code_g, out_g = FHE.call(name, data)
    code_j, out_j = accel_app.call(name, data)
    assert code_g == 0, f"{name}: golden failed with {code_g}"
    assert code_j == 0, f"{name}: jax failed with {code_j}"
    assert out_g == out_j, f"{name}: byte divergence between engines"
