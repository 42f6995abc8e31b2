"""ByteServer: batched byte-path serving == FheApp.call, byte for byte.

The server's contract (serve.py) is that a mixed stream of calldata
requests — multiple public keys, all op kinds, malformed inputs — returns
exactly the (code, payload) pairs FheApp.call produces one at a time, so
a TPU-fronted node stays in byte consensus with call-by-call validators
(the reference's deployment shape, c_fhe.rs:8-59).
"""
import hashlib

import numpy as np
import pytest

from fhe_precompiles_tpu import FheApp, pack
from fhe_precompiles_tpu.app import _CT_CODEC
from fhe_precompiles_tpu.encoding import PLAIN_TYPES
from fhe_precompiles_tpu.serve import BINARY_SPECS, ByteServer
from fhe_precompiles_tpu.testnet import one

FHE = one.FHE


@pytest.fixture(scope="module", params=["python", "native"])
def setup(request):
    app = FheApp(FHE.params, engine="jax")
    server = ByteServer(FHE.params, app=app, codec=request.param)
    pk1, sk1 = FHE.generate_keys()
    pk2, sk2 = FHE.generate_keys()
    return app, server, (pk1, sk1), (pk2, sk2)


def _ct(value, tname, pk, tag: bytes):
    poly = PLAIN_TYPES[tname].encode(value, FHE.params)
    return FHE.ctx.encrypt(poly, pk, hashlib.sha512(tag).digest())


def _mixed_stream(pk1, pk2):
    """Cross-section of the surface: cc ops under two keys, cp/pc
    fallbacks, threshold API, nullary, and three error shapes."""
    reqs = []
    scalars = {"u64": 4, "i64": 4, "frac64": 4.0, "u256": 4}
    for tname, pk, tag in (("u64", pk1, b"a"), ("i64", pk1, b"b"),
                           ("frac64", pk2, b"c"), ("u256", pk2, b"d")):
        a = _ct(16, tname, pk, tag + b"1")
        b = _ct(scalars[tname], tname, pk, tag + b"2")
        for op in ("add", "sub", "mul"):
            reqs.append((f"{op}_cipher{tname}_cipher{tname}",
                         pack.pack_binary_operation(pk, a, _CT_CODEC,
                                                    b, _CT_CODEC)))
    # cipher∘plain and plain∘cipher -> per-request fallback
    a = _ct(16, "u64", pk1, b"e1")
    reqs.append(("mul_cipheru64_u64",
                 pack.pack_binary_operation(pk1, a, _CT_CODEC, 4, pack.U64)))
    reqs.append(("add_u64_cipheru64",
                 pack.pack_binary_operation(pk1, 4, pack.U64, a, _CT_CODEC)))
    # threshold API -> fallback
    reqs.append(("encrypt_u64",
                 pack.pack_two_arguments(12, pack.U64, b"\x01", pack.BYTES)))
    net_ct = _ct(7, "u64", FHE.public_key, b"net")
    reqs.append(("decrypt_u64", pack.pack_one_argument(net_ct, _CT_CODEC)))
    reqs.append(("reencrypt_u64",
                 pack.pack_binary_operation(FHE.public_key, net_ct, _CT_CODEC,
                                            b"\x02", pack.BYTES)))
    reqs.append(("public_key_bytes", b""))
    # error shapes: unknown name, truncated calldata, relin-less pk mul
    reqs.append(("mul_cipheru64_nope", b"\x00\x01"))
    reqs.append(("add_cipheru64_cipheru64", b"\x00\x00\x00\x08trunc"))
    import dataclasses
    pk_norelin = dataclasses.replace(pk1, relin=None)
    b2 = _ct(4, "u64", pk1, b"f2")
    reqs.append(("mul_cipheru64_cipheru64",
                 pack.pack_binary_operation(pk_norelin, a, _CT_CODEC,
                                            b2, _CT_CODEC)))
    # size-3 ciphertext (unrelinearized product): legal for add, must
    # route through the one-shot fallback on both codecs
    c3 = FHE.ctx.multiply(a, b2)
    reqs.append(("add_cipheru64_cipheru64",
                 pack.pack_binary_operation(pk1, c3, _CT_CODEC,
                                            c3, _CT_CODEC)))
    reqs.append(("decrypt_u64", pack.pack_one_argument(
        FHE.ctx.multiply(_ct(2, "u64", FHE.public_key, b"n3a"),
                         _ct(3, "u64", FHE.public_key, b"n3b")),
        _CT_CODEC)))
    return reqs


def test_binary_specs_cover_the_36_ops():
    assert len(BINARY_SPECS) == 36
    shapes = {}
    for op, shape, _t in BINARY_SPECS.values():
        shapes[shape] = shapes.get(shape, 0) + 1
    assert shapes == {"cc": 12, "cp": 12, "pc": 12}


def test_byte_server_matches_fheapp_call(setup):
    app, server, (pk1, _sk1), (pk2, _sk2) = setup
    reqs = _mixed_stream(pk1, pk2)
    got = server.run(reqs)
    assert len(got) == len(reqs)
    for (name, data), (code, payload) in zip(reqs, got):
        want_code, want_payload = app.call(name, data)
        assert code == want_code, name
        assert payload == want_payload, name


def test_byte_server_matches_golden_engine(setup):
    """Cross-engine consensus at the server surface: batched TPU-path
    outputs equal the canonical golden engine's bytes."""
    _app, server, (pk1, _), (pk2, _) = setup
    golden = FheApp(FHE.params)  # engine="golden"
    reqs = _mixed_stream(pk1, pk2)[:12]  # the cc block carries the compute
    got = server.run(reqs)
    for (name, data), (code, payload) in zip(reqs, got):
        want = golden.call(name, data)
        assert (code, payload) == want, name


def test_byte_server_preserves_input_order(setup):
    """Grouping by (op, pk) must not reorder results."""
    app, server, (pk1, _), (pk2, _) = setup
    a1 = _ct(3, "u64", pk1, b"o1")
    b1 = _ct(5, "u64", pk1, b"o2")
    a2 = _ct(9, "u64", pk2, b"o3")
    b2 = _ct(2, "u64", pk2, b"o4")
    interleaved = []
    for i in range(3):
        interleaved.append(("add_cipheru64_cipheru64",
                            pack.pack_binary_operation(pk1, a1, _CT_CODEC,
                                                       b1, _CT_CODEC)))
        interleaved.append(("sub_cipheru64_cipheru64",
                            pack.pack_binary_operation(pk2, a2, _CT_CODEC,
                                                       b2, _CT_CODEC)))
    got = server.run(interleaved)
    for (name, data), res in zip(interleaved, got):
        assert res == app.call(name, data), name


def test_native_codec_large_mixed_stream():
    """Native-codec batching under load: a randomized 120-request stream
    crossing all four scalar types, cc/cp/pc shapes, threshold encrypt/
    decrypt (batched on device), reencrypt (fallback), two user keys and
    error shapes — every (code, payload) byte-equal to FheApp.call."""
    import random
    app = FheApp(FHE.params, engine="jax")
    server = ByteServer(FHE.params, app=app, codec="native")
    pk1, _ = FHE.generate_keys()
    pk2, _ = FHE.generate_keys()
    rng = random.Random(42)
    vals = {"u64": lambda: rng.randrange(1, 1 << 12),
            "i64": lambda: rng.randrange(-(1 << 12), 1 << 12),
            "u256": lambda: rng.randrange(1, 1 << 12),
            "frac64": lambda: rng.randrange(1, 1 << 10) / 8.0}
    reqs = []
    for j in range(120):
        tname = rng.choice(["u64", "i64", "u256", "frac64"])
        kind = rng.randrange(8)
        pk = pk1 if rng.random() < 0.5 else pk2
        sc = {"u64": pack.U64, "i64": pack.I64, "u256": pack.U256,
              "frac64": pack.FRAC64}[tname]
        if kind <= 2:  # cc op
            op = ("add", "sub", "mul")[kind]
            a = _ct(vals[tname](), tname, pk, b"L%da" % j)
            b = _ct(vals[tname](), tname, pk, b"L%db" % j)
            reqs.append((f"{op}_cipher{tname}_cipher{tname}",
                         pack.pack_binary_operation(pk, a, _CT_CODEC,
                                                    b, _CT_CODEC)))
        elif kind == 3:  # cp
            op = rng.choice(["add", "sub", "mul"])
            a = _ct(vals[tname](), tname, pk, b"L%dc" % j)
            reqs.append((f"{op}_cipher{tname}_{tname}",
                         pack.pack_binary_operation(pk, a, _CT_CODEC,
                                                    vals[tname](), sc)))
        elif kind == 4:  # pc
            op = rng.choice(["add", "sub", "mul"])
            b = _ct(vals[tname](), tname, pk, b"L%dd" % j)
            reqs.append((f"{op}_{tname}_cipher{tname}",
                         pack.pack_binary_operation(pk, vals[tname](), sc,
                                                    b, _CT_CODEC)))
        elif kind == 5:  # threshold encrypt
            reqs.append((f"encrypt_{tname}",
                         pack.pack_two_arguments(vals[tname](), sc,
                                                 b"pd%d" % j, pack.BYTES)))
        elif kind == 6:  # threshold decrypt (cross-type decode half the time)
            enc_t = rng.choice(["u64", tname])
            ct = _ct(vals[enc_t](), enc_t, FHE.public_key, b"L%de" % j)
            reqs.append((f"decrypt_{tname}",
                         pack.pack_one_argument(ct, _CT_CODEC)))
        else:  # reencrypt (fallback) or garbage
            if rng.random() < 0.5:
                ct = _ct(vals[tname](), tname, FHE.public_key, b"L%df" % j)
                reqs.append((f"reencrypt_{tname}",
                             pack.pack_binary_operation(pk, ct, _CT_CODEC,
                                                        b"rd", pack.BYTES)))
            else:
                reqs.append((f"add_cipher{tname}_cipher{tname}",
                             bytes([rng.randrange(256)
                                    for _ in range(rng.randrange(40))])))
    got = server.run(reqs)
    for (name, data), res in zip(reqs, got):
        assert res == app.call(name, data), name


def test_byte_server_on_mesh_native_codec():
    """ByteServer over a dp x tp device mesh with the native codec: the
    sharded device phase (XLA collectives for the cross-limb
    contractions) must not change a single output byte."""
    from fhe_precompiles_tpu.parallel.mesh import make_mesh
    app = FheApp(FHE.params, engine="jax")
    mesh = make_mesh(dp=4, tp=2)
    server = ByteServer(FHE.params, app=app, mesh=mesh, codec="native")
    pk1, _ = FHE.generate_keys()
    a = _ct(5, "u64", pk1, b"m1")
    b = _ct(3, "u64", pk1, b"m2")
    reqs = []
    for op in ("mul", "add", "mul", "sub", "mul"):
        reqs.append((f"{op}_cipheru64_cipheru64",
                     pack.pack_binary_operation(pk1, a, _CT_CODEC,
                                                b, _CT_CODEC)))
    reqs.append(("encrypt_u64",
                 pack.pack_two_arguments(8, pack.U64, b"mm", pack.BYTES)))
    got = server.run(reqs)
    for (name, data), res in zip(reqs, got):
        assert res == app.call(name, data), name
