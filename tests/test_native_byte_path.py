"""Pure-native C ABI byte-consensus tests (libc_fhe_native.so).

The zero-Python analog of the reference staticlib: calldata framing,
bincode/SEAL/zstd codecs, plaintext encodings, SHA-512 threshold seeding and
the BFV engine all in C++ (native/precompiles.cpp + host_engine.cpp).  Every
(code, payload) must be byte-identical to FheApp.call -- these tests pin the
full 49-op surface plus the error-code matrix against the Python app.
"""
import concurrent.futures
import hashlib
import shutil
import struct
import subprocess

import pytest

from fhe_precompiles_tpu import pack
from fhe_precompiles_tpu.app import _CT_CODEC, PRECOMPILE_NAMES
from fhe_precompiles_tpu.bfv.golden import Ciphertext
from fhe_precompiles_tpu.encoding import PLAIN_TYPES
from fhe_precompiles_tpu.testnet import one

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")

FHE = one.FHE
SCALARS = {"u256": pack.U256, "u64": pack.U64, "i64": pack.I64,
           "frac64": pack.FRAC64}
VAL1 = {"u256": 16, "u64": 16, "i64": -16, "frac64": 2.5}
VAL2 = {"u256": 4, "u64": 4, "i64": 4, "frac64": -0.25}


@pytest.fixture(scope="module")
def native():
    import os
    from fhe_precompiles_tpu.native import NativeFhe
    d = os.path.join(os.path.dirname(
        os.path.abspath(__import__("fhe_precompiles_tpu").__file__)), "native")
    subprocess.run(["make", "-C", d, "libc_fhe_native.so"], check=True,
                   capture_output=True)
    return NativeFhe(os.path.join(d, "libc_fhe_native.so"))


@pytest.fixture(scope="module")
def user_keys():
    return FHE.generate_keys()


def _ct(value, tname, pk, tag=b"m"):
    seed = hashlib.sha512(tag + tname.encode()).digest()
    return FHE.ctx.encrypt(PLAIN_TYPES[tname].encode(value, FHE.params),
                           pk, seed)


def _build_input(name, user_pk):
    """Construct a valid calldata payload for any of the 49 precompiles."""
    head, rest = name.split("_", 1)
    if name == "public_key_bytes":
        return b""
    if head in ("encrypt", "reencrypt", "decrypt"):
        tname = rest
        if head == "encrypt":
            return pack.pack_two_arguments(VAL1[tname], SCALARS[tname],
                                           b"public-data", pack.BYTES)
        ct = _ct(VAL1[tname], tname, FHE.public_key, b"thr")
        if head == "decrypt":
            return pack.pack_one_argument(ct, _CT_CODEC)
        return pack.pack_binary_operation(user_pk, ct, _CT_CODEC,
                                          b"re-data", pack.BYTES)
    a_t, b_t = rest.split("_")
    tname = a_t.replace("cipher", "")
    sc = SCALARS[tname]
    a = (_ct(VAL1[tname], tname, FHE.public_key, b"a")
         if a_t.startswith("cipher") else VAL1[tname])
    b = (_ct(VAL2[tname], tname, FHE.public_key, b"b")
         if b_t.startswith("cipher") else VAL2[tname])
    ca = _CT_CODEC if a_t.startswith("cipher") else sc
    cb = _CT_CODEC if b_t.startswith("cipher") else sc
    return pack.pack_binary_operation(FHE.public_key, a, ca, b, cb)


# --------------------------------------------------------------------------
# full 49-op byte consensus vs the Python app
# --------------------------------------------------------------------------

@pytest.mark.parametrize("name", PRECOMPILE_NAMES)
def test_byte_consensus_with_python_app(native, user_keys, name):
    data = _build_input(name, user_keys[0])
    code_n, out_n = native.call(name, data)
    code_p, out_p = FHE.call(name, data)
    assert code_n == code_p == 0
    assert out_n == out_p


def test_decrypted_values_correct(native, user_keys):
    """End-to-end through the native lib only: encrypt -> mul -> decrypt."""
    d1 = pack.pack_two_arguments(6, pack.U64, b"x", pack.BYTES)
    d2 = pack.pack_two_arguments(7, pack.U64, b"y", pack.BYTES)
    _, ct1 = native.call("encrypt_u64", d1)
    _, ct2 = native.call("encrypt_u64", d2)
    binp = pack.pack_binary_operation(
        FHE.public_key, Ciphertext.from_bytes(ct1), _CT_CODEC,
        Ciphertext.from_bytes(ct2), _CT_CODEC)
    code, prod = native.call("mul_cipheru64_cipheru64", binp)
    assert code == 0
    code, out = native.call(
        "decrypt_u64", pack.pack_one_argument(
            Ciphertext.from_bytes(prod), _CT_CODEC))
    assert code == 0 and pack.U64.deserialize(out) == 42


def test_frac64_roundtrip_values(native):
    for v in (2.5, -0.375, 1e-30, 123456.75):
        data = pack.pack_two_arguments(v, pack.FRAC64, b"f", pack.BYTES)
        _, ct = native.call("encrypt_frac64", data)
        code, out = native.call(
            "decrypt_frac64",
            pack.pack_one_argument(Ciphertext.from_bytes(ct), _CT_CODEC))
        assert code == 0 and pack.FRAC64.deserialize(out) == v


# --------------------------------------------------------------------------
# error-code matrix parity (mirrors tests/test_error_code_matrix.py)
# --------------------------------------------------------------------------

@pytest.mark.parametrize("name,data,want", [
    ("encrypt_u64", b"\x00\x00", 1),                      # truncated offsets
    ("add_cipheru64_cipheru64", b"\x00\x00\x00", 1),
    ("reencrypt_u64", struct.pack(">I", 10_000_000) + b"\x00" * 64, 1),
    ("decrypt_u64", b"\xde\xad\xbe\xef" * 10, 3),         # garbage ct
])
def test_error_codes_match_python(native, name, data, want):
    code_n, _ = native.call(name, data)
    code_p, _ = FHE.call(name, data)
    assert code_n == code_p == want


@pytest.mark.parametrize("tname", list(SCALARS))
def test_wrong_width_scalar(native, tname):
    data = pack.pack_two_arguments(b"\x01\x02\x03", pack.BYTES,
                                   b"x", pack.BYTES)
    assert native.call(f"encrypt_{tname}", data)[0] == 3


@pytest.mark.parametrize("bad", [float("nan"), float("inf"), 1e308])
def test_encrypt_frac64_nonfinite(native, bad):
    data = pack.pack_two_arguments(bad, pack.FRAC64, b"x", pack.BYTES)
    code_n, _ = native.call("encrypt_frac64", data)
    code_p, _ = FHE.call("encrypt_frac64", data)
    assert code_n == code_p == 6


def test_decode_overflow_failed_decryption(native):
    big = (1 << 200) + 5
    ct = _ct(big, "u256", FHE.public_key, b"ovf")
    data = pack.pack_one_argument(ct, _CT_CODEC)
    for name in ("decrypt_u64", "decrypt_i64"):
        code_n, _ = native.call(name, data)
        code_p, _ = FHE.call(name, data)
        assert code_n == code_p == 5


def test_wrong_key_decrypt(native, user_keys):
    pk, _sk = user_keys
    ct = _ct(5, "u64", pk, b"wrongkey")
    data = pack.pack_one_argument(ct, _CT_CODEC)
    code_n, _ = native.call("decrypt_u64", data)
    code_p, _ = FHE.call("decrypt_u64", data)
    assert code_n == code_p == 5


def test_mul_without_relin_keys(native, user_keys):
    import copy
    pk, _sk = user_keys
    bare = copy.copy(pk)
    bare.relin = None
    a = _ct(3, "u64", pk, b"a")
    b = _ct(2, "u64", pk, b"b")
    data = pack.pack_binary_operation(bare, a, _CT_CODEC, b, _CT_CODEC)
    assert native.call("mul_cipheru64_cipheru64", data)[0] == 7
    code, out = native.call("add_cipheru64_cipheru64", data)
    assert code == 0 and out == FHE.call("add_cipheru64_cipheru64", data)[1]


def test_size3_ciphertext_add(native, user_keys):
    """Mismatched component counts follow SEAL's zero-extension add
    (round 5; tests/test_size_semantics.py covers the full matrix):
    size-3 product + size-2 ct -> size-3 sum, byte-identical across
    stacks, decrypting to the plaintext sum."""
    pk, sk = user_keys
    a = _ct(3, "u64", pk, b"s3a")
    b = _ct(2, "u64", pk, b"s3b")
    c3 = FHE.ctx.multiply(a, b)
    data = pack.pack_binary_operation(pk, c3, _CT_CODEC, a, _CT_CODEC)
    got_n = native.call("add_cipheru64_cipheru64", data)
    got_p = FHE.call("add_cipheru64_cipheru64", data)
    assert got_n == got_p
    assert got_n[0] == 0
    out = Ciphertext.from_bytes(got_n[1])
    assert out.size == 3
    assert PLAIN_TYPES["u64"].decode(FHE.ctx.decrypt(out, sk),
                                     FHE.params) == 3 * 2 + 3


def test_galois_bearing_pk_accepted(native, user_keys):
    """A pk carrying galois keys must parse (and be ignored), like the
    reference's deserializer (fhe.rs:34-44)."""
    from fhe_precompiles_tpu.serialization import keyio
    from fhe_precompiles_tpu.serialization.bincode import Reader, Writer
    pk, sk = user_keys
    raw = pk.to_bytes()
    r = Reader(raw)
    params = keyio.read_params(r)
    pk_stream = r.byte_vec()
    assert not r.option()
    rest = raw[r.off:]
    w = Writer()
    keyio.write_params(w, params)
    w.byte_vec(pk_stream)
    w.option(True)
    keyio.write_params(w, params)
    w.byte_vec(b"\x00" * 32)
    w.raw(rest)
    patched = w.getvalue()
    a = _ct(6, "u64", pk, b"gal")
    pa = a.to_bytes()
    off1 = 8 + len(patched)
    data = (struct.pack(">II", off1, off1 + len(pa)) + patched + pa + pa)
    code, out = native.call("add_cipheru64_cipheru64", data)
    assert code == 0
    assert out == FHE.call("add_cipheru64_cipheru64", data)[1]


# --------------------------------------------------------------------------
# concurrency: the whole byte path is GIL-free C++; hammer it from threads
# --------------------------------------------------------------------------

def test_concurrent_byte_path(native, user_keys):
    inputs = []
    for i in range(8):
        a = _ct(3 + i, "u64", FHE.public_key, b"ca%d" % i)
        b = _ct(5, "u64", FHE.public_key, b"cb%d" % i)
        inputs.append(pack.pack_binary_operation(
            FHE.public_key, a, _CT_CODEC, b, _CT_CODEC))
    expected = [FHE.call("mul_cipheru64_cipheru64", d) for d in inputs]

    def run(d):
        return native.call("mul_cipheru64_cipheru64", d)

    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
        got = list(ex.map(run, inputs * 2))
    assert got == expected * 2


def test_error_strings(native):
    assert native.error_str(1) == "Unexpected end of file"
    assert native.error_str(4) == "Overflow in FHE program"
    assert native.error_str(99) == "Unknown error"


@pytest.mark.parametrize("seed", range(2))
def test_fuzz_code_consensus_random_bytes(native, seed):
    """Random bytes into every precompile: the native ABI and the Python app
    must return the SAME code (consensus nodes on different stacks must
    reject identically -- this would catch e.g. a zstd-version acceptance
    divergence or any parser laxness on either side)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    for name in PRECOMPILE_NAMES:
        for size in (0, 1, 7, 64, 300):
            data = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
            got_n = native.call(name, data)
            got_p = FHE.call(name, data)
            assert got_n == got_p, (name, size, got_n[0], got_p[0])


def test_fuzz_code_consensus_mutated_ciphertext(native):
    """Bit-flips across every region of a valid ciphertext blob (bincode
    header, SEAL header, zstd frame, payload): identical (code, payload) on
    both stacks for each mutation."""
    import numpy as np
    data = pack.pack_two_arguments(12, pack.U256, b"\x01", pack.BYTES)
    _, ct = native.call("encrypt_u256", data)
    rng = np.random.default_rng(11)
    for _ in range(48):
        pos = int(rng.integers(0, len(ct)))
        mutated = bytearray(ct)
        mutated[pos] ^= 1 << int(rng.integers(0, 8))
        got_n = native.call("decrypt_u256", bytes(mutated))
        got_p = FHE.call("decrypt_u256", bytes(mutated))
        assert got_n == got_p, (pos, got_n[0], got_p[0])


def test_fuzz_code_consensus_truncations(native):
    data = pack.pack_two_arguments(5, pack.U64, b"", pack.BYTES)
    _, ct = native.call("encrypt_u64", data)
    for cut in (0, 8, 40, 56, 80, len(ct) // 2, len(ct) - 1):
        got_n = native.call("decrypt_u64", ct[:cut])
        got_p = FHE.call("decrypt_u64", ct[:cut])
        assert got_n == got_p, (cut, got_n[0], got_p[0])


def test_frac64_encode_parity_random_bit_patterns(native):
    """The exact-rounding surface: random f64 bit patterns through
    encrypt_frac64 on both paths must agree on (code, payload) -- pins the
    C++ encode (frexp bit extraction) against Python's Fraction() exactly,
    including values whose integer part overflows (code 6)."""
    import random
    rng = random.Random(1234)
    specials = [0.0, -0.0, 5e-324, -5e-324, 2.0**-1022, 1.5, -1.5,
                float(2**63), float(2**64), 1e308, 0.1, -1/3]
    patterns = [struct.pack(">d", v) for v in specials]
    patterns += [struct.pack(">Q", rng.getrandbits(64)) for _ in range(60)]
    for raw in patterns:
        (v,) = struct.unpack(">d", raw)
        if v != v or v in (float("inf"), float("-inf")):
            continue  # non-finite covered by test_encrypt_frac64_nonfinite
        data = pack.pack_two_arguments(v, pack.FRAC64, b"fz", pack.BYTES)
        got_n = native.call("encrypt_frac64", data)
        got_p = FHE.call("encrypt_frac64", data)
        assert got_n == got_p, (v, got_n[0], got_p[0])


def test_frac64_decode_parity_after_arithmetic(native):
    """Decode parity on polynomials with real carry structure: products and
    sums of fractional values decrypted through both paths -- pins the C++
    bignum compose + nearest-even rational-to-double against
    float(Fraction) on non-trivial coefficient patterns."""
    pairs = [(2.5, -0.25), (1.0 / 3.0, 3.0), (123456.789, 0.001),
             (-7.125, -0.875), (2.0**-30, 2.0**-30), (0.1, 0.7)]
    for v1, v2 in pairs:
        a = _ct(v1, "frac64", FHE.public_key, b"fa")
        b = _ct(v2, "frac64", FHE.public_key, b"fb")
        for op in ("mul", "add"):
            data = pack.pack_binary_operation(
                FHE.public_key, a, _CT_CODEC, b, _CT_CODEC)
            code, out = native.call(f"{op}_cipherfrac64_cipherfrac64", data)
            assert code == 0
            dec = pack.pack_one_argument(Ciphertext.from_bytes(out),
                                         _CT_CODEC)
            got_n = native.call("decrypt_frac64", dec)
            got_p = FHE.call("decrypt_frac64", dec)
            assert got_n == got_p, (v1, v2, op)


@pytest.mark.parametrize("seed", range(3))
def test_random_op_chain_consensus(native, seed):
    """A random sequence of binary ops applied to an evolving ciphertext
    through BOTH stacks, byte equality asserted at every step (noise grows
    across the chain, exercising decode/rounding regions single ops miss)."""
    import random
    rng = random.Random(seed)
    ct_bytes = native.call("encrypt_u64", pack.pack_two_arguments(
        rng.randrange(1, 1 << 16), pack.U64, b"chain", pack.BYTES))[1]
    assert ct_bytes
    for step in range(6):
        op = rng.choice(["add", "sub", "mul"])
        shape = rng.choice(["cc", "cp", "pc"])
        cur = Ciphertext.from_bytes(ct_bytes)
        if shape == "cc":
            other = _ct(rng.randrange(1, 1 << 8), "u64", FHE.public_key,
                        b"ch%d%d" % (seed, step))
            data = pack.pack_binary_operation(
                FHE.public_key, cur, _CT_CODEC, other, _CT_CODEC)
            name = f"{op}_cipheru64_cipheru64"
        elif shape == "cp":
            data = pack.pack_binary_operation(
                FHE.public_key, cur, _CT_CODEC,
                rng.randrange(1, 1 << 8), pack.U64)
            name = f"{op}_cipheru64_u64"
        else:
            data = pack.pack_binary_operation(
                FHE.public_key, rng.randrange(1, 1 << 8), pack.U64,
                cur, _CT_CODEC)
            name = f"{op}_u64_cipheru64"
        got_n = native.call(name, data)
        got_p = FHE.call(name, data)
        assert got_n == got_p, (step, name, got_n[0], got_p[0])
        assert got_n[0] == 0
        ct_bytes = got_n[1]
    dec = pack.pack_one_argument(Ciphertext.from_bytes(ct_bytes), _CT_CODEC)
    for t in SCALARS:  # cross-type decode of the accumulated value
        assert native.call(f"decrypt_{t}", dec) == FHE.call(f"decrypt_{t}",
                                                            dec)


def test_cross_type_decrypt_matrix(native):
    """decrypt_X of a ciphertext encoding type Y, all 16 combinations:
    identical (code, payload) on both stacks (some succeed -- e.g. a u64
    plaintext decodes fine as frac64 -- others overflow to 5)."""
    for enc_t in SCALARS:
        ct = _ct(VAL1[enc_t], enc_t, FHE.public_key, b"xt")
        data = pack.pack_one_argument(ct, _CT_CODEC)
        for dec_t in SCALARS:
            got_n = native.call(f"decrypt_{dec_t}", data)
            got_p = FHE.call(f"decrypt_{dec_t}", data)
            assert got_n == got_p, (enc_t, dec_t, got_n[0], got_p[0])


def test_error_order_mismatched_pk_with_malformed_operand(native):
    """Regression (round-3 advisor): FheApp deserializes pk, a AND b before
    any params check (pack.py:195-197 then _check_params), so calldata with
    a valid-but-mismatched-params pk plus a malformed ciphertext operand
    must return 3 (parse error) on BOTH stacks.  The native path used to
    check the pk's params first and return 7 — a validator consensus break."""
    import numpy as np
    from fhe_precompiles_tpu.bfv.golden import PublicKey
    from fhe_precompiles_tpu.params import Params, ntt_friendly_primes

    other = Params(poly_modulus_degree=4096,
                   coeff_modulus=ntt_friendly_primes(
                       4096, 3, exclude=FHE.params.coeff_modulus),
                   plain_modulus=4096)
    zero_pk = PublicKey(other, np.zeros((2, 3, 4096), dtype=np.uint64))
    good_ct = _ct(5, "u64", FHE.public_key, b"ord")

    # mismatched pk + malformed operand -> parse error 3 on both stacks
    data = pack.pack_binary_operation(zero_pk, b"\xde\xad\xbe\xef" * 4,
                                      pack.BYTES, good_ct, _CT_CODEC)
    got_n = native.call("add_cipheru64_cipheru64", data)
    got_p = FHE.call("add_cipheru64_cipheru64", data)
    assert got_n == got_p == (3, b"")

    # malformed SECOND operand behind a mismatched pk: still 3 on both
    data = pack.pack_binary_operation(zero_pk, good_ct, _CT_CODEC,
                                      b"\x00" * 7, pack.BYTES)
    got_n = native.call("add_cipheru64_cipheru64", data)
    got_p = FHE.call("add_cipheru64_cipheru64", data)
    assert got_n == got_p == (3, b"")

    # mismatched pk + well-formed operands -> params check fires: 7 on both
    data = pack.pack_binary_operation(zero_pk, good_ct, _CT_CODEC,
                                      good_ct, _CT_CODEC)
    got_n = native.call("add_cipheru64_cipheru64", data)
    got_p = FHE.call("add_cipheru64_cipheru64", data)
    assert got_n == got_p == (7, b"")


@pytest.mark.parametrize("nmods", [14, 65])
def test_many_moduli_pk_parms_id_consensus(native, nmods):
    """Regression (round-3 advisor): a wire-valid public key carrying 14+
    moduli makes the parms_id input exceed one BLAKE2b block; the native
    single-block hash (and a 64-moduli count cap Python never had) used to
    return 3 where FheApp returns 7 (loads fine, fails the params check)."""
    import numpy as np
    from fhe_precompiles_tpu.bfv.golden import PublicKey
    from fhe_precompiles_tpu.params import Params, ntt_friendly_primes

    other = Params(poly_modulus_degree=4096,
                   coeff_modulus=ntt_friendly_primes(
                       4096, nmods, exclude=FHE.params.coeff_modulus),
                   plain_modulus=4096)
    zero_pk = PublicKey(other,
                        np.zeros((2, nmods, 4096), dtype=np.uint64))
    good_ct = _ct(5, "u64", FHE.public_key, b"mm")
    data = pack.pack_binary_operation(zero_pk, good_ct, _CT_CODEC,
                                      good_ct, _CT_CODEC)
    got_n = native.call("add_cipheru64_cipheru64", data)
    got_p = FHE.call("add_cipheru64_cipheru64", data)
    assert got_n == got_p == (7, b"")


def test_small_n_encoder_bounds_consensus(native, tmp_path):
    """Regression (round-3 advisor): with operator-supplied small-n keys
    (FHE_TPU_NETWORK_PUB/PRI, n=32 here), plaintext encoders must reject
    values needing more binary digits than the ring has — exactly like
    Python's IndexError/overflow paths — instead of writing past the
    n-element coefficient vector (heap corruption from untrusted calldata)."""
    import os
    import sys
    from fhe_precompiles_tpu.bfv.golden import BfvContext
    from fhe_precompiles_tpu.params import Params, ntt_friendly_primes
    from fhe_precompiles_tpu.serialization import keyio
    tiny = Params(poly_modulus_degree=32,
                  coeff_modulus=ntt_friendly_primes(32, 2, below=1 << 27),
                  plain_modulus=64)
    ctx = BfvContext(tiny)
    pk, sk = ctx.generate_keys(seed=b"\x07" * 64)
    pub = tmp_path / "tiny.pub"
    pri = tmp_path / "tiny.pri"
    pub.write_bytes(keyio.save_public_key(pk))
    pri.write_bytes(keyio.save_private_key(sk))
    script = r"""
import sys
import jax; jax.config.update("jax_platforms", "cpu")
from fhe_precompiles_tpu.native import NativeFhe
from fhe_precompiles_tpu import FheApp, pack
from fhe_precompiles_tpu.app import _CT_CODEC
from fhe_precompiles_tpu.bfv.golden import Ciphertext
from fhe_precompiles_tpu.params import Params, ntt_friendly_primes

lib_path, pub, pri = sys.argv[1:4]
nat = NativeFhe(lib_path)
tiny = Params(poly_modulus_degree=32,
              coeff_modulus=ntt_friendly_primes(32, 2, below=1 << 27),
              plain_modulus=64)
app = FheApp(tiny, open(pub, "rb").read(), open(pri, "rb").read())

def both(name, data):
    got_n = nat.call(name, data)
    got_p = app.call(name, data)
    assert got_n == got_p, (name, got_n[0], got_p[0])
    return got_n

def two(v, sc):
    return pack.pack_two_arguments(v, sc, b"pd", pack.BYTES)

# in-range values still encrypt byte-identically at n=32
ct16 = both("encrypt_u64", two(16, pack.U64))
assert ct16[0] == 0
both("encrypt_u256", two((1 << 31) | 5, pack.U256))

# values needing > n binary digits: IndexError path -> FailedEncryption(6)
assert both("encrypt_u256", two(1 << 255, pack.U256))[0] == 6
assert both("encrypt_u256", two((1 << 255) | 1, pack.U256))[0] == 6
assert both("encrypt_u64", two(1 << 40, pack.U64))[0] == 6
assert both("encrypt_i64", two(-(1 << 40), pack.I64))[0] == 6

# frac64 with n < 64: no fractional coefficients exist -> overflow -> 6;
# a pure small integer encodes, but decode needs n >= 64 -> 5
assert both("encrypt_frac64", two(0.5, pack.FRAC64))[0] == 6
ct3 = both("encrypt_frac64", two(3.0, pack.FRAC64))
assert ct3[0] == 0
dec = pack.pack_one_argument(Ciphertext.from_bytes(ct3[1]), _CT_CODEC)
assert both("decrypt_frac64", dec)[0] == 5

# cipher-plain op whose scalar overflows the ring -> RuntimeError(7)
cur = Ciphertext.from_bytes(ct16[1])
data = pack.pack_binary_operation(app.public_key, cur, _CT_CODEC,
                                  1 << 40, pack.U64)
assert both("add_cipheru64_u64", data)[0] == 7
data = pack.pack_binary_operation(app.public_key, cur, _CT_CODEC,
                                  7, pack.U64)
assert both("add_cipheru64_u64", data)[0] == 0
print("SMALL N OK")
"""
    env = dict(os.environ)
    env["FHE_TPU_NETWORK_PUB"] = str(pub)
    env["FHE_TPU_NETWORK_PRI"] = str(pri)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    lib = os.path.join(os.path.dirname(os.path.abspath(__import__(
        "fhe_precompiles_tpu.native", fromlist=["x"]).__file__)),
        "libc_fhe_native.so")
    res = subprocess.run([sys.executable, "-c", script, lib, str(pub),
                          str(pri)], capture_output=True, text=True,
                         env=env, timeout=600, cwd="/")
    assert res.returncode == 0, res.stderr
    assert "SMALL N OK" in res.stdout


def test_custom_preset_via_env_keys(native, tmp_path):
    """FHE_TPU_NETWORK_PUB/PRI point the native ABI at operator-supplied
    keys; the parameter set is inferred from the blobs, so one binary
    serves any supported preset.  Run in a subprocess (the App singleton
    binds per process) against FheApp on the same keys."""
    import os
    import sys
    from fhe_precompiles_tpu.bfv.golden import BfvContext
    from fhe_precompiles_tpu.params import BENCH_N8192
    from fhe_precompiles_tpu.serialization import keyio
    ctx = BfvContext(BENCH_N8192)
    pk, sk = ctx.generate_keys(seed=b"\x42" * 64)
    pub = tmp_path / "net.pub"
    pri = tmp_path / "net.pri"
    pub.write_bytes(keyio.save_public_key(pk))
    pri.write_bytes(keyio.save_private_key(sk))
    script = r"""
import sys
import jax; jax.config.update("jax_platforms", "cpu")
from fhe_precompiles_tpu.native import NativeFhe
from fhe_precompiles_tpu import FheApp, pack
from fhe_precompiles_tpu.app import _CT_CODEC
from fhe_precompiles_tpu.params import BENCH_N8192

lib_path, pub, pri = sys.argv[1:4]
nat = NativeFhe(lib_path)
app = FheApp(BENCH_N8192, open(pub, "rb").read(), open(pri, "rb").read())
for name, data in [
    ("public_key_bytes", b""),
    ("encrypt_u64", pack.pack_two_arguments(9, pack.U64, b"p", pack.BYTES)),
]:
    assert nat.call(name, data) == app.call(name, data), name
code, ct = nat.call("encrypt_u64",
                    pack.pack_two_arguments(6, pack.U64, b"q", pack.BYTES))
assert code == 0
from fhe_precompiles_tpu.bfv.golden import Ciphertext
c = Ciphertext.from_bytes(ct)
binp = pack.pack_binary_operation(app.public_key, c, _CT_CODEC, c, _CT_CODEC)
assert nat.call("mul_cipheru64_cipheru64", binp) == \
    app.call("mul_cipheru64_cipheru64", binp)
dec = pack.pack_one_argument(Ciphertext.from_bytes(
    nat.call("mul_cipheru64_cipheru64", binp)[1]), _CT_CODEC)
got = nat.call("decrypt_u64", dec)
assert got == app.call("decrypt_u64", dec)
assert pack.U64.deserialize(got[1]) == 36
print("CUSTOM PRESET OK")
"""
    env = dict(os.environ)
    env["FHE_TPU_NETWORK_PUB"] = str(pub)
    env["FHE_TPU_NETWORK_PRI"] = str(pri)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    lib = os.path.join(os.path.dirname(os.path.abspath(__import__(
        "fhe_precompiles_tpu.native", fromlist=["x"]).__file__)),
        "libc_fhe_native.so")
    res = subprocess.run([sys.executable, "-c", script, lib, str(pub),
                          str(pri)], capture_output=True, text=True,
                         env=env, timeout=600, cwd="/")
    assert res.returncode == 0, res.stderr
    assert "CUSTOM PRESET OK" in res.stdout


def test_standalone_c_host_pure_native(native):
    """The same C host program as test_native_abi, linked against the
    zero-Python library -- proof the ABI needs no runtime at all."""
    import os
    d = os.path.dirname(os.path.abspath(__import__(
        "fhe_precompiles_tpu.native", fromlist=["x"]).__file__))
    exe = os.path.join(d, "host_test_native")
    subprocess.run(
        ["gcc", os.path.join(d, "host_test.c"), "-o", exe,
         f"-L{d}", "-lc_fhe_native", "-lpthread", "-Wl,-rpath,$ORIGIN"],
        check=True, capture_output=True)
    ldd = subprocess.run(["ldd", exe], capture_output=True, text=True)
    assert "python" not in ldd.stdout.lower()  # no Python dependency
    res = subprocess.run([exe], capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr
    assert "HOST TEST PASSED" in res.stdout


def test_static_library_host(native):
    """Staticlib parity (reference Cargo.toml crate-type): build
    libc_fhe_native.a and a statically-linked host test; no .so, no
    Python in the link.  Static binaries can't locate the package data
    dir via dladdr, so the operator supplies FHE_TPU_NATIVE_DATA."""
    import os
    d = os.path.dirname(os.path.abspath(__import__(
        "fhe_precompiles_tpu.native", fromlist=["x"]).__file__))
    subprocess.run(["make", "-C", d, "libc_fhe_native.a",
                    "host_test_static"], check=True, capture_output=True)
    exe = os.path.join(d, "host_test_static")
    ldd = subprocess.run(["ldd", exe], capture_output=True, text=True)
    assert "libc_fhe" not in ldd.stdout and "python" not in ldd.stdout.lower()
    env = dict(os.environ)
    env["FHE_TPU_NATIVE_DATA"] = os.path.join(os.path.dirname(d), "data")
    res = subprocess.run([exe], capture_output=True, text=True, env=env,
                         timeout=300)
    assert res.returncode == 0, res.stderr
    assert "HOST TEST PASSED" in res.stdout


def test_foreign_relin_params_rejected_everywhere(native):
    """A pk whose RELIN params differ from the app's (same shapes, larger
    moduli, so the blob is wire-valid and self-consistent) must fail mul
    with code 7 on every stack: its residues are only range-checked
    against its own moduli, so letting it reach an accelerated engine
    would feed non-canonical inputs (Shoup/lazy bounds broken — bytes
    could diverge from golden with code 0).  Regression for the app-level
    guard mirroring native do_binary's rk_params check."""
    import dataclasses
    from fhe_precompiles_tpu import FheApp
    from fhe_precompiles_tpu.bfv.golden import RelinKeys
    from fhe_precompiles_tpu.params import Params, ntt_friendly_primes
    from fhe_precompiles_tpu.serve import ByteServer

    base = FHE.params
    swap = ntt_friendly_primes(4096, 2, exclude=base.coeff_modulus)
    foreign = Params(poly_modulus_degree=base.n,
                     coeff_modulus=(swap[0], swap[1], base.coeff_modulus[2]),
                     plain_modulus=base.t)
    for j in range(3):  # residues stay in range under the foreign moduli
        assert foreign.coeff_modulus[j] >= base.coeff_modulus[j]
    pk, _sk = FHE.generate_keys()
    evil = dataclasses.replace(
        pk, relin=RelinKeys(foreign, pk.relin.data))
    a = _ct(3, "u64", pk, b"fr1")
    b = _ct(2, "u64", pk, b"fr2")
    data = pack.pack_binary_operation(evil, a, _CT_CODEC, b, _CT_CODEC)

    jax_app = FheApp(FHE.params, engine="jax")
    got = {
        "golden": FHE.call("mul_cipheru64_cipheru64", data),
        "jax": jax_app.call("mul_cipheru64_cipheru64", data),
        "native": native.call("mul_cipheru64_cipheru64", data),
        "server_py": ByteServer(FHE.params, app=jax_app).run(
            [("mul_cipheru64_cipheru64", data)])[0],
        "server_nat": ByteServer(FHE.params, app=jax_app,
                                 codec="native").run(
            [("mul_cipheru64_cipheru64", data)])[0],
    }
    assert all(v == (7, b"") for v in got.values()), got
    # add still works through the same pk (relin unused)
    code, out = native.call("add_cipheru64_cipheru64", data)
    assert code == 0 and (code, out) == FHE.call("add_cipheru64_cipheru64",
                                                 data)
