"""Cross-engine byte consensus on adversarial (wire-valid) ciphertexts.

Round-4 VERDICT weak #1: the JAX engine's t-gamma decrypt split from
golden/native on attacker-constructible boundary ciphertexts (c1 = 0 makes
dot = c0 fully attacker-chosen; a dot on a t*x/q rounding boundary flipped
the rounded coefficient -> code 0 with DIFFERENT payload bytes).  Decrypt
output is part of the consensus byte contract (reference fhe.rs:688-699,
linux golden hashes fhe.rs:2101-2119), so all three engines must emit
identical (code, payload) on EVERY wire-valid input -- garbage included.

The fix is the exact multiword CRT scale-and-round in ops/wide.py; these
tests pin it at the byte surface across golden / jax / native, plus the
size-3-component path (a wire ciphertext may carry any component count;
the device path must fold c2*s^2 exactly like golden._dot_with_secret).
"""
import numpy as np
import pytest

from fhe_precompiles_tpu import pack
from fhe_precompiles_tpu.app import FheApp, _CT_CODEC
from fhe_precompiles_tpu.bfv.golden import BfvContext, Ciphertext
from fhe_precompiles_tpu.ops.wide import ExactScaleRound
from fhe_precompiles_tpu.params import BENCH_N1024, BENCH_N8192, TESTNET_ONE

P = TESTNET_ONE
K = len(P.ct_moduli)
N = P.n
ENGINES = ("golden", "jax", "native")

# the round-4 VERDICT's deterministic reproducer dot (boundary-placed at
# testnet-one; the t-gamma path rounded it differently than exact CRT)
VERDICT_DOT = 6341038794891017812


@pytest.fixture(scope="module")
def apps():
    return {e: FheApp(P, engine=e) for e in ENGINES}


def _const_poly_ct(x: int, coeff: int = 0) -> bytes:
    """c1 = 0, c0 with CRT value x at one coefficient -> dot == x there."""
    data = np.zeros((2, K, N), dtype=np.uint64)
    for j, p in enumerate(P.ct_moduli):
        data[0, j, coeff] = x % p
    return Ciphertext(P, data).to_bytes()


def _decrypt_all(apps, op: str, ct_bytes: bytes):
    calldata = pack.pack_one_argument(ct_bytes, pack.BYTES)
    return {e: apps[e].call(op, calldata) for e in apps}


def _assert_identical(outs, label):
    distinct = {(code, payload) for code, payload in outs.values()}
    assert len(distinct) == 1, (
        f"engine consensus split on {label}: "
        + "; ".join(f"{e}: code={c} payload={p.hex()}"
                    for e, (c, p) in outs.items()))


# ---------------------------------------------------------------------------
# unit level: ExactScaleRound == golden._message_from_dot on every preset
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", [TESTNET_ONE, BENCH_N8192, BENCH_N1024],
                         ids=["testnet_one", "n8192_k3", "n1024_k1"])
def test_wide_exact_round_matches_golden(params):
    g = BfvContext(params)
    esr = ExactScaleRound(g.q_mods, params.t)
    q, t, k = params.q, params.t, g.k
    rng = np.random.default_rng(42)
    n = 256  # coefficient count is arbitrary for this kernel

    # uniform random dots + exhaustive boundary dots around every small m
    xs = [int(v) for v in rng.integers(0, 2**62, size=64)]
    xs = [x % q for x in xs]
    for m in (0, 1, 2, t // 2, t - 2, t - 1, t):
        base = m * q - q // 2
        for d in (-2, -1, 0, 1, 2):
            x = (base + d) // t
            if 0 <= x < q:
                xs.append(x)
                xs.append((base + d + t - 1) // t % q)
    xs.extend([0, 1, q - 1, q // 2, VERDICT_DOT % q])
    xs = (xs * (n // len(xs) + 1))[:n]

    dot = np.zeros((k, n), dtype=np.uint64)
    for j, p in enumerate(g.q_mods):
        dot[j] = np.array([x % p for x in xs], dtype=np.uint64)
    want = g._message_from_dot(dot)

    y = np.zeros((1, k, n), dtype=np.uint64)
    for j, p in enumerate(g.q_mods):
        y[0, j] = (dot[j].astype(object) * g.q_hat_inv[j] % p
                   ).astype(np.uint64)
    got = np.asarray(esr(y))[0]
    assert np.array_equal(got, want)


# ---------------------------------------------------------------------------
# byte surface: boundary dots through every decrypt op, all engines
# ---------------------------------------------------------------------------

def _boundary_dots():
    q, t = P.q, P.t
    xs = [VERDICT_DOT]
    for m in (0, 1, 5, t // 2, t - 1, t):
        base = m * q - q // 2
        for d in (-1, 0, 1):
            x = (base + d) // t
            if 0 <= x < q:
                xs.append(x)
    return xs


@pytest.mark.parametrize("tname", ["u256", "u64", "i64", "frac64"])
def test_c1_zero_boundary_byte_consensus(apps, tname):
    for x in _boundary_dots():
        outs = _decrypt_all(apps, f"decrypt_{tname}", _const_poly_ct(x))
        _assert_identical(outs, f"decrypt_{tname} boundary dot {x}")


def test_boundary_dots_at_high_coefficients(apps):
    """frac64 decodes high-degree coefficients (negacyclic wrap) -- pin the
    boundary behavior away from coefficient 0 too."""
    for coeff in (1, 63, N - 1):
        for x in _boundary_dots()[:5]:
            outs = _decrypt_all(apps, "decrypt_frac64",
                                _const_poly_ct(x, coeff=coeff))
            _assert_identical(outs, f"frac64 dot {x} at coeff {coeff}")


def test_size3_garbage_ct_byte_consensus(apps):
    """A wire ciphertext may carry 3 components; engines must fold c2*s^2
    identically (the jax path used to silently drop c2 -> code 0 with
    different frac64 payload bytes)."""
    rng = np.random.default_rng(7)
    for trial in range(3):
        data = np.zeros((3, K, N), dtype=np.uint64)
        for j, p in enumerate(P.ct_moduli):
            data[:, j] = rng.integers(0, p, size=(3, N), dtype=np.uint64)
        blob = Ciphertext(P, data).to_bytes()
        for tname in ("frac64", "u64"):
            outs = _decrypt_all(apps, f"decrypt_{tname}", blob)
            _assert_identical(outs, f"size-3 garbage #{trial} {tname}")


def test_wrong_key_ct_byte_consensus(apps):
    """Decrypting under the wrong key yields garbage that still must be
    byte-identical across engines (frac64 returns code 0 + garbage)."""
    ctx = apps["golden"].ctx
    pk, _sk = ctx.generate_keys(seed=b"\x5a" * 64)
    from fhe_precompiles_tpu.encoding import encode_frac64
    plain = encode_frac64(3.25, P)
    ct = ctx.encrypt(plain, pk, b"\x11" * 64)  # foreign key, network decrypt
    for tname in ("u256", "u64", "i64", "frac64"):
        outs = _decrypt_all(apps, f"decrypt_{tname}", ct.to_bytes())
        _assert_identical(outs, f"wrong-key {tname}")


def test_uniform_garbage_ct_byte_consensus(apps):
    rng = np.random.default_rng(123)
    for trial in range(4):
        data = np.zeros((2, K, N), dtype=np.uint64)
        for j, p in enumerate(P.ct_moduli):
            data[:, j] = rng.integers(0, p, size=(2, N), dtype=np.uint64)
        blob = Ciphertext(P, data).to_bytes()
        outs = _decrypt_all(apps, "decrypt_frac64", blob)
        _assert_identical(outs, f"uniform garbage #{trial}")


def test_reencrypt_boundary_ct_byte_consensus(apps):
    """reencrypt routes through decrypt -- a divergent plaintext would
    produce an entirely different output ciphertext (VERDICT weak #1)."""
    for x in _boundary_dots()[:4]:
        blob = _const_poly_ct(x)
        ct = Ciphertext.from_bytes(blob)
        outs = {}
        for e, app in apps.items():
            calldata = pack.pack_binary_operation(
                app.public_key, ct, _CT_CODEC, b"\x01\x02", pack.BYTES)
            outs[e] = app.call("reencrypt_i64", calldata)
        _assert_identical(outs, f"reencrypt boundary dot {x}")
