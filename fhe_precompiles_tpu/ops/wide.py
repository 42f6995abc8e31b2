"""Exact multiword CRT scale-and-round for device decryption.

Computes, per coefficient, ``m = floor((t*x + q//2) / q) mod t`` where
``x = (sum_j y_j * q_hat_j) mod q`` and ``y_j = |dot_j * q_hat_inv_j|_{q_j}``
-- the exact semantics of ``bfv/golden.py::_message_from_dot`` (which defines
the canonical consensus bytes, mirrored by ``native/host_engine.cpp::
he_decrypt``).  Everything runs as 32-bit-limb multiword arithmetic in
uint64 lanes: every limb product is (< 2**32) * (< 2**32) < 2**64, so each
step is exact on TPU where XLA emulates u64 with u32 pairs.

Why this exists: the previous device path used the division-free t-gamma
approximation (Bajard et al. full-RNS FV), which is exact only when
``t*x/q`` is farther than ~k/gamma from a rounding boundary.  Valid
ciphertexts always satisfy that, but the wire accepts ARBITRARY residues:
a ciphertext with c1 = 0 makes ``dot = c0`` fully attacker-chosen, and a
boundary-placed dot made the jax engine emit code 0 with different payload
bytes than golden/native (round-4 VERDICT; reproduced and pinned by
tests/test_decrypt_consensus.py).  Decrypt output is part of the consensus
byte contract (reference fhe.rs:688-699), so the device path must be exact
on EVERY wire-valid input, not just well-formed encryptions.

Cost: ~40-80 u64 multiplies per coefficient for k<=3 -- small next to the
NTT already inside decrypt (see benchmarks/RESULTS.md decrypt rows).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

_M32 = np.uint64(0xFFFFFFFF)
_S32 = np.uint64(32)
_B32 = np.uint64(1) << _S32
_ONE = np.uint64(1)


def _int_limbs(v: int, count: int) -> list:
    """Little-endian 32-bit limbs of a nonnegative python int."""
    assert v >= 0 and v < (1 << (32 * count)), (v, count)
    return [(v >> (32 * i)) & 0xFFFFFFFF for i in range(count)]


def _carry(slots: list) -> list:
    """Normalize accumulated slots to canonical (< 2**32) limbs.

    Slot values may hold sums of up to ~2**20 partial products, each
    < 2**32; the ripple keeps every intermediate < 2**64.  The final
    carry out of the top slot must be zero (callers size the slot count
    from exact host-side bounds, asserted in ExactScaleRound.__init__).
    """
    out = []
    carry = None
    for s in slots:
        cur = s if carry is None else s + carry
        out.append(cur & _M32)
        carry = cur >> _S32
    return out


def _mul_acc_const(slots: list, x_limbs: list, c_limbs: list) -> None:
    """slots += x * c (schoolbook; x limbs variable arrays, c python ints)."""
    W = len(slots)
    for a, xa in enumerate(x_limbs):
        for b, cb in enumerate(c_limbs):
            if cb == 0:
                continue
            p = xa * np.uint64(cb)
            lo, hi = p & _M32, p >> _S32
            if a + b < W:
                slots[a + b] = lo if slots[a + b] is None else slots[a + b] + lo
            if a + b + 1 < W:
                s = slots[a + b + 1]
                slots[a + b + 1] = hi if s is None else s + hi
    for i in range(W):
        if slots[i] is None:
            slots[i] = np.uint64(0)


def _sub_borrow(x: list, y: list):
    """(x - y) limbs with final borrow flag: returns (diff, x >= y)."""
    diff = []
    borrow = np.uint64(0)
    for xi, yi in zip(x, y):
        tmp = xi + _B32 - yi - borrow
        diff.append(tmp & _M32)
        borrow = (tmp >> _S32) ^ _ONE
    return diff, borrow == 0


class ExactScaleRound:
    """Host-precomputed constants + jit-traceable exact rounding.

    ``__call__(y)`` maps canonical residues y: (..., k, n) uint64 (each
    limb row < q_j) to the plaintext polynomial m: (..., n) uint64 in
    [0, t).  Bit-identical to golden._message_from_dot by construction;
    asserted over boundary/garbage inputs by tests/test_wide.py.
    """

    def __init__(self, q_mods, t: int):
        q_mods = [int(p) for p in q_mods]
        t = int(t)
        assert 2 <= t < (1 << 32), "plain modulus must fit one 32-bit limb"
        k = len(q_mods)
        q = math.prod(q_mods)
        self.k, self.t = k, t

        q_hat = [q // p for p in q_mods]
        # accumulation bound: S = sum_j y_j * q_hat_j < k * q
        s_max = sum((p - 1) * h for p, h in zip(q_mods, q_hat))
        self.WS = max((s_max.bit_length() + 31) // 32,
                      # hi halves land one slot above the top product limb
                      2 + max((h.bit_length() + 31) // 32 for h in q_hat))
        assert s_max < 1 << (32 * self.WS)
        self.q_hat_limbs = [_int_limbs(h, self.WS) for h in q_hat]
        self.q_limbs_S = _int_limbs(q, self.WS)
        self.n_csub = k - 1                     # S < k*q

        # z = t*x + q//2 with x < q
        z_max = t * (q - 1) + q // 2
        self.WZ = max((z_max.bit_length() + 31) // 32,
                      (q.bit_length() + 31) // 32 + 1)
        assert z_max < 1 << (32 * self.WZ)
        self.t_limbs = _int_limbs(t, 1)
        self.h_limbs = _int_limbs(q // 2, self.WZ)
        self.q_limbs_Z = _int_limbs(q, self.WZ)

        # Barrett: m_est = floor(z * mu / 2**s), s >= bits(z_max) + 1
        # => m_est in {m_true - 1, m_true}; one conditional +1 corrects.
        self.sl = (z_max.bit_length() + 1 + 31) // 32
        s = 32 * self.sl
        mu = (1 << s) // q
        self.mu_limbs = _int_limbs(mu, (mu.bit_length() + 31) // 32)
        # product slots: need limbs [0, sl+1] correct => W = sl + 2
        self.WP = self.sl + 2

    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        k, t = self.k, self.t
        # split residues (< 2**37) into 32-bit limb pairs
        ys = [(y[..., j, :] & _M32, y[..., j, :] >> _S32) for j in range(k)]

        # S = sum_j y_j * q_hat_j
        slots = [None] * self.WS
        for j in range(k):
            _mul_acc_const(slots, list(ys[j]), self.q_hat_limbs[j])
        S = _carry(slots)
        # x = S mod q via at most k-1 conditional subtracts
        for _ in range(self.n_csub):
            diff, geq = _sub_borrow(S, [np.uint64(c) for c in self.q_limbs_S])
            S = [jnp.where(geq, d, s) for d, s in zip(diff, S)]
        x = S[:self.WZ] + [np.uint64(0)] * max(0, self.WZ - len(S))

        # z = t*x + q//2
        slots = [None] * self.WZ
        _mul_acc_const(slots, x, self.t_limbs)
        for i, h in enumerate(self.h_limbs):
            if h:
                slots[i] = slots[i] + np.uint64(h)
        z = _carry(slots)

        # m_est = floor(z * mu / 2**(32*sl))
        slots = [None] * self.WP
        _mul_acc_const(slots, z, self.mu_limbs)
        prod = _carry(slots)
        m = prod[self.sl] | (prod[self.sl + 1] << _S32)

        # correct: r = z - m*q; if r >= q then m += 1  (m <= t < 2**32)
        slots = [None] * self.WZ
        _mul_acc_const(slots, [m & _M32, m >> _S32], self.q_limbs_Z)
        w = _carry(slots)
        r, _ = _sub_borrow(z, w)
        _, r_geq_q = _sub_borrow(r, [np.uint64(c) for c in self.q_limbs_Z])
        m = jnp.where(r_geq_q, m + _ONE, m)

        # m <= t exactly once (x in the top sliver of [0, q)); reduce mod t
        t64 = np.uint64(t)
        return jnp.where(m >= t64, m - t64, m)
