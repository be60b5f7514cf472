"""64-bit integer arithmetic as uint32 lane pairs for TPU kernels.

TPU vector units have no native 64-bit integer lanes, so every 64-bit hash
value in the device compute path is carried as a ``(lo, hi)`` pair of uint32
arrays.  This module provides the exact operations the sketch needs — xor,
wrapping add, lexicographic compare, the ntHash2 split-rotation by a traced
exponent (barrel-shifter over constant-shift stages), and wrapping multiply
by a 64-bit constant (for the nte multi-hash transform).

All shift amounts are python constants, so XLA sees only fixed shifts; the
variable rotation is a log2 cascade of masked constant rotations.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ntjoin_tpu.constants import ROT_HIGH_BITS, ROT_LOW_BITS, SROL_PERIOD

_U32 = jnp.uint32
MASK32 = 0xFFFFFFFF


def make(lo, hi):
    return jnp.asarray(lo, _U32), jnp.asarray(hi, _U32)


def from_np_u64(x: np.ndarray):
    x = np.asarray(x, dtype=np.uint64)
    return (
        jnp.asarray((x & np.uint64(MASK32)).astype(np.uint32)),
        jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
    )


def to_np_u64(pair) -> np.ndarray:
    lo, hi = pair
    return np.asarray(lo, dtype=np.uint64) | (np.asarray(hi, dtype=np.uint64) << np.uint64(32))


def xor(a, b):
    return a[0] ^ b[0], a[1] ^ b[1]


def add(a, b):
    lo = a[0] + b[0]
    carry = (lo < a[0]).astype(_U32)
    return lo, a[1] + b[1] + carry


def less(a, b):
    """a < b as uint64 (lexicographic on (hi, lo))."""
    return (a[1] < b[1]) | ((a[1] == b[1]) & (a[0] < b[0]))


def less_eq(a, b):
    return (a[1] < b[1]) | ((a[1] == b[1]) & (a[0] <= b[0]))


def select(pred, a, b):
    return jnp.where(pred, a[0], b[0]), jnp.where(pred, a[1], b[1])


# -- split-group representation for the ntHash2 rotation ------------------
# A 64-bit value splits into a 33-bit low group (bits 0..32) and a 31-bit
# high group (bits 33..63); srol^n rotates each group independently.


def _split_groups(pair):
    lo, hi = pair
    l_lo = lo  # bits 0..31 of the 33-bit group
    l_b32 = hi & _U32(1)  # bit 32 of the 33-bit group
    h = hi >> _U32(1)  # the 31-bit group
    return l_lo, l_b32, h


def _join_groups(l_lo, l_b32, h):
    return l_lo, (h << _U32(1)) | l_b32


def _rot33_const(l_lo, l_b32, c: int):
    """Rotate the 33-bit group left by python-constant c."""
    c %= ROT_LOW_BITS
    if c == 0:
        return l_lo, l_b32
    # V = l_b32 * 2^32 + l_lo (33-bit value);
    # rot = ((V << c) | (V >> (33 - c))) & mask33, composed from uint32 steps.
    def shl33(a, b, s):  # (V << s) mod 2^33 -> (lo32, bit32)
        if s == 0:
            return a, b
        if s < 32:
            na = a << _U32(s)
            nb = ((b << _U32(s)) | (a >> _U32(32 - s))) & _U32(1)
            return na, nb
        # s == 32
        return jnp.zeros_like(a), a & _U32(1)

    def shr33(a, b, s):  # V >> s -> (lo32, bit32)
        if s == 0:
            return a, b
        if s < 32:
            na = (a >> _U32(s)) | (b << _U32(32 - s))
            nb = jnp.zeros_like(b)
            return na, nb
        return b, jnp.zeros_like(b)  # s == 32

    a1, b1 = shl33(l_lo, l_b32, c)
    a2, b2 = shr33(l_lo, l_b32, ROT_LOW_BITS - c)
    return a1 | a2, (b1 | b2) & _U32(1)


def _rot31_const(h, c: int):
    """Rotate the 31-bit group left by python-constant c."""
    c %= ROT_HIGH_BITS
    if c == 0:
        return h
    mask31 = _U32(0x7FFFFFFF)
    return ((h << _U32(c)) | (h >> _U32(ROT_HIGH_BITS - c))) & mask31


def srol_const(pair, n: int):
    """srol^n for python-constant n."""
    if n % (ROT_LOW_BITS * ROT_HIGH_BITS) == 1:
        return srol1(pair)
    if n % (ROT_LOW_BITS * ROT_HIGH_BITS) == ROT_LOW_BITS * ROT_HIGH_BITS - 1:
        return sror1(pair)
    l_lo, l_b32, h = _split_groups(pair)
    l_lo, l_b32 = _rot33_const(l_lo, l_b32, n)
    h = _rot31_const(h, n)
    return _join_groups(l_lo, l_b32, h)


def srol1(pair):
    """srol^1 directly on the (lo, hi) pair — the hash kernel's hot rotate.

    Fewer ops than the generic split-group path (no split/join):
      new lo   = (lo << 1) | (hi & 1)            [33-bit group rotl1]
      new bit32= lo >> 31
      new high31 group H' = rotl1(H), H = hi >> 1
      new hi   = (((hi & 0xFFFFFFFE) | (hi >> 31)) << 1 & 0xFFFFFFFE)
                 | (lo >> 31)
    """
    lo, hi = pair
    one = _U32(1)
    nlo = (lo << one) | (hi & one)
    t = (hi & _U32(0xFFFFFFFE)) | (hi >> _U32(31))  # H<<1 | H>>30
    nhi = ((t << one) & _U32(0xFFFFFFFE)) | (lo >> _U32(31))
    return nlo, nhi


def sror1(pair):
    """srol^-1 directly on the (lo, hi) pair (the reverse-hash rotate)."""
    lo, hi = pair
    one = _U32(1)
    nlo = (lo >> one) | ((hi & one) << _U32(31))
    nhi = ((hi >> one) & _U32(0xFFFFFFFE)) | ((hi & _U32(2)) << _U32(30)) | (
        lo & one
    )
    return nlo, nhi


def srol_var(pair, n):
    """srol^n with traced per-element exponents n in [0, SROL_PERIOD).

    Barrel shifter: n's binary decomposition selects constant-rotation
    stages; 10 masked stages cover the 1023-long period.
    """
    n = jnp.asarray(n, _U32)
    out = pair
    for bit in range(10):  # 2^10 > SROL_PERIOD
        amount = (1 << bit) % SROL_PERIOD
        rotated = srol_const(out, amount)
        take = ((n >> _U32(bit)) & _U32(1)) == _U32(1)
        out = select(take, rotated, out)
    return out


def mul_const(pair, c: int):
    """Wrapping 64-bit multiply by a python-constant c (for nte)."""
    a_lo, a_hi = pair
    c_lo = c & MASK32
    c_hi = (c >> 32) & MASK32

    def mul32_full(x, y_const: int):
        """32x32 -> 64 product of traced x and constant y, as (lo, hi)."""
        x0 = x & _U32(0xFFFF)
        x1 = x >> _U32(16)
        y0 = y_const & 0xFFFF
        y1 = y_const >> 16
        p00 = x0 * _U32(y0)
        p01 = x0 * _U32(y1)
        p10 = x1 * _U32(y0)
        p11 = x1 * _U32(y1)
        mid = (p00 >> _U32(16)) + (p01 & _U32(0xFFFF)) + (p10 & _U32(0xFFFF))
        lo = (p00 & _U32(0xFFFF)) | (mid << _U32(16))
        hi = p11 + (p01 >> _U32(16)) + (p10 >> _U32(16)) + (mid >> _U32(16))
        return lo, hi

    lo, carry_hi = mul32_full(a_lo, c_lo)
    hi = carry_hi + a_lo * _U32(c_hi) + a_hi * _U32(c_lo)
    return lo, hi


def shr_const(pair, s: int):
    """Logical right shift by python-constant s in [0, 64)."""
    lo, hi = pair
    if s == 0:
        return lo, hi
    if s < 32:
        return (lo >> _U32(s)) | (hi << _U32(32 - s)), hi >> _U32(s)
    if s == 32:
        return hi, jnp.zeros_like(hi)
    return hi >> _U32(s - 32), jnp.zeros_like(hi)


def nte(pair, k: int, i: int = 1):
    """Multi-hash derivation nte(h, k, i) on the pair representation."""
    from ntjoin_tpu.constants import MASK64, MULTI_SEED, MULTI_SHIFT

    mult = (i ^ (k * MULTI_SEED)) & MASK64
    t = mul_const(pair, mult)
    return xor(t, shr_const(t, MULTI_SHIFT))
