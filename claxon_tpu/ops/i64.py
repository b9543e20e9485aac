"""Exact 64-bit integer arithmetic on 32-bit TPU lanes.

LPC synthesis needs up to ~51-bit intermediate products (reference
`src/subframe.rs:530-537`: 25-bit samples x 15-bit coefficients x order 32).
TPUs have no native int64 (XLA emulates it slowly and Pallas not at all), so
the kernels here represent an int64 as an (hi: int32, lo: uint32-in-int32)
pair and -- more importantly -- compute the prediction dot product via a
limb decomposition that never overflows 32 bits:

With coefficients split as c = c_hi * 2^8 + c_lo (c_hi signed 8-bit since
|c| < 2^15, c_lo unsigned 8-bit) and samples split as s = s_hi * 2^16 +
s_lo (s_hi signed 16-bit, s_lo unsigned 16-bit), the exact dot product over
<= 32 terms is

    sum(c*s) = B0 + B1*2^8 + B2*2^16 + B3*2^24

where each bucket B_k is a sum of <= 32 products bounded by 2^24, so every
bucket fits comfortably in int32. Only the final recombination needs the
64-bit pair -- O(1) per output sample instead of per term.
"""

import jax.numpy as jnp

__all__ = ["bucket_dot", "combine_buckets", "sar_low32", "dot_sar"]

_I32 = jnp.int32
_U32 = jnp.uint32


def _u(x):
    return x.astype(_U32)


def _i(x):
    return x.astype(_I32)


def bucket_dot(c, s, axis=-1):
    """Exact dot product of int32 ``c`` (|c| < 2^15) and int32 ``s`` along
    ``axis`` (<= 32 terms), returned as the four bucket sums (B0, B1, B2,
    B3) -- all int32, no overflow possible."""
    c_lo = c & 0xFF          # unsigned 8-bit limb, in [0, 256)
    c_hi = c >> 8            # signed 8-bit limb (arithmetic shift)
    s_lo = s & 0xFFFF        # unsigned 16-bit limb, in [0, 65536)
    s_hi = s >> 16           # signed 16-bit limb
    b0 = jnp.sum(c_lo * s_lo, axis=axis)
    b1 = jnp.sum(c_hi * s_lo, axis=axis)
    b2 = jnp.sum(c_lo * s_hi, axis=axis)
    b3 = jnp.sum(c_hi * s_hi, axis=axis)
    return b0, b1, b2, b3


def _add64(h1, l1, h2, l2):
    """(h1,l1) + (h2,l2); lo limbs are uint32-valued int32."""
    lo = _i(_u(l1) + _u(l2))
    carry = _i(_u(lo) < _u(l1))
    hi = h1 + h2 + carry
    return hi, lo


def _shl64_small(value_i32, k):
    """Sign-extended int32 shifted left by static k (0 <= k < 32),
    as an (hi, lo) pair."""
    if k == 0:
        return value_i32 >> 31, value_i32
    lo = value_i32 << k
    hi = ((value_i32 >> 31) << k) | _i(_u(value_i32) >> (32 - k))
    return hi, lo


def combine_buckets(b0, b1, b2, b3):
    """Recombine bucket sums into the exact (hi, lo) int64 pair:
    B0 + B1*2^8 + B2*2^16 + B3*2^24."""
    hi, lo = b0 >> 31, b0
    for b, k in ((b1, 8), (b2, 16), (b3, 24)):
        bh, bl = _shl64_small(b, k)
        hi, lo = _add64(hi, lo, bh, bl)
    return hi, lo


def sar_low32(hi, lo, shift):
    """Low 32 bits of the arithmetic right shift of the (hi, lo) pair by
    ``shift`` (int32 array, 0 <= shift <= 31)."""
    s1 = jnp.maximum(shift, 1)
    # NOTE: the shift count must be uint32 too -- a mixed uint32 >> int32
    # promotes to int32 and becomes an arithmetic shift.
    shifted = _i(_u(lo) >> _u(s1)) | (hi << (32 - s1))
    return jnp.where(shift == 0, lo, shifted)


def dot_sar(c, s, shift, axis=-1):
    """Low 32 bits of (sum(c * s) >> shift): the LPC prediction step.

    Exact for |c| < 2^15, any int32 ``s``, <= 32 terms, 0 <= shift <= 31.
    """
    hi, lo = combine_buckets(*bucket_dot(c, s, axis=axis))
    return sar_low32(hi, lo, shift)
