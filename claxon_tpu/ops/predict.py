"""The unified batched synthesis kernel.

One kernel reconstructs every FLAC subframe type, for a whole batch of
subframes (one (frame, channel) per lane) in a single XLA program:

* LPC (orders 1-32): ``out[t] = x[t] + ((sum_k C[k] * out[t-32+k]) >> shift)``
  with exact >=53-bit accumulation (see ``i64``), arithmetic shift, and
  truncating int32 add -- bit-identical to the reference's i64 path
  (`src/subframe.rs:559-582`).
* FIXED (orders 0-4): the same recurrence with Pascal's-triangle
  coefficients and shift 0. The reference computes FIXED in wrapping i32
  (`src/subframe.rs:461-470`); with shift 0 the low-32-bits-of-exact-sum
  equal the wrapped i32 sum (mod-2^32 congruence), so the unified kernel is
  bit-identical there too.
* CONSTANT / VERBATIM: order 0, all-zero coefficients -- the input passes
  through unchanged.

Warm-up samples occupy ``x[:order]`` per lane and pass through via the
``t >= order`` mask, exactly like the reference's in-place buffer layout.

The time dimension is a true sequential dependency (the reference notes the
same, it's the LPC feedback); the TPU wins by making the *lane* dimension
wide: thousands of subframes synthesize in lockstep on the VPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from .i64 import bucket_dot, combine_buckets, sar_low32

__all__ = ["synthesize", "synthesize_best", "synthesize_reference",
           "pack_coefficients"]

ORDER_MAX = 32


def pack_coefficients(coef_lists):
    """Pack per-subframe coefficient lists (oldest-sample-first, the
    convention of `claxon_tpu.subframe.decode_lpc`) into an (L, 32) int32
    array, left-padded with zeros so column 31 multiplies out[t-1]."""
    out = np.zeros((len(coef_lists), ORDER_MAX), dtype=np.int32)
    for i, coefs in enumerate(coef_lists):
        if len(coefs):
            out[i, ORDER_MAX - len(coefs):] = coefs
    return out


@partial(jax.jit, static_argnames=("unroll",))
def synthesize(x, coefs, shifts, orders, lengths=None, unroll=4):
    """Batched prediction synthesis.

    Args:
      x:       (L, T) int32 -- warm-up samples in positions [0, order_l),
               decoded residuals after; padding lanes/samples are zeros.
      coefs:   (L, 32) int32 -- |c| < 2^15, left-padded (col 31 = newest).
      shifts:  (L,) int32 -- QLP shift, 0..15 (0 for fixed/constant/verbatim).
      orders:  (L,) int32 -- predictor order, 0..32.
      lengths: optional (L,) int32 valid length per lane; outputs at
               t >= lengths[l] are forced to 0 so time padding cannot
               extrapolate the recurrence (which would defeat the int16
               transfer packing's overflow check).

    Returns:
      (L, T) int32 decoded samples.
    """
    L, T = x.shape
    shifts = shifts[:, None] if shifts.ndim == 1 else shifts

    def step(state, inp):
        xt, t = inp
        b = bucket_dot(coefs, state, axis=1)
        hi, lo = combine_buckets(*b)
        pred = sar_low32(hi, lo, shifts[:, 0])
        val = jnp.where(t >= orders, xt + pred, xt)
        if lengths is not None:
            val = jnp.where(t < lengths, val, 0)
        state = jnp.concatenate([state[:, 1:], val[:, None]], axis=1)
        return state, val

    state0 = jnp.zeros((L, ORDER_MAX), dtype=jnp.int32)
    ts = jnp.arange(T, dtype=jnp.int32)
    _, out = jax.lax.scan(step, state0, (x.T, ts), unroll=unroll)
    return out.T


def synthesize_best(x, coefs, shifts, orders, lengths=None, platform=None):
    """Synthesize with the fastest backend for the target platform:
    the hand-scheduled Pallas kernel on TPU (1.8-5.0x the XLA scan across
    the bench bucket shapes, measured on the real chip by
    tools/synth_backend_bench.py), the XLA scan elsewhere. Both are
    bit-exact; CLAXON_TPU_NO_PALLAS=1 forces the XLA path.

    ``platform`` overrides the default-device inference -- mesh-sharded
    programs must pass the MESH's platform (a CPU mesh on a TPU-default
    process would otherwise trace the Pallas kernel onto CPU)."""
    import os
    if platform is None:
        platform = jax.devices()[0].platform
    if (platform == "tpu" and not os.environ.get("CLAXON_TPU_NO_PALLAS")):
        from .pallas_synth import synthesize_pallas
        return synthesize_pallas(x, coefs, shifts, orders, lengths)
    return synthesize(x, coefs, shifts, orders, lengths)


def synthesize_reference(x, coefs, shifts, orders):
    """Pure-numpy/Python oracle with identical semantics, for kernel tests."""
    x = np.asarray(x)
    L, T = x.shape
    result = np.zeros((L, T), dtype=np.int32)
    for l in range(L):
        order = int(orders[l])
        shift = int(shifts[l])
        cs = [int(c) for c in coefs[l]]
        buf = [int(v) for v in x[l]]
        for t in range(T):
            if t >= order:
                acc = 0
                for k in range(ORDER_MAX):
                    j = t - ORDER_MAX + k
                    if j >= 0 and cs[k]:
                        acc += cs[k] * buf[j]
                pred = acc >> shift
                v = (pred + buf[t]) & 0xFFFFFFFF
                buf[t] = v - (1 << 32) if v >= (1 << 31) else v
        result[l] = buf
    return result
