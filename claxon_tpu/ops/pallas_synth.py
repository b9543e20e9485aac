"""Pallas TPU kernel for batched prediction synthesis.

Alternative backend to ``ops.predict.synthesize`` (same semantics, same
exactness argument -- see docs/exact_integer_kernels.md). The layout is
time-major so the sequential time axis walks the sublane dimension while
all lanes ride the 128-wide vector dimension:

* grid over time chunks (sequential on the TPU core; VMEM scratch carries
  the 32-sample recurrence history between chunks);
* per chunk, a ``fori_loop`` computes one output row per step from the
  previous 32 rows held in a rolling VMEM window -- the four limb-bucket
  dot products, the (hi, lo) recombination and the arithmetic shift are
  the same 32-bit ops as the XLA path.

This kernel is the PRODUCTION backend on TPU (``synthesize_best``
dispatches here; CLAXON_TPU_NO_PALLAS=1 forces the XLA scan). Measured on
the real chip it beats the XLA ``lax.scan`` path 1.8-5.0x across the
bench bucket shapes (tools/synth_backend_bench.py; table in
docs/performance.md). ``interpret=True`` (automatic off-TPU) makes it
testable on CPU.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .i64 import combine_buckets, sar_low32
from .predict import ORDER_MAX

__all__ = ["synthesize_pallas"]


_GROUP = 8  # output rows stored per aligned vector store


def _kernel(x_ref, coefs_ref, shifts_ref, orders_ref, lengths_ref, out_ref,
            hist, CT):
    g = pl.program_id(1)  # time chunk (inner, sequential)

    @pl.when(g == 0)
    def _init():
        hist[:] = jnp.zeros_like(hist[:])

    coefs = coefs_ref[:]          # (32, L) int32, row 31 = newest tap
    c_lo = coefs & 0xFF           # unsigned 8-bit limb
    c_hi = coefs >> 8             # signed 8-bit limb
    shifts = shifts_ref[0, :]     # (L,)
    orders = orders_ref[0, :]
    lengths = lengths_ref[0, :]

    def one(t, state, xt):
        """One recurrence step from the (32, L) state register."""
        s_lo = state & 0xFFFF
        s_hi = state >> 16
        b0 = jnp.sum(c_lo * s_lo, axis=0)
        b1 = jnp.sum(c_hi * s_lo, axis=0)
        b2 = jnp.sum(c_lo * s_hi, axis=0)
        b3 = jnp.sum(c_hi * s_hi, axis=0)
        # The shared exact recombination + arithmetic shift (ops.i64 is
        # plain jnp ops, so it traces inside the kernel): one definition
        # of the exactness-critical arithmetic for every backend.
        hi, lo = combine_buckets(b0, b1, b2, b3)
        pred = sar_low32(hi, lo, shifts)
        val = jnp.where(t >= orders, xt + pred, xt)
        val = jnp.where(t < lengths, val, 0)
        return jnp.concatenate([state[1:], val[None]], axis=0), val

    def group(j, state):
        """GROUP steps; one aligned (GROUP, L) load and store."""
        xs = x_ref[pl.ds(j * _GROUP, _GROUP), :]
        rows = []
        for r in range(_GROUP):
            state, val = one(g * CT + j * _GROUP + r, state, xs[r, :])
            rows.append(val)
        out_ref[pl.ds(j * _GROUP, _GROUP), :] = jnp.stack(rows, axis=0)
        return state

    state = jax.lax.fori_loop(0, CT // _GROUP, group, hist[:])
    hist[:] = state  # carry the last 32 outputs into the next chunk


@partial(jax.jit, static_argnames=("chunk", "lane_block"))
def synthesize_pallas(x, coefs, shifts, orders, lengths=None, chunk=256,
                      lane_block=2048):
    # lane_block bounds VMEM: the x/out blocks are (chunk, BL) int32 and
    # Mosaic buffers them on the scoped-VMEM stack; BL = 3456 with
    # chunk = 256 was measured to exceed the 16 MiB limit (large merged
    # corpora), BL <= 2048 leaves comfortable headroom. The lane grid
    # dimension is parallel, so more, smaller blocks cost nothing.
    """Drop-in equivalent of ``ops.predict.synthesize`` (same argument
    convention: x (L, T), coefs (L, 32) left-padded, shifts/orders (L,)).

    Grid: (lane blocks) x (time chunks); time is the inner, sequential
    dimension, so the history scratch carries the recurrence across time
    chunks and resets when a new lane block starts.
    """
    L, T = x.shape
    if L == 0:
        return x  # empty bucket: nothing to synthesize
    if lengths is None:
        lengths = jnp.full((L,), T, dtype=jnp.int32)
    lpad = (-L) % 128
    if lpad:
        x = jnp.pad(x, ((0, lpad), (0, 0)))
        coefs = jnp.pad(coefs, ((0, lpad), (0, 0)))
        shifts = jnp.pad(shifts, (0, lpad))
        orders = jnp.pad(orders, (0, lpad))
        lengths = jnp.pad(lengths, (0, lpad))
    Lp = L + lpad
    # Largest 128-multiple divisor of Lp that is <= lane_block: stepping
    # down by 128 from lane_block can degenerate to BL=128 for lane counts
    # like 4224 (= 33*128); searching the divisors of Lp//128 cannot.
    units = Lp // 128
    BL = 128 * max(d for d in range(1, min(lane_block // 128, units) + 1)
                   if units % d == 0)

    # CT must be a whole number of _GROUP-row stores.
    chunk = max(_GROUP, (chunk // _GROUP) * _GROUP)
    CT = min(chunk, max(_GROUP, ((T + _GROUP - 1) // _GROUP) * _GROUP))
    pad = (-T) % CT
    xt = jnp.pad(x, ((0, 0), (0, pad))).T      # (Tp, Lp) time-major
    Tp = T + pad

    out = pl.pallas_call(
        partial(_kernel, CT=CT),
        grid=(Lp // BL, Tp // CT),
        in_specs=[
            pl.BlockSpec((CT, BL), lambda lb, g: (g, lb)),          # x
            pl.BlockSpec((ORDER_MAX, BL), lambda lb, g: (0, lb)),   # coefs.T
            pl.BlockSpec((1, BL), lambda lb, g: (0, lb)),           # shifts
            pl.BlockSpec((1, BL), lambda lb, g: (0, lb)),           # orders
            pl.BlockSpec((1, BL), lambda lb, g: (0, lb)),           # lengths
        ],
        out_specs=pl.BlockSpec((CT, BL), lambda lb, g: (g, lb)),
        out_shape=jax.ShapeDtypeStruct((Tp, Lp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((ORDER_MAX, BL), jnp.int32)],
        interpret=jax.devices()[0].platform != "tpu",
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(xt, coefs.T, shifts[None, :], orders[None, :], lengths[None, :])
    return out.T[:L, :T]
