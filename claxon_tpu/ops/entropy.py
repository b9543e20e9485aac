"""Gather-free, scan-free batched Rice decoding on device.

The production entropy decoder of the bits pipeline (the counterpart of the
reference's hot loop, claxon `src/subframe.rs:309-351`). The host's
boundary-only scan (native ``walk_stream_bits``) ships, per subframe lane:

* ``deltas`` -- one byte per sample: the end-to-end bit distance from the
  previous code's end (unary + terminator + remainder, plus the Rice
  parameter before a partition's first code); 0 at warm-up positions;
* ``slots`` -- the raw residual-section bits re-sliced so that the codes of
  each 32-sample chunk start word-aligned in a fixed-stride slot of
  ``SA = s_class + 1`` int32 words;
* ``ks`` -- the Rice parameter of each partition.

Those three make every sample independently decodable, so the whole batch
decodes in ONE vectorized pass -- no sequential bit cursor (the reference's
fundamental constraint), no data-dependent gather (slow on TPU: measured
~90 Melem/s for XLA gathers vs multi-Gelem/s for the one-hot selects used
here):

  end[t]    = cumulative deltas         (one log-depth cumsum)
  k[t]      = ks[partition(t)]          (one-hot over <= P partitions)
  q[t]      = delta - 1 - k - pbits*[t is a partition's first code]
  rem[t]    = the k bits ending at end[t], read from the sample's chunk
              slot via a one-hot select over SA words
  value     = zigzag((q << k) | rem)    (u32-wrapping, like the reference)

Verbatim subframes ride the same layout with delta = k = the subframe's
bit depth; their field sign-extends instead of zigzag-decoding
(`src/subframe.rs:396-415`).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["decode_residual_bits", "decode_residual_bits_stream",
           "decode_residual_bits_stream_delta",
           "decode_residual_bits_reference",
           "decode_residual_bits_stream_reference"]


def _u(x):
    return x.astype(jnp.uint32)


def _i(x):
    return x.astype(jnp.int32)


@partial(jax.jit, static_argnames=("n_parts_max", "sa"))
def decode_residual_bits(slots, deltas, ks, ps, orders, pbits, vflags, warm,
                         n_parts_max=1, sa=None):
    """Reconstruct the (L, T) subframe input (warm-up ++ residuals).

    Args:
      slots:  (L, NC, SA) int32 chunk-slotted residual bits (MSB-first:
              slot bit i of a chunk is word i>>5, bit 31-(i&31)), or the
              flat (L, NC*SA) form with ``sa=SA`` -- callers ship the flat
              form: a minor dimension of SA would be padded to the TPU's
              128-lane tile on transfer, inflating the upload ~128/SA x.
      deltas: (L, T) uint8/int32 per-sample bit gaps, T == NC * 32.
      ks:     (L, P) int32 per-partition Rice parameters, P >= n_parts_max.
      ps:     (L,) int32 samples per partition (block_size >> order).
      orders: (L,) int32 predictor orders.
      pbits:  (L,) int32 Rice parameter width (4 or 5; 0 for verbatim).
      vflags: (L,) int32 1 for verbatim lanes (sign-extend, no zigzag).
      warm:   (L, 32) int32 warm-up sample values.
      n_parts_max: static partition count bound for the one-hot expansion.

    Returns:
      (L, T) int32: warm-up values at t < order, decoded residuals after,
      zeros where deltas == 0 (padding).
    """
    if slots.ndim == 2:
        L = slots.shape[0]
        SA = sa
        NC = slots.shape[1] // SA
        slots = slots.reshape(L, NC, SA)
    else:
        L, NC, SA = slots.shape
    T = NC * 32
    d = deltas.astype(jnp.int32)
    t = jnp.arange(T, dtype=jnp.int32)[None, :]

    # Partition index + per-sample k (one-hot over the static bound).
    ps_b = ps[:, None]
    if n_parts_max > 1:
        p = jnp.zeros((L, T), dtype=jnp.int32)
        for j in range(1, n_parts_max):
            p = p + _i(t >= j * ps_b)
        k = jnp.zeros((L, T), dtype=jnp.int32)
        for j in range(n_parts_max):
            k = jnp.where(p == j, ks[:, j][:, None], k)
    else:
        p = jnp.zeros((L, T), dtype=jnp.int32)
        k = jnp.broadcast_to(ks[:, 0][:, None], (L, T))

    # A partition's first code also spans the parameter bits.
    first = t == jnp.where(p == 0, orders[:, None], p * ps_b)
    q = d - 1 - k - jnp.where(first, pbits[:, None], 0)

    # Bit offset of each code's end within its chunk slot.
    o = jnp.cumsum(d, axis=1) - d
    o3 = o.reshape(L, NC, 32)
    ol = (o3 - o3[:, :, :1]).reshape(L, T)
    rpos = ol + d - k  # the remainder's first bit

    # 32-bit window at rpos via one-hot selects over the slot words.
    wi = jnp.clip(rpos >> 5, 0, SA - 1).reshape(L, NC, 32)
    off = (rpos & 31).reshape(L, NC, 32)
    w0 = jnp.zeros((L, NC, 32), dtype=jnp.int32)
    w1 = jnp.zeros((L, NC, 32), dtype=jnp.int32)
    for j in range(SA):
        col = slots[:, :, j][:, :, None]
        w0 = jnp.where(wi == j, col, w0)
        if j + 1 < SA:
            w1 = jnp.where(wi == j, slots[:, :, j + 1][:, :, None], w1)
    w0 = w0.reshape(L, T)
    w1 = w1.reshape(L, T)
    off = off.reshape(L, T)
    win = _i(_u(w0) << _u(off)) | jnp.where(
        off == 0, 0, _i(_u(w1) >> _u(jnp.where(off == 0, 1, 32 - off))))
    r = jnp.where(k == 0, 0,
                  _i(_u(win) >> _u(jnp.where(k == 0, 1, 32 - k))))

    # Rice: u32-wrapping (q << k) | r, then zig-zag to signed.
    v = _i((_u(q) << _u(jnp.minimum(k, 31))) | _u(r))
    rice = jnp.where(v & 1, _i(~(_u(v) >> 1)), _i(_u(v) >> 1))
    # Verbatim: sign-extend the k-bit field.
    sbit = _i(_u(jnp.int32(1)) << _u(jnp.maximum(k - 1, 0)))
    verb = (r ^ sbit) - sbit
    res = jnp.where(vflags[:, None] != 0, verb, rice)

    warm_t = jnp.pad(warm, ((0, 0), (0, T - warm.shape[1])))
    return jnp.where(t < orders[:, None], warm_t,
                     jnp.where(d > 0, res, 0))


def _clz32(x):
    """Count leading zeros of int32 lanes (32 for zero); SWAR popcount."""
    v = _u(x)
    v = v | (v >> 1)
    v = v | (v >> 2)
    v = v | (v >> 4)
    v = v | (v >> 8)
    v = v | (v >> 16)
    v = v - ((v >> 1) & 0x55555555)
    v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
    v = (v + (v >> 4)) & 0x0F0F0F0F
    return 32 - ((v * 0x01010101) >> 24).astype(jnp.int32)


@partial(jax.jit,
         static_argnames=("n_parts_max", "sa", "chunk"))
def decode_residual_bits_stream(stream, bases, ks, ps, orders, pbits, flags,
                                warm, lengths, n_parts_max=1, sa=8,
                                chunk=32):
    """Stream-gather entropy decode: the minimal-uplink production kernel.

    Instead of host-relocated slots, the raw frame-section words cross the
    link ONCE (at the compressed stream's ~1.2 bytes/sample -- the uplink
    floor) and each 32-sample chunk's words are gathered on device from
    its base bit position. Codes are then parsed by an in-chunk
    ``lax.scan`` -- 32 sequential steps, each decoding one code per
    (lane, chunk) element, so the whole batch still advances
    lanes x chunks codes per step. The host guarantees every code
    (with its Rice parameter) fits a 64-bit window (walk_stream_bits caps
    q + 1 + k + pbits <= 64; larger codes take the sample path).

    Args:
      stream:  (W,) int32 big-endian-packed bits of the frame sections.
      bases:   (L, NC) int32 absolute bit position of each chunk's first
               code (including the Rice parameter when the chunk opens a
               partition). Padding rows/columns: any value (masked).
      ks:      (L, P) int32 per-partition Rice parameters.
      ps:      (L,) samples per partition; orders: (L,) predictor orders;
      pbits:   (L,) Rice parameter width; flags: (L,) bit0 verbatim, bit1
               no-residual-codes; warm: (L, 32); lengths: (L,) block size.
      sa:      static words gathered per chunk (>= the bucket's slot class
               + 1 for the word-alignment slack).
      chunk:   static samples per chunk (32, matching walk_stream_bits).

    Returns:
      (L, NC*chunk) int32 -- warm-up ++ residuals, zeros at padding.
    """
    L, NC = bases.shape
    T = NC * chunk
    W = stream.shape[0]

    # Gather chunk words straight from the stream, laid out (SA, NC, L) so
    # every per-step operand keeps L as the (TPU-native) minor dimension.
    wi0 = bases >> 5
    idx = (wi0.T[None, :, :] +
           jnp.arange(sa, dtype=jnp.int32)[:, None, None])
    slots = jnp.take(stream, jnp.clip(idx, 0, W - 1), axis=0)
    cursor0 = (bases & 31).T  # (NC, L)

    c_col = jnp.arange(NC, dtype=jnp.int32)[:, None]  # (NC, 1)
    order_b = orders[None, :]
    ps_b = jnp.maximum(ps, 1)[None, :]
    k_rows = [ks[:, j][None, :] for j in range(n_parts_max)]
    pb_b = pbits[None, :]
    verb = (flags[None, :] & 1) != 0
    has_codes = (flags[None, :] & 2) == 0
    len_b = lengths[None, :]

    def step(cursor, j):
        t = c_col * chunk + j  # (NC, 1) broadcasting against (NC, L)
        active = (t >= order_b) & (t < len_b) & has_codes
        if n_parts_max > 1:
            p = jnp.zeros((NC, L), dtype=jnp.int32)
            for m in range(1, n_parts_max):
                p = p + _i(t >= m * ps_b)
            k = k_rows[0] + jnp.zeros((NC, L), dtype=jnp.int32)
            for m in range(1, n_parts_max):
                k = jnp.where(p == m, k_rows[m], k)
        else:
            p = jnp.zeros((NC, L), dtype=jnp.int32)
            k = k_rows[0] + jnp.zeros((NC, L), dtype=jnp.int32)
        first = t == jnp.where(p == 0, order_b, p * ps_b)
        pos = cursor + jnp.where(first & ~verb, pb_b, 0)

        wi = jnp.clip(pos >> 5, 0, sa - 1)
        off = pos & 31
        w0 = jnp.zeros((NC, L), dtype=jnp.int32)
        w1 = jnp.zeros((NC, L), dtype=jnp.int32)
        w2 = jnp.zeros((NC, L), dtype=jnp.int32)
        for jj in range(sa):
            s_j = slots[jj]
            w0 = jnp.where(wi == jj, s_j, w0)
            if jj >= 1:
                w1 = jnp.where(wi == jj - 1, s_j, w1)
            if jj >= 2:
                w2 = jnp.where(wi == jj - 2, s_j, w2)

        sh = _u(jnp.where(off == 0, 1, 32 - off))
        hi = _i(_u(w0) << _u(off)) | jnp.where(off == 0, 0, _i(_u(w1) >> sh))
        lo = _i(_u(w1) << _u(off)) | jnp.where(off == 0, 0, _i(_u(w2) >> sh))

        # Rice: quotient = leading zeros of the 64-bit window.
        z = jnp.where(hi != 0, _clz32(hi), 32 + _clz32(lo))
        s1 = z + 1  # in [1, 64]
        rhi = jnp.where(
            s1 < 32,
            _i(_u(hi) << _u(jnp.minimum(s1, 31))) |
            _i(_u(lo) >> _u(jnp.clip(32 - s1, 1, 31))),
            _i(_u(lo) << _u(jnp.clip(s1 - 32, 0, 31))))
        r = jnp.where(k == 0, 0,
                      _i(_u(rhi) >> _u(jnp.where(k == 0, 1, 32 - k))))
        v = _i((_u(z) << _u(k)) | _u(r))
        rice = jnp.where(v & 1, _i(~(_u(v) >> 1)), _i(_u(v) >> 1))

        # Verbatim: sign-extend the k-bit field at the window start.
        rv = jnp.where(k == 0, 0,
                       _i(_u(hi) >> _u(jnp.where(k == 0, 1, 32 - k))))
        sbit = _i(_u(jnp.int32(1)) << _u(jnp.maximum(k - 1, 0)))
        vb = (rv ^ sbit) - sbit

        res = jnp.where(verb, vb, rice)
        adv = jnp.where(verb, k, s1 + k)
        cursor = jnp.where(active, pos + adv, cursor)
        return cursor, jnp.where(active, res, 0)

    # unroll=4: ~6% on a real chip (32 sequential steps are compute-bound,
    # so deeper unrolling only bloats the program; 32x measured slower).
    _, ys = jax.lax.scan(step, cursor0, jnp.arange(chunk, dtype=jnp.int32),
                         unroll=4)
    x = ys.transpose(2, 1, 0).reshape(L, T)

    t = jnp.arange(T, dtype=jnp.int32)[None, :]
    warm_t = jnp.pad(warm, ((0, 0), (0, T - warm.shape[1])))
    return jnp.where(t < orders[:, None], warm_t, x)


@partial(jax.jit, static_argnames=("n_parts_max", "sa", "chunk"))
def decode_residual_bits_stream_delta(stream, bases, deltas, ks, ps,
                                      orders, pbits, flags, warm, lengths,
                                      n_parts_max=1, sa=8, chunk=32):
    """Single-pass segmented entropy decode fed by the walk's deltas.

    The segmented path's production kernel: the on-device walk
    (ops.demux) already advances code by code to find every Rice
    boundary, so re-locating them here with the 32-step in-chunk scan of
    ``decode_residual_bits_stream`` pays the boundary discovery twice
    per sample. This kernel instead consumes the walk's per-code bit
    advances (``deltas``, HBM-resident -- they never cross the link) and
    decodes every sample INDEPENDENTLY: one in-chunk exclusive cumsum
    turns deltas into code end offsets, and a one-hot select over each
    chunk's gathered stream words reads the quotient-free remainder --
    no sequential dependence anywhere. The quotient itself is implied:
    q = delta - 1 - k - pbits*[partition-first], exactly the
    ``decode_residual_bits`` delta semantics (module docstring).

    Verbatim lanes synthesize deltas = bit depth on the fly (the walk
    does not step through verbatim fields; their chunk bases are
    closed-form), and constant lanes carry no codes.

    Args match ``decode_residual_bits_stream`` plus:
      deltas: (L, NC*chunk) int8 per-sample bit advances (0 at warm-up
              and padding positions; includes the Rice parameter width
              at each partition's first code).

    Reference parity: the one-pass hot loop `src/subframe.rs:309-351`
    split into walk (boundaries) + this (values), u32-wrapping like
    `src/subframe.rs:156-170`.
    """
    L, NC = bases.shape
    T = NC * chunk
    W = stream.shape[0]
    t = jnp.arange(T, dtype=jnp.int32)[None, :]

    verb = (flags[:, None] & 1) != 0
    has_codes = (flags[:, None] & 2) == 0
    ps_b = jnp.maximum(ps, 1)[:, None]

    # Partition index + per-sample k (one-hot over the static bound).
    if n_parts_max > 1:
        p = jnp.zeros((L, T), dtype=jnp.int32)
        for j in range(1, n_parts_max):
            p = p + _i(t >= j * ps_b)
        k = jnp.zeros((L, T), dtype=jnp.int32)
        for j in range(n_parts_max):
            k = jnp.where(p == j, ks[:, j][:, None], k)
    else:
        p = jnp.zeros((L, T), dtype=jnp.int32)
        k = jnp.broadcast_to(ks[:, 0][:, None], (L, T))

    act = (t >= orders[:, None]) & (t < lengths[:, None]) & has_codes
    d = jnp.where(verb, jnp.where(act, k, 0), deltas.astype(jnp.int32))

    # A partition's first code also spans the parameter bits.
    first = t == jnp.where(p == 0, orders[:, None], p * ps_b)
    q = d - 1 - k - jnp.where(first, pbits[:, None], 0)

    # In-chunk exclusive cumsum -> each code's end offset from the
    # chunk's base bit; the remainder's first bit is end - k.
    d3 = d.reshape(L, NC, chunk)
    ol3 = jnp.cumsum(d3, axis=2) - d3
    rpos = (bases & 31)[:, :, None] + ol3 + d3 - k.reshape(L, NC, chunk)

    # Gather each chunk's words straight from the stream (same gather as
    # the scan kernel; the host's SA class covers base slack + max span).
    wi0 = bases >> 5
    idx = wi0[:, :, None] + jnp.arange(sa, dtype=jnp.int32)[None, None, :]
    slots = jnp.take(stream, jnp.clip(idx, 0, W - 1), axis=0)

    # 32-bit window at rpos via one-hot selects over the slot words.
    wi = jnp.clip(rpos >> 5, 0, sa - 1)
    off = rpos & 31
    w0 = jnp.zeros((L, NC, chunk), dtype=jnp.int32)
    w1 = jnp.zeros((L, NC, chunk), dtype=jnp.int32)
    for j in range(sa):
        col = slots[:, :, j][:, :, None]
        w0 = jnp.where(wi == j, col, w0)
        if j + 1 < sa:
            w1 = jnp.where(wi == j, slots[:, :, j + 1][:, :, None], w1)
    w0 = w0.reshape(L, T)
    w1 = w1.reshape(L, T)
    off = off.reshape(L, T)
    win = _i(_u(w0) << _u(off)) | jnp.where(
        off == 0, 0, _i(_u(w1) >> _u(jnp.where(off == 0, 1, 32 - off))))
    r = jnp.where(k == 0, 0,
                  _i(_u(win) >> _u(jnp.where(k == 0, 1, 32 - k))))

    # Rice: u32-wrapping (q << k) | r, then zig-zag to signed.
    v = _i((_u(q) << _u(jnp.minimum(k, 31))) | _u(r))
    rice = jnp.where(v & 1, _i(~(_u(v) >> 1)), _i(_u(v) >> 1))
    # Verbatim: sign-extend the k-bit field.
    sbit = _i(_u(jnp.int32(1)) << _u(jnp.maximum(k - 1, 0)))
    vb = (r ^ sbit) - sbit
    res = jnp.where(verb, vb, rice)

    warm_t = jnp.pad(warm, ((0, 0), (0, T - warm.shape[1])))
    return jnp.where(t < orders[:, None], warm_t,
                     jnp.where(d > 0, res, 0))


def decode_residual_bits_stream_reference(stream, bases, ks, ps, orders,
                                          pbits, flags, warm, lengths,
                                          n_parts_max=1, chunk=32):
    """Pure-Python oracle of the stream-gather kernel, for tests."""
    stream = np.asarray(stream).view(np.uint32)

    def bit(i):
        return (int(stream[i >> 5]) >> (31 - (i & 31))) & 1

    def read(pos, n):
        v = 0
        for j in range(n):
            v = (v << 1) | bit(pos + j)
        return v

    L, NC = np.asarray(bases).shape
    T = NC * chunk
    out = np.zeros((L, T), dtype=np.int32)
    for l in range(L):
        if flags[l] & 2:
            pass  # constant: no codes
        elif lengths[l]:
            for c in range(NC):
                cur = int(bases[l, c])
                for j in range(chunk):
                    t = c * chunk + j
                    if t < orders[l] or t >= lengths[l]:
                        continue
                    p = min(t // max(int(ps[l]), 1), n_parts_max - 1)
                    k = int(ks[l, p])
                    first = t == (int(orders[l]) if p == 0
                                  else p * int(ps[l]))
                    if flags[l] & 1:  # verbatim
                        r = read(cur, k)
                        out[l, t] = r - (1 << k) if r >= (1 << (k - 1)) \
                            else r
                        cur += k
                        continue
                    if first:
                        cur += int(pbits[l])
                    z = 0
                    while not bit(cur + z):
                        z += 1
                    r = read(cur + z + 1, k) if k else 0
                    v = ((z << k) | r) & 0xFFFFFFFF
                    out[l, t] = np.int32(np.uint32(
                        ~(v >> 1) & 0xFFFFFFFF if v & 1 else v >> 1))
                    cur += z + 1 + k
        for t in range(min(int(orders[l]), T)):
            out[l, t] = warm[l, t]
    return out


def decode_residual_bits_reference(slots, deltas, ks, ps, orders, pbits,
                                   vflags, warm, n_parts_max=1):
    """Pure-numpy oracle with identical semantics, for kernel tests."""
    slots = np.asarray(slots).view(np.uint32)
    L, NC, SA = slots.shape
    T = NC * 32
    out = np.zeros((L, T), dtype=np.int32)
    for l in range(L):
        d = np.asarray(deltas[l], dtype=np.int64)
        o = np.cumsum(d) - d
        for t in range(T):
            if t < orders[l]:
                out[l, t] = warm[l, t]
                continue
            if d[t] == 0:
                continue
            p = min(t // int(ps[l]), int(n_parts_max) - 1) if ps[l] else 0
            k = int(ks[l, p])
            first = t == (int(orders[l]) if p == 0 else p * int(ps[l]))
            q = int(d[t]) - 1 - k - (int(pbits[l]) if first else 0)
            base = o[(t >> 5) << 5]
            rpos = int(o[t] - base + d[t] - k)
            r = 0
            for j in range(k):
                bit_i = rpos + j
                w = int(slots[l, t >> 5, min(bit_i >> 5, SA - 1)])
                r = (r << 1) | ((w >> (31 - (bit_i & 31))) & 1)
            if vflags[l]:
                out[l, t] = r - (1 << k) if k and r >= (1 << (k - 1)) else r
            else:
                v = ((q << k) | r) & 0xFFFFFFFF
                out[l, t] = np.int32(np.uint32(~(v >> 1) & 0xFFFFFFFF)
                                     if v & 1 else np.uint32(v >> 1))
    return out
