"""On-device frame demux: subframe headers + Rice code boundaries.

Round-3 companion of ``ops.segment``: segmentation recovers frame-header
positions on device; this kernel parses everything AFTER each header --
subframe headers, LPC parameters, warm-up samples, partition Rice
parameters, and the per-chunk code base positions -- so no host code ever
walks the payload bytes. Its outputs are exactly the per-lane descriptor
arrays the production entropy kernel (``ops.entropy.
decode_residual_bits_stream``) consumes, so a segmented decode is:

  device sync-scan (ops.segment)  ->  this walk  ->  entropy decode ->
  synthesis -> epilogue -> CRC-16   (all on device)

with the host reduced to header-field decode (a few bytes per frame) and
bucket planning.

The parse grammar mirrors the reference scalar decoder exactly (claxon
``src/subframe.rs:29-91,184-228,651-721``; our scalar oracle
``claxon_tpu/subframe.py`` and the C++ walker ``parse_subframe_bits`` in
``native/src/claxon_demux.cpp``). Lanes whose frames the device kernels
cannot represent -- escaped Rice partitions, > 64 partitions, an empty
first partition, codes over the 64-bit parse window, invalid headers --
come back ``ok=False``; the caller falls back to the host walk for those
streams, which reproduces the reference's exact error behavior.

Structure: the variable-length subframe headers, LPC parameters and
warm-up samples are parsed by straight-line masked vector code (a bounded
number of dependent reads); the residual section is walked by one
``lax.scan`` over the time axis -- each step advances EVERY lane's bit
cursor past one Rice code, so a bucket of L frames advances L codes per
step with no sequential dependence across lanes (the same
lanes-in-parallel trick as the in-chunk scan, ``ops/entropy.py:209-268``).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .entropy import _clz32

__all__ = ["walk_frames", "P_CAP"]

#: partition capacity (kPCap in claxon_demux.cpp); more falls back.
P_CAP = 64

#: fixed-predictor coefficients as order-aligned LPC rows
#: (coefs[32-order+k], claxon src/subframe.rs:524-583).
_FIXED_COEFS = np.zeros((5, 32), np.int32)
for _o, _c in enumerate(([], [1], [-1, 2], [1, -3, 3], [-1, 4, -6, 4])):
    _FIXED_COEFS[_o, 32 - _o:] = _c


def _u(x):
    return x.astype(jnp.uint32)


def _i(x):
    return x.astype(jnp.int32)


def _win64(stream, pos):
    """(hi, lo): the 64 stream bits starting at bit ``pos`` (clipped)."""
    W = stream.shape[0]
    wi = jnp.clip(pos >> 5, 0, W - 1)
    w0 = jnp.take(stream, wi)
    w1 = jnp.take(stream, jnp.minimum(wi + 1, W - 1))
    w2 = jnp.take(stream, jnp.minimum(wi + 2, W - 1))
    off = pos & 31
    sh = _u(jnp.where(off == 0, 1, 32 - off))
    hi = _i(_u(w0) << _u(off)) | jnp.where(off == 0, 0, _i(_u(w1) >> sh))
    lo = _i(_u(w1) << _u(off)) | jnp.where(off == 0, 0, _i(_u(w2) >> sh))
    return hi, lo


def _bits(hi, n):
    """Top ``n`` bits of the window as an unsigned value (n in [0, 32])."""
    return jnp.where(
        n == 0, 0, _i(_u(hi) >> _u(jnp.where(n == 0, 1, 32 - n))))


def _sext(v, n):
    """Sign-extend the n-bit value v (n >= 1)."""
    sbit = _i(_u(jnp.int32(1)) << _u(jnp.maximum(n - 1, 0)))
    return (v ^ sbit) - sbit


def _unary(hi, lo):
    """Leading-zero count of the 64-bit window (64 if all zero)."""
    return jnp.where(hi != 0, _clz32(hi), 32 + _clz32(lo))


def _walk_subframe(stream, pos, bs, ch_bps, T, NC):
    """Parse one subframe per lane starting at bit ``pos``.

    Returns (out, end, ok): ``out`` is a dict of per-lane descriptor
    arrays matching the C++ walker's BSUB fields plus ``bases``/``ks``/
    ``sa_words``; ``end`` the bit position after the subframe; ``ok``
    False where the parse failed or the frame is not device-representable.
    """
    F = pos.shape[0]
    zero = jnp.zeros(F, jnp.int32)
    ok = jnp.ones(F, bool)

    # --- subframe header: pad bit, 6-bit type, wasted-bits unary.
    hi, lo = _win64(stream, pos)
    ok &= _bits(hi, jnp.full(F, 1)) == 0
    ty = _bits(hi, jnp.full(F, 7)) & 63
    pos = pos + 7
    is_const = ty == 0
    is_verb = ty == 1
    is_fixed = (ty & 0b111000) == 0b001000
    f_ord = ty & 7
    is_lpc = ty >= 32
    order = jnp.where(is_const, 1,
                      jnp.where(is_fixed, f_ord,
                                jnp.where(is_lpc, (ty & 31) + 1, 0)))
    ok &= is_const | is_verb | (is_fixed & (f_ord <= 4)) | is_lpc

    hi, lo = _win64(stream, pos)
    wflag = _bits(hi, jnp.full(F, 1))
    pos = pos + 1
    hi, lo = _win64(stream, pos)
    z = _unary(hi, lo)
    wasted = jnp.where(wflag != 0, z + 1, 0)
    pos = pos + jnp.where(wflag != 0, z + 1, 0)
    ok &= wasted < ch_bps
    sf_bps = ch_bps - wasted
    ok &= sf_bps <= 32

    # --- warm-up samples (constant's value is its single warm-up;
    # C++ packs constants as order=1, warm[0]=v, coefs[31]=1).
    warm_order = jnp.where(is_verb, 0, jnp.minimum(order, 32))
    warm_cols = []
    for i in range(32):
        act = i < warm_order
        hi, lo = _win64(stream, pos)
        v = _sext(_bits(hi, sf_bps), sf_bps)
        warm_cols.append(jnp.where(act, v, 0))
        pos = pos + jnp.where(act, sf_bps, 0)
    warm = jnp.stack(warm_cols, axis=1)

    # --- LPC parameters.
    hi, lo = _win64(stream, pos)
    prec = _bits(hi, jnp.full(F, 4)) + 1
    ok &= ~is_lpc | (prec != 16)
    pos = pos + jnp.where(is_lpc, 4, 0)
    hi, lo = _win64(stream, pos)
    shift5 = _sext(_bits(hi, jnp.full(F, 5)), jnp.full(F, 5))
    ok &= ~is_lpc | (shift5 >= 0)
    pos = pos + jnp.where(is_lpc, 5, 0)
    coef_slots = [zero] * 32
    for i in range(32):
        act = is_lpc & (i < order)
        hi, lo = _win64(stream, pos)
        v = _sext(_bits(hi, jnp.where(act, prec, 1)), prec)
        coef_slots[31 - i] = jnp.where(act, v, 0)
        pos = pos + jnp.where(act, prec, 0)
    coefs = jnp.stack(coef_slots, axis=1)
    fixed_c = jnp.take(jnp.asarray(_FIXED_COEFS),
                       jnp.clip(f_ord, 0, 4), axis=0)
    coefs = jnp.where(is_fixed[:, None], fixed_c, coefs)
    coefs = coefs.at[:, 31].set(jnp.where(is_const, 1, coefs[:, 31]))
    shift = jnp.where(is_lpc, shift5, 0)

    # --- residual header (fixed/LPC lanes only).
    resd = is_fixed | is_lpc
    hi, lo = _win64(stream, pos)
    meth = _bits(hi, jnp.full(F, 2))
    ok &= ~resd | (meth <= 1)
    pos = pos + jnp.where(resd, 2, 0)
    hi, lo = _win64(stream, pos)
    po = _bits(hi, jnp.full(F, 4))
    pos = pos + jnp.where(resd, 4, 0)
    pbits = jnp.where(resd, 4 + meth, 0)
    n_parts = jnp.where(resd, _i(_u(jnp.int32(1)) << _u(po)), 1)
    ok &= ~resd | (n_parts <= P_CAP)
    ps = jnp.where(resd & (n_parts <= P_CAP),
                   _i(_u(bs) >> _u(po)), bs)
    ok &= ~resd | ((bs & (n_parts - 1)) == 0)
    # order > ps is a format error; order == ps (empty first partition)
    # is a kernel cap -- both leave the device path.
    ok &= ~resd | (order < jnp.maximum(ps, 1))

    # --- verbatim: uniform layout, no walk needed.
    verb_base0 = pos
    pos = pos + jnp.where(is_verb, bs * sf_bps, 0)

    # --- the residual walk: one code per lane per step.
    ps_s = jnp.maximum(ps, 1)
    resd_l = resd & ok

    def step(carry, t):
        cur, k, nb = carry
        active = resd_l & (t >= order) & (t < bs)
        first = active & (t == nb)
        base_emit = cur
        hi, lo = _win64(stream, cur)
        kr = _bits(hi, jnp.where(first, pbits, 1))
        escape = first & (kr == (_i(_u(jnp.int32(1)) << _u(pbits)) - 1))
        k_new = jnp.where(first, kr, k)
        cur2 = cur + jnp.where(first, pbits, 0)
        hi2, lo2 = _win64(stream, cur2)
        z = _unary(hi2, lo2)
        # Mirror the C++ cap: q + 1 + k (+ param bits on a partition's
        # first code) must fit the 64-bit parse window.
        bad = active & (escape |
                        (z > 63 - k_new - jnp.where(first, pbits, 0)))
        adv = z + 1 + k_new
        cur = jnp.where(active, cur2 + adv, cur)
        nb = jnp.where(first, jnp.where(t == order, ps_s, t + ps_s), nb)
        return (cur, k_new, nb), (base_emit, k_new, bad)

    nb0 = jnp.where(order > 0, order, 0)
    (end_res, _, _), (base_t, k_t, bad_t) = jax.lax.scan(
        step, (pos, zero, nb0), jnp.arange(T, dtype=jnp.int32))
    ok &= ~bad_t.any(axis=0)

    # Chunk bases: the cursor before the first code of each chunk
    # (pre-Rice-parameter, matching the C++ walker's ensure_chunk).
    c32 = jnp.arange(NC, dtype=jnp.int32)[None, :] * 32
    t_c = jnp.clip(jnp.maximum(c32, order[:, None]), 0, T - 1)
    bases = jnp.take_along_axis(base_t.T, t_c, axis=1)
    vb = verb_base0[:, None] + c32 * sf_bps[:, None]
    bases = jnp.where(is_verb[:, None], vb, bases)

    # Per-partition Rice parameters: k as read at each partition's first
    # code (column p of the scan's k emission).
    p_arr = jnp.arange(P_CAP, dtype=jnp.int32)[None, :]
    t_p = jnp.clip(jnp.where(p_arr == 0, order[:, None],
                             p_arr * ps_s[:, None]), 0, T - 1)
    ks = jnp.take_along_axis(k_t.T, t_p, axis=1)
    ks = jnp.where(p_arr < n_parts[:, None], ks, 0)
    ks = jnp.where(is_verb[:, None] & (p_arr == 0), sf_bps[:, None], ks)
    ks = jnp.where(is_const[:, None], 0, ks)

    end = jnp.where(is_verb | is_const, pos, end_res)

    # Max chunk bit span -> per-lane gather width for the decode kernel.
    ncl = (bs + 31) >> 5
    c_idx = jnp.arange(NC, dtype=jnp.int32)[None, :]
    nxt = jnp.where(c_idx + 1 < ncl[:, None],
                    jnp.concatenate([bases[:, 1:], bases[:, -1:]], axis=1),
                    end[:, None])
    span = jnp.where(c_idx < ncl[:, None], nxt - bases, 0)
    span_max = span.max(axis=1)
    sa_words = jnp.where(is_const, 0, (span_max >> 5) + 2)
    # Mirror the C++ walker's slot-class cap (kSClasses tops out at 64
    # words/chunk): denser chunks take the sample path there, so they
    # must leave the device path here too for rejection parity.
    ok &= is_const | (span_max <= 64 * 32)

    out = {
        "order": jnp.where(is_verb, 0, order),
        "shift": shift,
        "wasted": wasted,
        "n_parts": n_parts,
        "ps": ps,
        "pbits": pbits,
        "flags": jnp.where(is_const, 2, jnp.where(is_verb, 1, 0)),
        "warm": warm,
        "coefs": coefs,
        "ks": ks,
        "bases": bases,
        "sa_words": sa_words,
    }
    return out, end, ok


@partial(jax.jit, static_argnames=("T", "nch"))
def walk_frames(stream, start_bits, bs, modes, bps0, T, nch):
    """Walk every frame's subframes on device.

    Args:
      stream:     (W,) int32 big-endian-packed stream upload.
      start_bits: (F,) int32 bit position of each frame's first subframe
                  (just past the header CRC-8 byte).
      bs:         (F,) int32 block sizes (padding lanes: 0).
      modes:      (F,) int32 channel assignment (0 indep, 1 LS, 2 RS,
                  3 MS -- ops.epilogue MODE_* codes).
      bps0:       (F,) int32 base bits per sample from the header.
      T, nch:     static block-size bucket and channel count.

    Returns:
      (out, end_bits, ok): ``out`` maps descriptor names to (F*nch, ...)
      arrays in the pipeline's frame-major lane order; ``end_bits`` (F,)
      is each frame's byte-aligned end bit (CRC-16 bytes not included);
      ``ok`` (F,) is False where any subframe failed or the frame is not
      device-representable.
    """
    NC = (T + 31) // 32
    pos = start_bits
    ok = (bs >= 1) & (bs <= T)
    chans = []
    for ch in range(nch):
        # Stereo decorrelation: the side channel carries one extra bit
        # (mode 1 LS / 3 MS -> ch1; mode 2 RS -> ch0).
        if nch == 2:
            side = jnp.where(
                jnp.asarray(ch == 1) & ((modes == 1) | (modes == 3))
                | jnp.asarray(ch == 0) & (modes == 2), 1, 0)
        else:
            side = 0
        out, end, ok_c = _walk_subframe(stream, pos, bs, bps0 + side,
                                        T, NC)
        chans.append(out)
        pos = end
        ok &= ok_c
    end_bits = (pos + 7) & ~7
    merged = {}
    for key in chans[0]:
        stacked = jnp.stack([c[key] for c in chans], axis=1)
        merged[key] = stacked.reshape(
            (stacked.shape[0] * nch,) + stacked.shape[2:])
    return merged, end_bits, ok
