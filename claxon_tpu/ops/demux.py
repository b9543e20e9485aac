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
first partition, codes over the walk's 32-bit parse window, invalid
headers -- come back ``ok=False``; the caller falls back to the host
walk for those streams, which reproduces the reference's exact error
behavior.

Structure (round-4 rework; the round-3 walk advanced ONE code per lane
per scan step with whole-stream gathers -- a T-step sequential chain
that cost ~20x the decode it fed):

* The subframe header is a short dependent chain of masked window reads
  (3 reads), after which every warm-up sample's and LPC coefficient's
  bit position is CLOSED-FORM (pos0 + i * width) -- so all 64 of those
  fields are read in two batched, dependency-free vector passes over one
  per-lane parameter slab fetched ONCE per subframe.
* The residual section is walked by a ``lax.scan`` over the NC = T/32
  chunks; each step fetches one contiguous per-lane slab (the accepted
  chunk-span cap keeps it static) and advances 32 codes with unrolled
  in-register window reads. This is the same local-slab + in-chunk-scan
  trick as the production entropy kernel (``ops/entropy.py:209-268``),
  and cuts the sequential gather chain from T to NC steps.
* Within a chunk the window is a two-word SHIFT REGISTER: codes are
  capped at 32 bits (measured: the cap halves the walk's op count --
  advancing by <= 32 bits moves the word cursor by <= 1, so each code
  costs one register shift plus ONE one-hot slab refill, instead of
  re-selecting a 3-word window from the slab per code). Frames with a
  longer code -- or whose partition parameter pushes one past 32 bits --
  come back ``ok=False`` and take the host walk, which decodes them at
  full speed with the 64-bit C++ window (its cap: ``max_q`` in
  ``claxon_demux.cpp`` ``scan_residual_bits``). The device ``ok`` set is
  therefore a SUBSET of the native walker's bits-path set; every
  descriptor on an ok lane still matches the C++ walker exactly.
"""

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .entropy import _clz32

__all__ = ["walk_frames", "P_CAP"]

#: partition capacity (kPCap in claxon_demux.cpp); more falls back.
P_CAP = 64

#: parameter-slab words per subframe: header (<= 40 bits) + warm-up
#: (<= 32 x 32 bits) + LPC precision/shift/coefficients (<= 489 bits) +
#: residual header (6 bits) + 31 bits alignment < 52 x 32.
H_WORDS = 52

#: residual-slab words per chunk: 32 codes x <= 32 bits each (the walk
#: rejects larger codes; see module docstring) + the slab-alignment slack
#: (<= 31 bits + 7 words of row alignment = 8 words) + a 2-word lookahead
#: for the shift-register window.
R_WORDS = 42

#: fixed-predictor coefficients as order-aligned LPC rows
#: (coefs[32-order+k], claxon src/subframe.rs:524-583).
_FIXED_COEFS = np.zeros((5, 32), np.int32)
for _o, _c in enumerate(([], [1], [-1, 2], [1, -3, 3], [-1, 4, -6, 4])):
    _FIXED_COEFS[_o, 32 - _o:] = _c


def _u(x):
    return x.astype(jnp.uint32)


def _i(x):
    return x.astype(jnp.int32)


#: slab gather style: "rows" fetches G-word block rows from the stream
#: reshaped (W/G, G) -- measured 1.8 Gelem/s on a v5e, 16x the
#: elementwise-take rate (tools/walk_bench.py; vmap(dynamic_slice)
#: measured SLOWER than take, 39-58 Melem/s, and is not offered).
#: "take" is the plain elementwise gather, kept for A/B measurement.
_SLAB_STYLE = os.environ.get("CLAXON_TPU_SLAB_GATHER", "rows")

#: row-gather block width. Wide rows are the whole game: the take cost
#: is per ROW, nearly independent of width (measured 64 us/step at G=8
#: vs 6.6 us/step at G=32 for the same slab, tools/walk_bench.py), so
#: the gather fetches 32-word rows and a cheap fan-4 select re-bases the
#: slab to an 8-word boundary (_SUB) before callers see it. That keeps
#: the caller-visible slack -- and with it the per-code one-hot refill
#: fan, the walk's dominant per-code cost -- at the old G=8 value.
_G = 32
_GSH = _G.bit_length() - 1
#: sub-alignment granularity exposed to callers: slabs start at the
#: enclosing _SUB-word boundary, so a requested word is at most _SLACK
#: words into the slab.
_SUB = 8
_SLACK = _SUB - 1 if _SLAB_STYLE == "rows" else 0


#: maximum block rows any _slab call needs (sizes the shared padding).
_NR_MAX = -(-(max(H_WORDS, R_WORDS) + _G - 1) // _G)


def _blocked(stream):
    """(sb, wb0): the stream padded + reshaped to (rows, _G) block rows.

    Computed ONCE per walk and threaded into every slab fetch: built
    inside the chunk scan, XLA re-pads the whole stream EVERY step
    (measured 406 us/step vs 71 with the pad hoisted -- the fixed cost
    that dominated the round-3 walk; tools/scan_skeleton_bench2.py).
    """
    W = stream.shape[0]
    wb0 = -(-W // _G)
    padded = jnp.pad(stream, (0, (wb0 + _NR_MAX) * _G - W))
    return padded.reshape(-1, _G), wb0


def _slab(src, word0, n):
    """Per-lane slab of >= n contiguous stream words from ``word0``.

    ``src``: (stream, sb, wb0) from ``_blocked``. Returns (slab, base):
    slab (n + _SLACK, F) word-major with F minor, base (F,) the stream
    word index of slab row 0 (<= word0, within ``_SLACK`` words). Reads
    past the stream end return zeros (rows style) or the last word
    (take style) -- only lanes whose codes overran the stream see them,
    and those frames never pass the host's chain validation.
    """
    stream, sb, wb0 = src
    W = stream.shape[0]
    if _SLAB_STYLE == "take":
        base = jnp.clip(word0, 0, W - 1)
        idx = base[None, :] + jnp.arange(n, dtype=jnp.int32)[:, None]
        return jnp.take(stream, jnp.clip(idx, 0, W - 1), axis=0), base
    # Wide-row gather: ceil((n + _G - 1) / _G) rows of _G words cover the
    # _SUB-aligned window of n + _SLACK words wherever it starts inside
    # the first row.
    nr = -(-(n + _G - 1) // _G)
    block = jnp.clip(word0 >> _GSH, 0, wb0)  # past-end lanes read zeros
    idx = block[None, :] + jnp.arange(nr, dtype=jnp.int32)[:, None]
    rows = jnp.take(sb, idx, axis=0)        # (nr, F, G)
    wide = rows.transpose(0, 2, 1).reshape(nr * _G, -1)
    # Re-base to the enclosing _SUB-word boundary: fan-4 select among the
    # four _SUB-aligned views of the wide slab (once per slab fetch --
    # NOT per code, unlike the refill one-hot whose fan this keeps small).
    sub = jnp.clip((word0 >> 3) - (block << 2), 0, _G // _SUB - 1)
    nwin = n + _SLACK
    slab = jnp.where(sub == 0, wide[:nwin], wide[_SUB:_SUB + nwin])
    for q in range(2, _G // _SUB):
        slab = jnp.where(sub == q, wide[q * _SUB:q * _SUB + nwin], slab)
    return slab, ((block << 2) + sub) << 3


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


def _combine(w0, w1, off):
    """32-bit window at bit offset ``off`` of the (w0, w1) word pair."""
    sh = _u(jnp.where(off == 0, 1, 32 - off))
    return _i(_u(w0) << _u(off)) | jnp.where(off == 0, 0, _i(_u(w1) >> sh))


def _sel_row(slab, wi, lo, hi):
    """slab[wi] per lane, one-hot over the static row range [lo, hi).

    Written as a masked SUM, not a sequential where-chain: exactly one
    row matches, and the sum reduces in log depth -- the walk is
    latency-bound on its per-code dependency chain, so select depth is
    what the whole kernel's wall clock scales with.
    """
    hi = min(hi, slab.shape[0])
    lo = max(lo, 0)
    rows = jnp.arange(lo, hi, dtype=jnp.int32)
    m = wi[None, :] == rows[:, None]
    return jnp.where(m, slab[lo:hi], 0).sum(axis=0)


def _read64(slab, rel, lim):
    """(hi, lo): the 64 slab bits starting at bit ``rel``.

    ``lim``: static bound on the word index touched (wi + 2 < lim); the
    callers derive it from how many bits can precede the read, so the
    one-hot select only scans the reachable slab prefix.
    """
    n = slab.shape[0]
    lim = min(lim, n)
    wi = jnp.clip(rel >> 5, 0, n - 1)
    off = rel & 31
    w0 = _sel_row(slab, wi, 0, lim)
    w1 = _sel_row(slab, wi + 1, 1, lim + 1)
    w2 = _sel_row(slab, wi + 2, 2, lim + 2)
    hi = _combine(w0, w1, off)
    lo = _combine(w1, w2, off)
    return hi, lo


def _read_fields32(slab, rel, lim):
    """Batched 32-bit windows at the (F, K) bit offsets ``rel``.

    All positions are independent (closed-form), so this is one vector
    pass: a one-hot select of each position's word pair over the slab
    prefix ``lim``, no sequential dependence.
    """
    n = slab.shape[0]
    lim = min(lim, n)
    wi = jnp.clip(rel >> 5, 0, n - 1)
    off = rel & 31
    rows = jnp.arange(lim, dtype=jnp.int32)[:, None, None]
    sl = slab[:lim, :, None]
    w0 = jnp.where(wi[None] == rows, sl, 0).sum(axis=0)
    w1 = jnp.where(wi[None] == rows - 1, sl, 0).sum(axis=0)
    return _combine(w0, w1, off)


def _walk_subframe(src, pos, bs, ch_bps, T, NC):
    """Parse one subframe per lane starting at bit ``pos``.

    Returns (out, end, ok): ``out`` is a dict of per-lane descriptor
    arrays matching the C++ walker's BSUB fields plus ``bases``/``ks``/
    ``sa_words``; ``end`` the bit position after the subframe; ``ok``
    False where the parse failed or the frame is not device-representable.
    """
    F = pos.shape[0]
    zero = jnp.zeros(F, jnp.int32)
    ok = jnp.ones(F, bool)

    # ---- parameter slab: every header/warm-up/coefficient bit of one
    # subframe lives within H_WORDS of its start (bounds in the constant's
    # comment), so ONE contiguous fetch serves the whole parse.
    hslab, hbase = _slab(src, pos >> 5, H_WORDS)
    rel = pos - (hbase << 5)  # in [0, 31 + 32 * _SLACK]

    # --- subframe header: pad bit, 6-bit type, wasted-bits flag+unary.
    hi, _ = _read64(hslab, rel, 4 + _SLACK)
    ok &= _bits(hi, jnp.full(F, 1)) == 0
    ty = _bits(hi, jnp.full(F, 7)) & 63
    wflag = _bits(hi, jnp.full(F, 8)) & 1
    rel = rel + 8
    is_const = ty == 0
    is_verb = ty == 1
    is_fixed = (ty & 0b111000) == 0b001000
    f_ord = ty & 7
    is_lpc = ty >= 32
    order = jnp.where(is_const, 1,
                      jnp.where(is_fixed, f_ord,
                                jnp.where(is_lpc, (ty & 31) + 1, 0)))
    ok &= is_const | is_verb | (is_fixed & (f_ord <= 4)) | is_lpc

    hi, lo = _read64(hslab, rel, 5 + _SLACK)
    z = _unary(hi, lo)
    wasted = jnp.where(wflag != 0, z + 1, 0)
    rel = rel + jnp.where(wflag != 0, z + 1, 0)
    ok &= wasted < ch_bps
    sf_bps = ch_bps - wasted
    ok &= sf_bps <= 32
    sf_r = jnp.clip(sf_bps, 1, 32)  # read width (failed lanes masked)

    # --- warm-up samples (constant's value is its single warm-up;
    # C++ packs constants as order=1, warm[0]=v, coefs[31]=1). Positions
    # are rel + i*sf_bps -- closed-form, one batched read.
    warm_order = jnp.where(is_verb, 0, jnp.minimum(order, 32))
    i32 = jnp.arange(32, dtype=jnp.int32)[None, :]
    warm_rel = rel[:, None] + i32 * sf_r[:, None]
    act_w = i32 < warm_order[:, None]
    hi_w = _read_fields32(hslab, jnp.where(act_w, warm_rel, 0),
                          36 + _SLACK)
    warm = jnp.where(act_w, _sext(_bits(hi_w, sf_r[:, None]),
                                  sf_r[:, None]), 0)
    rel = rel + warm_order * sf_r

    # --- LPC parameters: precision, shift, then closed-form coefficient
    # positions (rel + 9 + i*prec) in one batched read.
    hi, _ = _read64(hslab, rel, 37 + _SLACK)
    prec = (_bits(hi, jnp.full(F, 4)) & 15) + 1
    ok &= ~is_lpc | (prec != 16)
    shift5 = _sext(_bits(hi, jnp.full(F, 9)) & 31, jnp.full(F, 5))
    ok &= ~is_lpc | (shift5 >= 0)
    rel = rel + jnp.where(is_lpc, 9, 0)
    coef_rel = rel[:, None] + i32 * prec[:, None]
    act_c = is_lpc[:, None] & (i32 < order[:, None])
    hi_c = _read_fields32(hslab, jnp.where(act_c, coef_rel, 0),
                          51 + _SLACK)
    coef_v = jnp.where(act_c, _sext(_bits(hi_c, prec[:, None]),
                                    prec[:, None]), 0)
    # The kernels store coefficients order-aligned at the tail (slot
    # 31 - i for coefficient i).
    coefs = jnp.flip(coef_v, axis=1)
    rel = rel + jnp.where(is_lpc, order * prec, 0)
    fixed_c = jnp.take(jnp.asarray(_FIXED_COEFS),
                       jnp.clip(f_ord, 0, 4), axis=0)
    coefs = jnp.where(is_fixed[:, None], fixed_c, coefs)
    coefs = coefs.at[:, 31].set(jnp.where(is_const, 1, coefs[:, 31]))
    shift = jnp.where(is_lpc, shift5, 0)

    # --- residual header (fixed/LPC lanes only).
    resd = is_fixed | is_lpc
    hi, _ = _read64(hslab, rel, 52 + _SLACK)
    meth = _bits(hi, jnp.full(F, 2))
    ok &= ~resd | (meth <= 1)
    po = _bits(hi, jnp.full(F, 6)) & 15
    rel = rel + jnp.where(resd, 6, 0)
    pbits = jnp.where(resd, 4 + meth, 0)
    n_parts = jnp.where(resd, _i(_u(jnp.int32(1)) << _u(po)), 1)
    ok &= ~resd | (n_parts <= P_CAP)
    ps = jnp.where(resd & (n_parts <= P_CAP),
                   _i(_u(bs) >> _u(po)), bs)
    ok &= ~resd | ((bs & (n_parts - 1)) == 0)
    # order > ps is a format error; order == ps (empty first partition)
    # is a kernel cap -- both leave the device path.
    ok &= ~resd | (order < jnp.maximum(ps, 1))

    pos = (hbase << 5) + rel

    # --- verbatim: uniform sf_bps-bit fields; the chunk scan below
    # walks them like fixed-advance codes (value = sign-extended field),
    # so the cursor starts at the data, exactly like residual lanes.
    verb_base0 = pos

    # --- the residual walk: scan over chunks; each step fetches one
    # per-lane slab and advances 32 codes in-register. The walk tracks
    # positions AND decodes each code's VALUE (round 5): the window,
    # quotient length, and Rice parameter are already in registers, so
    # the remainder extraction + zig-zag costs ~6 extra vector ops OFF
    # the critical cursor-dependency chain -- and the decode stage then
    # needs no entropy pass at all (one row-gather of the emitted values
    # feeds synthesis directly; `_seg_decode_program` values mode).
    # Verbatim lanes walk through the same scan (each field is a fixed
    # sf_bps-bit "code", sign-extended instead of zig-zagged).
    ps_s = jnp.maximum(ps, 1)
    resd_l = resd & ok
    verb_l = is_verb & ok
    order_l = jnp.where(is_verb, 0, order)
    bs_l = bs
    sf_l = sf_r

    def chunk_step(carry, c):
        cur, k, nb, bad = carry
        slab, sb_words = _slab(src, cur >> 5, R_WORDS)
        emit_base = cur
        # Shift-register window: (w0, w1) are slab words wi, wi + 1 with
        # the cursor ``off`` bits into w0. A code advances <= 32 bits
        # (the device cap; longer codes latch ``bad`` -> host fallback),
        # so the word cursor moves by d <= 1 per code: one register
        # shift + ONE one-hot slab refill, instead of re-selecting a
        # 3-word window per code.
        rel = cur - (sb_words << 5)  # in [0, 31 + 32 * _SLACK]
        wi = rel >> 5                # in [0, _SLACK]
        off = rel & 31
        w0 = _sel_row(slab, wi, 0, _SLACK + 1)
        w1 = _sel_row(slab, wi + 1, 1, _SLACK + 2)
        ks8 = []
        ds8 = []
        vals = []
        for j in range(32):
            t = c * 32 + j
            act_r = resd_l & (t >= order_l) & (t < bs_l)
            act_v = verb_l & (t < bs_l)
            active = act_r | act_v
            first = act_r & (t == nb)
            hi = _combine(w0, w1, off)
            kr = _bits(hi, jnp.where(first, pbits, 1))
            escape = first & (kr == (_i(_u(jnp.int32(1)) << _u(pbits)) - 1))
            k_new = jnp.where(first, kr, k)
            sh = jnp.where(first, pbits, 0)
            # Skip the parameter bits in-register; the full code
            # (param + quotient + terminator + k) must fit the 32-bit
            # window or the lane leaves the device path.
            hi2 = _i(_u(hi) << _u(sh))
            z = _clz32(hi2)
            adv = sh + z + 1 + k_new
            bad = bad | (act_r & (escape | (adv > 32)))
            na_r = jnp.minimum(adv, 32)
            na = jnp.where(act_r, na_r, jnp.where(act_v, sf_l, 0))
            # ---- decoded value (off the cursor chain). Rice: the k
            # remainder bits end exactly at bit z + 1 + k of hi2
            # (adv <= 32 guarantees they fit), so one right shift + mask
            # reads them; q is the unary count z; u32-wrapping zig-zag
            # like the reference (`src/subframe.rs:156-170`).
            rsh = jnp.clip(32 - z - 1 - k_new, 0, 31)
            rmask = _i((_u(jnp.int32(1)) << _u(jnp.minimum(k_new, 31))) - 1)
            r = _i(_u(hi2) >> _u(rsh)) & jnp.where(k_new == 0, 0, rmask)
            v = _i((_u(z) << _u(jnp.minimum(k_new, 31))) | _u(r))
            rice = jnp.where(v & 1, _i(~(_u(v) >> 1)), _i(_u(v) >> 1))
            # Verbatim: sign-extend the sf_bps-bit field at the cursor.
            vv = _sext(_bits(hi, sf_l), jnp.maximum(sf_l, 1))
            val = jnp.where(active, jnp.where(act_v, vv, rice), 0)
            off2 = off + na          # <= 63
            d = off2 >> 5            # in {0, 1}
            off = off2 & 31
            # Refill: after j codes wi <= _SLACK + j, so the lookahead
            # word wi + 2 lives in rows [2, _SLACK + j + 3).
            nxt = _sel_row(slab, wi + 2, 2, _SLACK + j + 3)
            w0 = jnp.where(d != 0, w1, w0)
            w1 = jnp.where(d != 0, nxt, w1)
            wi = wi + d
            cur = cur + na
            k = k_new
            nb = jnp.where(first,
                           jnp.where(t == order_l, ps_s, t + ps_s), nb)
            ks8.append(k_new.astype(jnp.int8))
            # Per-code bit advance (the DELTA the delta decode kernel
            # consumes, ops/entropy.py::decode_residual_bits_stream_
            # delta): includes the Rice parameter width at a partition's
            # first code, 0 at inactive positions -- exactly the
            # host-walk delta semantics. HBM-resident; never uploaded.
            # Known optimization: the default values-mode decode never
            # reads these (int8, ~1/5 of the walk descriptor bytes) --
            # gating the emission on the mode would reclaim that HBM and
            # walk-lane capacity at the cost of a mode-keyed walk
            # program; kept unconditional for one compile class.
            ds8.append(na.astype(jnp.int8))
            vals.append(val)
        return (cur, k, nb, bad), (emit_base, jnp.stack(ks8, axis=0),
                                   jnp.stack(ds8, axis=0),
                                   jnp.stack(vals, axis=0))

    nb0 = order_l
    (end_res, _, _, bad), (base_c, k_c, d_c, v_c) = jax.lax.scan(
        chunk_step, (pos, zero, nb0, jnp.zeros(F, bool)),
        jnp.arange(NC, dtype=jnp.int32))
    ok &= ~bad
    # Per-sample deltas and decoded values, chunk-major like the decode
    # kernels' (L, NC*32) layout. Constant lanes emit zeros (no codes);
    # warm-up positions are zeros (filled by the decode stage).
    deltas = d_c.transpose(2, 0, 1).reshape(F, NC * 32)
    values = v_c.transpose(2, 0, 1).reshape(F, NC * 32)

    # Chunk bases: the cursor before the first code of each chunk
    # (pre-Rice-parameter, matching the C++ walker's ensure_chunk) --
    # exactly the scan carry at each chunk step's start. Verbatim lanes
    # get the same closed-form positions (verb_base0 + 32c * sf_bps)
    # from the scan itself now that their fields walk in-scan.
    bases = base_c.T  # (F, NC)

    # Per-partition Rice parameters: k as read at each partition's first
    # code (position t_p of the per-code k emission). The emission is
    # chunk-padded to NC * 32 >= T samples (T itself need not be a
    # multiple of 32 -- e.g. the 65535 STREAMINFO bucket); t_p below is
    # clipped to T - 1, so slicing the pad off keeps every take in range.
    k_flat = _i(k_c.transpose(2, 0, 1).reshape(F, NC * 32))[:, :T]
    p_arr = jnp.arange(P_CAP, dtype=jnp.int32)[None, :]
    t_p = jnp.clip(jnp.where(p_arr == 0, order[:, None],
                             p_arr * ps_s[:, None]), 0, T - 1)
    ks = jnp.take_along_axis(k_flat, t_p, axis=1)
    ks = jnp.where(p_arr < n_parts[:, None], ks, 0)
    ks = jnp.where(is_verb[:, None] & (p_arr == 0), sf_bps[:, None], ks)
    ks = jnp.where(is_const[:, None], 0, ks)

    end = jnp.where(is_const, pos, end_res)

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
        "deltas": deltas,
        "values": values,
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
    src = (stream,) + _blocked(stream)
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
        out, end, ok_c = _walk_subframe(src, pos, bs, bps0 + side,
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
