"""Segmented device decode: frame boundaries AND subframe demux on chip.

The round-3 decode path (VERDICT round-2 item 3): instead of the C++
host walk over every payload byte, one fused device program per stream
group (``ops.seg_parse``) byte-swaps the raw upload, scans every byte
position for sync patterns, parses + CRC-8-validates the candidate
frame headers, and walks each candidate's subframes (headers, LPC
parameters, Rice partitions -- ``ops.demux``), returning device-resident
descriptor arrays plus ONE packed per-candidate summary. The host's
whole job is: group streams by STREAMINFO shape (no payload bytes
touched), upload, fetch the summary, chain + plan, and dispatch the
production entropy/synthesis/epilogue/CRC-16 programs. Host cost per
sample drops from the ~3.7 ns/sample C++ boundary walk to the upload
memcpy plus per-frame planning, and the demux round trips collapse to
one summary fetch per group.

Validation model: candidate chaining. A candidate is a REAL frame start
iff it is the frame-section start or the byte just after a previous real
frame's CRC-16. The walk returns each candidate's end, so the host chains
ends -> next starts; a break in the chain, a non-ok walk lane, or
incomplete coverage sends THAT STREAM to the host-walk path
(``pipeline.extract_streams_bits``), which reproduces the reference's
exact error wording and ordering; the rest of the batch stays on the
device path and the results merge. Frame CRC-16s of chained frames are
verified by the existing device verifier, so a payload byte that mimics
a valid header (sync + plausible fields + matching CRC-8) can still
never corrupt output: it either loses the chain race or fails CRC-16.

Reference parity anchor: claxon's sequential reader
(`src/frame.rs:131-316` headers, `src/subframe.rs` subframes); the
header design that makes speculation sound is `src/frame.rs:291-302`
(sync-mimic codes forbidden) -- see ops/segment.py.
"""

from functools import lru_cache

import numpy as np

__all__ = ["decode_streams_segmented", "begin_segmented",
           "finish_segmented", "host_header_fields"]

#: sample-rate extra bytes by code (codes 12, 13, 14 read 1/2/2 bytes).
_SR_EXTRA = np.array([0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 2, 2, 0],
                     np.int64)
_BPS_TABLE = np.array([0, 8, 12, -1, 16, 20, 24, -1], np.int64)


def host_header_fields(buf, positions):
    """Decode frame-header fields at ``positions`` of byte buffer ``buf``.

    The host twin of the device field parse in ``ops.seg_parse`` (kept
    as its differential-test oracle and for diagnostics). Vectorized
    over candidates; reads at most 16 bytes per position. The grammar
    mirrors ``frame.read_frame_header_or_eof`` (reference
    `src/frame.rs:131-316`); malformed candidates get ok=False rather
    than an error.

    Returns a dict of int64 arrays: ok, block_size, nch, mode, bps_code
    (0 = streaminfo), hlen (header bytes INCLUDING the CRC-8 byte),
    time_raw (UTF-8-coded frame/sample number), variable (blocking flag).
    """
    buf = np.asarray(buf, dtype=np.uint8)
    pos = np.asarray(positions, dtype=np.int64)
    n = len(pos)
    if n == 0:
        z = np.zeros(0, np.int64)
        return {k: z for k in ("ok", "block_size", "nch", "mode",
                               "bps_code", "hlen", "time_raw", "variable")}
    win = buf[np.minimum(pos[:, None] + np.arange(16), len(buf) - 1)]
    win = win.astype(np.int64)

    ok = (win[:, 0] == 0xFF) & ((win[:, 1] & 0xFC) == 0xF8)
    variable = win[:, 1] & 1
    bs_code = win[:, 2] >> 4
    sr_code = win[:, 2] & 15
    ok &= (bs_code != 0) & (sr_code != 15)
    ca = win[:, 3] >> 4
    bps_code = (win[:, 3] >> 1) & 7
    ok &= (ca <= 10) & (_BPS_TABLE[np.minimum(bps_code, 7)] >= 0) \
        & ((win[:, 3] & 1) == 0)
    nch = np.where(ca < 8, ca + 1, 2)
    mode = np.where(ca < 8, 0, ca - 7)  # 1 LS, 2 RS, 3 MS (epilogue codes)

    # UTF-8 frame/sample number (1..7 bytes).
    first = win[:, 4]
    lead = np.zeros(n, np.int64)
    probe = 0x80
    live = np.ones(n, bool)
    for _ in range(8):
        hit = live & ((first & probe) != 0)
        lead += hit
        live &= hit
        probe >>= 1
    ok &= (lead != 1) & (lead != 8)
    ulen = np.maximum(lead, 1)
    mask0 = np.array([0x7F, 0, 0x1F, 0x0F, 0x07, 0x03, 0x01, 0], np.int64)
    val = first & mask0[np.minimum(lead, 7)]
    for j in range(1, 7):
        cont = win[:, 4 + j]
        use = j < ulen
        ok &= ~use | ((cont & 0xC0) == 0x80)
        val = np.where(use, (val << 6) | (cont & 0x3F), val)

    bs_extra = np.where(bs_code == 6, 1, 0) + np.where(bs_code == 7, 2, 0)
    sr_extra = _SR_EXTRA[sr_code]
    o = 4 + ulen
    b8 = win[np.arange(n), np.minimum(o, 15)]
    b16 = (b8 << 8) | win[np.arange(n), np.minimum(o + 1, 15)]
    block_size = np.select(
        [bs_code == 1, bs_code <= 5, bs_code == 6, bs_code == 7],
        [192, 576 << np.maximum(bs_code - 2, 0), b8 + 1, b16 + 1],
        256 << np.maximum(bs_code - 8, 0))
    ok &= ~((bs_code == 7) & (b16 == 0xFFFF))
    hlen = o + bs_extra + sr_extra + 1  # + the CRC-8 byte

    return {"ok": ok, "block_size": np.where(ok, block_size, 0),
            "nch": nch, "mode": mode, "bps_code": bps_code, "hlen": hlen,
            "time_raw": val, "variable": variable}


def _jnp():
    import jax.numpy as jnp
    return jnp


#: chunk gather-width classes (mirrors kSClasses in claxon_demux.cpp) so
#: decode programs compile per class, not per corpus.
_SA_CLASSES = (4, 6, 8, 12, 16, 24, 32, 48, 64)


def _sa_class(s):
    for c in _SA_CLASSES:
        if s <= c:
            return c + 1
    return _SA_CLASSES[-1] + 1


_WALK_KEYS = ("order", "shift", "wasted", "ps", "pbits", "flags", "warm",
              "coefs", "ks", "bases", "deltas", "values")


def _seg_mode():
    """CLAXON_TPU_SEG_ENTROPY, validated: "values" (default) consumes
    the walk's decoded-value emissions -- no entropy pass at decode time
    at all; "delta" re-reads remainders with the fully-parallel delta
    kernel; "scan" re-locates every code with the 32-step in-chunk scan.
    Measured resident (tools/seg_bench.py, real chip, round 5):
    values (365.8, demux INCLUDED -- beats the host-walk decode-only
    217.9) > scan (149.1) > delta (129.7)."""
    import os

    mode = os.environ.get("CLAXON_TPU_SEG_ENTROPY", "values")
    return mode if mode in ("values", "delta", "scan") else "values"


def _seg_decode_program(P, SA, Tb, out_packed, mesh=None, mode=None):
    """Entry point: resolves the kernel knob so tests can A/B without
    poisoning the compile cache (the knob is part of the cache key).
    ``finish_segmented`` passes the ``mode`` it planned pcls/SA with so
    plan and kernel can never disagree; bare callers resolve the env."""
    return _seg_decode_program_impl(P, SA, Tb, out_packed,
                                    mode or _seg_mode(), mesh)


@lru_cache(maxsize=None)
def _seg_decode_program_impl(P, SA, Tb, out_packed, mode, mesh=None):
    """The segmented-path decode program: gather the chained lanes from
    the walk outputs, then synthesis -> epilogue -> transfer packing.
    All big inputs are already on device (walk outputs + the byte-swapped
    stream); only the tiny (L, 3) plan array [row, length, mode] crosses
    the link.

    In the default "values" mode there is NO entropy stage here at all:
    the walk already decoded every Rice code's value while locating it
    (ops/demux.py chunk_step -- the remainder extraction is a handful of
    vector ops off the walk's critical cursor chain), so this program is
    one row-gather of the emitted values + warm-up fill + synthesis.
    The "delta"/"scan" modes re-derive the values from the stream and
    exist for A/B measurement and differential testing.

    Under a ``mesh`` the plan's lane axis shards over LANE_AXIS and the
    stream + walk descriptor arrays replicate (frames are independent,
    reference `src/frame.rs:667-779`): every lane's gathers hit
    replicated operands, so the compiled program stays collective-free
    exactly like the sharded bits program (`pipeline_bits._jit_bucket_
    program`)."""
    import jax

    from .ops.entropy import (decode_residual_bits_stream,
                              decode_residual_bits_stream_delta)
    from .ops.epilogue import apply_epilogue, pack_int16_pairs
    from .ops.predict import synthesize_best
    from .pipeline import _split_lanes, _FETCH_CHUNKS

    n_chunks = _FETCH_CHUNKS if mesh is None else 1

    # The dispatch's T bucket can be smaller than the walk group's (a
    # merged group walks every frame at the group NC; a per-frame-bucket
    # dispatch decodes at its own): slice the walk arrays' chunk axis
    # down so synthesis FLOPs and d2h PCM bytes track the FRAME size.
    NC_b = (Tb + 31) // 32

    def prog(stream, order, shift, wasted, ps, pbits, flags, warm, coefs,
             ks, bases, deltas, values, plan):
        jnp = _jnp()
        rows = plan[:, 0]
        lengths = plan[:, 1]
        L = rows.shape[0]
        pair_modes = plan[:, 2].reshape(L // 2, 2)[:, 0]
        g = lambda a: jnp.take(a, rows, axis=0)
        if mode == "values":
            x = g(values)[:, :NC_b * 32]
            T = x.shape[1]
            t = jnp.arange(T, dtype=jnp.int32)[None, :]
            w = g(warm)
            warm_t = jnp.pad(w, ((0, 0), (0, T - w.shape[1])))
            ords = g(order)
            x = jnp.where(t < ords[:, None], warm_t, x)
        elif mode == "delta":
            ords = g(order)
            x = decode_residual_bits_stream_delta(
                stream, g(bases)[:, :NC_b], g(deltas)[:, :NC_b * 32],
                g(ks)[:, :P], g(ps), ords, g(pbits), g(flags),
                g(warm), lengths, n_parts_max=P, sa=SA)
        else:
            ords = g(order)
            x = decode_residual_bits_stream(
                stream, g(bases)[:, :NC_b], g(ks)[:, :P], g(ps), ords,
                g(pbits), g(flags), g(warm), lengths, n_parts_max=P,
                sa=SA)
        out = synthesize_best(x, g(coefs), g(shift), ords, lengths)
        out = apply_epilogue(out, g(wasted), pair_modes)
        if out_packed:
            packed, flag = pack_int16_pairs(out, per_lane=mesh is not None)
            return out, flag, _split_lanes(packed, n_chunks)
        return out, _split_lanes(out, n_chunks)

    if mesh is None:
        return jax.jit(prog)
    from jax.sharding import NamedSharding, PartitionSpec
    from .parallel.mesh import LANE_AXIS

    repl = NamedSharding(mesh, PartitionSpec())
    lanes = NamedSharding(mesh, PartitionSpec(LANE_AXIS, None))
    return jax.jit(prog, in_shardings=(repl,) * 13 + (lanes,))


class _SegPending:
    """An in-flight segmented batch: every group's upload + fused demux
    has been dispatched and its summary fetch started. ``finish`` (or
    ``decode_streams_segmented``) turns it into a ``DeviceDecoded``."""

    __slots__ = ("datas", "lane_quantum", "sis", "groups", "upload_bytes",
                 "marks", "mark", "mesh", "pre_fallback")

    def __init__(self, datas, lane_quantum, mesh=None):
        self.datas = datas
        self.lane_quantum = lane_quantum
        self.mesh = mesh
        self.groups = []
        self.upload_bytes = 0
        self.pre_fallback = []


def _host_fallback(datas, lane_quantum, mesh=None, per_stream=False):
    from .pipeline import decode_streams_device, _L_QUANTUM
    if lane_quantum is None:
        if mesh is not None:
            from .parallel.mesh import lane_quantum as _mesh_lq
            lane_quantum = _mesh_lq(mesh)
        else:
            lane_quantum = _L_QUANTUM
    if mesh is not None:
        from .pipeline import extract_streams_bits, _native_mod
        native = _native_mod()
        if native is not None:
            from .pipeline_bits import decode_raw_bits_device
            braws, mode = extract_streams_bits(datas, native)
            return decode_raw_bits_device(braws, lane_quantum, mode,
                                          mesh=mesh)
    if per_stream:
        # Per-stream fallback batches are a handful of odd streams; the
        # TPU's 128-lane quantum would pad their per-lane uploads ~20x
        # (int32 second-minor tiles at 8 sublanes, so L=8 wastes nothing
        # on chip). Whole-batch fallbacks keep the caller's quantum --
        # an 8-lane quantum there would mint a fresh compile class per
        # batch composition.
        lane_quantum = min(lane_quantum, 8)
    return decode_streams_device(datas, lane_quantum=lane_quantum,
                                 segmentation="host")


#: STREAMINFO identities (PCM MD5) of streams that left the device-demux
#: path for a per-stream reason (walk-rejected frame -- e.g. a > 32-bit
#: code or > 64 partitions -- or a chain break) once in this process.
#: ``begin_segmented`` pre-routes them to the per-stream host fallback,
#: so a REPEATED decode stops paying their group-upload bytes + wasted
#: walk lanes twice (measured on the bench mixed corpus: its one
#: walk-rejected 24-bit stream alone pushed upload overhead to 1.88
#: B/sample vs the 1.45 floor). Purely a routing memo: both routes are
#: bit-exact, and a stream without a stored MD5 is never cached.
#: Group-level DemuxOverflow is NOT cached (it is a property of the
#: grouped payload, not of any one stream).
_REJECT_CACHE = set()
_REJECT_CACHE_CAP = 1 << 16


def _si_key(si, n_bytes):
    md5 = si.md5sum
    if not md5 or md5 == b"\x00" * 16:
        return None
    # The rejection is a property of the ENCODE, not the audio, and the
    # PCM MD5 alone is shared by every encode of the same PCM. Block
    # sizes + the exact stream length separate encodes in practice (a
    # different rice/partition/LPC config virtually never produces the
    # same byte count); a residual collision only costs routing (the
    # host fallback is bit-exact), never correctness.
    return (md5, si.min_block_size, si.max_block_size, n_bytes)


def begin_segmented(datas, lane_quantum=None, mesh=None):
    """Stage 1 of the segmented decode: metadata parse, stream grouping,
    and -- per group -- ONE upload, ONE fused demux dispatch, and an
    async summary-fetch start. Returns a ``_SegPending`` for
    ``finish_segmented``, or ``None`` when the batch cannot ride the
    device-demux path at all (caller takes the host-walk pipeline).

    The begin/finish split exists because the summary fetch is a full
    link round trip: callers that overlap batches (``pipeline.
    decode_streams_device_async``, the pipelined corpus APIs, bench.py's
    to-device loop) hide that latency behind the NEXT batch's host work
    and upload instead of idling in it.
    """
    from . import native
    from .native.binding import _read_metadata
    from .ops.seg_parse import fused_demux_async
    from .pipeline import _L_QUANTUM, _T_BUCKETS
    from .pipeline_bits import _pad_stream_words

    jnp = _jnp()
    if lane_quantum is None:
        if mesh is not None:
            from .parallel.mesh import lane_quantum as _mesh_lq
            lane_quantum = _mesh_lq(mesh)
        else:
            lane_quantum = _L_QUANTUM

    # CLAXON_TPU_SEG_DEBUG=1: per-stage host-CPU accounting (diagnostic).
    import os
    import time as _time
    pending = _SegPending(datas, lane_quantum, mesh)
    if os.environ.get("CLAXON_TPU_SEG_DEBUG"):
        pending.marks = [("start", _time.process_time())]
        pending.mark = lambda label: pending.marks.append(
            (label, _time.process_time()))
    else:
        pending.marks = None
        pending.mark = lambda label: None
    _mark = pending.mark

    if not native.available():
        return None
    if sum(len(d) for d in datas) >= (1 << 27):
        return None  # int32 bit positions cap, like stream mode

    # ---- host metadata parse (headers only; no payload bytes touched).
    sis, payloads = [], []
    for d in datas:
        si, pos = _read_metadata(d)
        sis.append(si)
        payloads.append(np.frombuffer(d, np.uint8)[pos:])
    tbv = np.asarray(_T_BUCKETS, np.int64)
    # Streams the device demux cannot represent AT ALL (> 2 channels:
    # the device stereo decorrelation is 2-lane; an out-of-ladder
    # STREAMINFO block size) take the per-stream host fallback -- one
    # such stream must not reject the whole batch from the device path.
    pre_fb = [i for i, si in enumerate(sis)
              if si.channels > 2 or si.max_block_size > int(tbv[-1])
              or _si_key(si, len(datas[i])) in _REJECT_CACHE]
    if len(pre_fb) == len(datas):
        return None
    pending.pre_fallback = pre_fb
    pre_fb = set(pre_fb)
    pending.sis = sis
    _mark("metadata")

    # ---- stream groups: (T bucket of the STREAMINFO max block size,
    # channel count) -- both known before touching any payload byte, so
    # each group gets ONE upload + ONE fused demux dispatch. A frame
    # whose header contradicts its stream's STREAMINFO shape simply
    # breaks the chain (-> host fallback, reference-exact errors).
    si_groups = {}
    for gi, si in enumerate(sis):
        if gi in pre_fb:
            continue
        T = int(tbv[np.searchsorted(tbv, max(si.max_block_size, 1))])
        si_groups.setdefault((T, si.channels), []).append(gi)

    # Merge same-channel-count groups whose T buckets are within 4x of
    # the largest (VERDICT r4 item 3): every group is one more upload +
    # fused-demux dispatch + summary round trip per batch -- the fixed
    # costs that lost the mixed corpus -- while walking a small-block
    # stream at a <= 4x larger NC only costs bounded device FLOPs (the
    # decode dispatches below re-bucket per FRAME, so decode pays
    # nothing). Groups past the ratio (e.g. one 65535-bucket stream
    # amid 1152-block streams) stay separate.
    merged = {}
    for (T, nch), g in sorted(si_groups.items(), reverse=True):
        placed = False
        for (Tm, nchm) in merged:
            if nchm == nch and Tm <= 4 * T:
                merged[(Tm, nchm)].extend(g)
                placed = True
                break
        if not placed:
            merged[(T, nch)] = list(g)

    for (T, nch), g_streams in merged.items():
        g_streams = sorted(g_streams)
        g_payloads = [payloads[i] for i in g_streams]
        sizes = [p.nbytes for p in g_payloads]
        wcs = [(s + 3) // 4 for s in sizes]
        total_w = sum(wcs)
        total_q = _pad_stream_words(total_w)
        buf = np.zeros(total_q * 4, dtype=np.uint8)
        byte_off = np.zeros(len(g_streams), np.int64)
        off = 0
        for k, (p, s, wc) in enumerate(zip(g_payloads, sizes, wcs)):
            buf[off:off + s] = p
            byte_off[k] = off
            off += wc * 4
        ends_abs = byte_off + np.asarray(sizes, np.int64)
        _mark("buf")

        # Frame-count bound from STREAMINFO (total samples / min block
        # size) -> a tight candidate capacity; None (unknown totals)
        # falls back to the conservative bytes/512 estimate.
        frames_est = 0
        for i in g_streams:
            si = sis[i]
            if not si.samples or not si.min_block_size:
                frames_est = None
                break
            frames_est += -(-si.samples // si.min_block_size) + 2

        # ---- ONE upload (raw little-endian words; the device
        # byte-swaps) + ONE fused demux dispatch; the summary fetch is
        # already in flight when this returns.
        words_le = jnp.asarray(buf.view(np.int32))
        pending.upload_bytes += total_q * 4
        pend = fused_demux_async(
            words_le, total_q * 4, T, nch, ends_abs,
            [sis[i].bits_per_sample for i in g_streams], frames_est)
        pending.groups.append((T, nch, g_streams, byte_off, ends_abs,
                               sizes, pend))
        _mark("fused")
    return pending


def finish_segmented(pending):
    """Stage 2: resolve each group's summary, chain candidates, plan and
    dispatch the decode + CRC programs. Falls back to the host-walk
    pipeline (bit-exact, reference-exact errors) on any chain break."""
    from .ops.seg_parse import SUMMARY_COLS
    from .pipeline import (DecodedStream, DeviceDecoded, _BucketDispatch,
                           _LITTLE_ENDIAN, _T_BUCKETS, bucket_shape)
    from .pipeline_bits import _crc_program, _P_CLASSES

    jnp = _jnp()
    datas = pending.datas
    lane_quantum = pending.lane_quantum
    mesh = pending.mesh
    sis = pending.sis
    _mark = pending.mark
    if mesh is not None:
        # Replicate the demux outputs over the mesh once per group; the
        # decode programs' in_shardings expect replicated operands and a
        # committed single-device array would otherwise be rejected.
        import jax
        from jax.sharding import NamedSharding, PartitionSpec
        _repl = NamedSharding(mesh, PartitionSpec())
        _replicate = lambda x: jax.device_put(x, _repl)
    else:
        _replicate = lambda x: x

    results = [None] * len(datas)
    pcms = [None] * len(datas)
    dispatches, plans, crc_pairs = [], [], []
    #: global stream indices that leave the device path (> 2 channels,
    #: chain break, walk-rejected frame, demux overflow); host-walked at
    #: the end and merged back, so ONE odd stream no longer re-uploads
    #: the batch.
    fb_streams = list(pending.pre_fallback)
    #: per-stream fallbacks observed THIS batch (chain break or
    #: walk-rejected frame): learned into _REJECT_CACHE below so
    #: repeated decodes pre-route them (begin_segmented).
    fb_learn = []
    upload_bytes = pending.upload_bytes
    _P_CLASSES_V = np.asarray(_P_CLASSES, np.int64)
    _T_BUCKETS_V = np.asarray(_T_BUCKETS, np.int64)

    from .ops.seg_parse import DemuxOverflow

    for (T, nch, g_streams, byte_off, ends_abs, sizes, pend) \
            in pending.groups:
        try:
            summary, count = pend.resolve()
        except DemuxOverflow:
            # Sync-saturated payload: more candidates than the walk may
            # materialize lanes for. The overflow is a property of the
            # group's shared buffer (no per-stream attribution), so the
            # whole GROUP host-walks; other groups stay on device.
            fb_streams.extend(g_streams)
            continue
        stream_dev = _replicate(pend.stream)
        walk = tuple(_replicate(w) for w in pend.walk)

        cols = {name: summary[:, k].astype(np.int64)
                for k, name in enumerate(SUMMARY_COLS)}
        cpos = cols["pos"]
        ok_c = (cols["valid"] != 0) & (cols["walk_ok"] != 0)
        # Walk lanes are COMPACTED on device (only walkable candidates
        # are walked, in candidate order); this rank is the device's
        # exact compaction map, recomputed from the summary's valid bit.
        walk_rank = np.cumsum(cols["valid"] != 0) - 1
        end_byte = cols["end_byte"]
        bs_c = cols["block_size"]
        time_raw = (cols["time_hi"] << 32) | (cols["time_lo"] & 0xFFFFFFFF)
        c_si = np.searchsorted(ends_abs, cpos, side="right")
        c_si = np.minimum(c_si, len(g_streams) - 1) if len(g_streams) \
            else c_si
        _mark("summary")

        # ---- chain per stream: ends -> next starts; must tile the
        # payload. Fast path: no false positives -- every candidate
        # links to the next. A break sends THAT stream (only) to the
        # host walk, which reproduces the reference's exact errors.
        chains = []
        fb_local = set()
        empty = np.zeros(0, np.int64)

        def _fb_stream(k):
            fb_local.add(k)
            fb_streams.append(g_streams[k])
            fb_learn.append(g_streams[k])
            chains.append(empty)

        for k, size in enumerate(sizes):
            idx = np.flatnonzero(c_si == k)
            if idx.size == 0:
                if size != 0:
                    _fb_stream(k)
                else:
                    chains.append(idx)
                continue
            local = cpos[idx] - byte_off[k]
            nxt = end_byte[idx] - byte_off[k] + 2
            if ok_c[idx].all() and local[0] == 0 and nxt[-1] == size \
                    and np.array_equal(nxt[:-1], local[1:]):
                chains.append(idx)
                continue
            # Slow path (a payload byte mimicked a header): walk the
            # chain.
            pos_map = {int(p): int(ci) for p, ci in zip(local, idx)}
            exp, chain, good = 0, [], True
            while exp < size:
                ci = pos_map.get(exp)
                if ci is None or not ok_c[ci]:
                    good = False
                    break
                chain.append(ci)
                nxt1 = int(end_byte[ci]) + 2 - int(byte_off[k])
                if nxt1 <= exp:
                    good = False
                    break
                exp = nxt1
            if not good or exp != size:
                _fb_stream(k)
                continue
            chains.append(np.asarray(chain, np.int64))
        _mark("chains")

        # ---- results + output offsets (chain order IS stream order).
        out0_c = np.zeros(count, np.int64)
        chained_mask = np.zeros(count, bool)
        crc_starts, crc_ends = [], []
        for k, chain in enumerate(chains):
            if k in fb_local:
                continue  # host-walked below
            si = sis[g_streams[k]]
            bs_v = bs_c[chain]
            total = int(bs_v.sum()) if chain.size else 0
            pcm = np.zeros((total, si.channels), dtype=np.int32)
            pcms[g_streams[k]] = pcm
            t_raw = time_raw[chain]
            times = np.where(cols["variable"][chain] != 0, t_raw,
                             t_raw * bs_v)
            results[g_streams[k]] = DecodedStream(
                streaminfo=si, pcm=pcm, frame_times=times.tolist(),
                frame_sizes=bs_v.tolist())
            if chain.size:
                out0_c[chain] = np.cumsum(bs_v) - bs_v
                chained_mask[chain] = True
                crc_starts.append(cpos[chain])
                crc_ends.append(end_byte[chain] + 2)
        _mark("results")

        # ---- decode dispatches: one per (P class, frame T bucket). Walk
        # lanes are compacted-walkable-major (row = walk_rank * nch +
        # channel). The T bucket is per FRAME, not the group's (merged
        # groups walk small-block frames at the group NC, but decoding
        # them there would pad the synthesis FLOPs and the d2h PCM bytes
        # by the bucket ratio): the program slices the walk arrays'
        # chunk axis down to the dispatch bucket.
        g_idx = np.flatnonzero(chained_mask)
        if g_idx.size:
            seg_mode = _seg_mode()
            if seg_mode == "values":
                # The values-mode decode never touches ks/partitions or
                # the stream: one P class, one (placeholder) SA class --
                # fewer dispatches per batch and fewer compile classes.
                pcls = np.ones(g_idx.size, np.int64)
            else:
                pcls = _P_CLASSES_V[np.minimum(
                    np.searchsorted(_P_CLASSES_V,
                                    np.maximum(cols["n_parts"][g_idx], 1)),
                    len(_P_CLASSES_V) - 1)]
            tcls = _T_BUCKETS_V[np.searchsorted(
                _T_BUCKETS_V, np.maximum(bs_c[g_idx], 1))]
            # Merge sparse classes upward: every class is one more
            # program dispatch per batch (a link round trip on this
            # transport) and one more compile class, while padding a few
            # lanes to a larger n_parts_max / T bucket only costs device
            # FLOPs. T first (the bigger padding cost), then P.
            uniqt = list(np.unique(tcls))
            for ci, Tc in enumerate(uniqt[:-1]):
                m = tcls == Tc
                if m.sum() * Tc < 32 * uniqt[ci + 1]:
                    tcls[m] = uniqt[ci + 1]
            uniq = list(np.unique(pcls))
            for ci, P in enumerate(uniq[:-1]):
                if (pcls == P).sum() < 32:
                    pcls[pcls == P] = uniq[ci + 1]
            keys = pcls.astype(np.int64) << 32 | tcls.astype(np.int64)
            for key in np.unique(keys):
                P, Tb = int(key >> 32), int(key & 0xFFFFFFFF)
                sub = g_idx[keys == key]
                # Stream-then-position order makes runs contiguous.
                sub = sub[np.lexsort((out0_c[sub], c_si[sub]))]
                n_frames = sub.size
                n_lanes = n_frames * nch
                L, Tb = bucket_shape(n_lanes, Tb, lane_quantum)
                SA = (0 if seg_mode == "values"
                      else _sa_class(int(cols["sa"][sub].max())))
                plan_arr = np.zeros((L, 3), np.int32)
                rows = (walk_rank[sub][:, None] * nch
                        + np.arange(nch)[None, :]).reshape(-1)
                bs_v = bs_c[sub]
                plan_arr[:n_lanes, 0] = rows
                plan_arr[:n_lanes, 1] = np.repeat(bs_v, nch)
                plan_arr[:n_lanes, 2] = np.repeat(cols["mode"][sub], nch)
                si_v = c_si[sub]
                out0_v = out0_c[sub]
                brk = np.flatnonzero(
                    (si_v[1:] != si_v[:-1]) | (bs_v[1:] != bs_v[:-1])
                    | (out0_v[1:] != out0_v[:-1] + bs_v[:-1])) + 1
                starts_r = np.concatenate([[0], brk])
                ends_r = np.concatenate([brk, [n_frames]])
                plan = [(g_streams[int(si_v[st])], int(out0_v[st]),
                         int(en - st), int(bs_v[st]), nch, int(st * nch))
                        for st, en in zip(starts_r, ends_r)]
                out_packed = (_LITTLE_ENDIAN and Tb % 2 == 0
                              and int(cols["bps"][sub].max()) <= 16)
                prog = _seg_decode_program(int(P), SA, Tb, out_packed,
                                           mesh, mode=seg_mode)
                args = walk + (jnp.asarray(plan_arr),)
                upload_bytes += plan_arr.nbytes
                if out_packed:
                    out, flag, chunks = prog(stream_dev, *args)
                    dispatches.append(_BucketDispatch([], nch, out,
                                                      chunks, True, flag))
                else:
                    out, chunks = prog(stream_dev, *args)
                    dispatches.append(_BucketDispatch([], nch, out,
                                                      chunks, False))
                plans.append(plan)

        if crc_starts:
            starts = np.concatenate(crc_starts).astype(np.int32)
            ends_a = np.concatenate(crc_ends).astype(np.int32)
            n = len(starts)
            # The frame axis shards over the mesh: start from a multiple
            # of the device count (lcm keeps doubling divisible even for
            # non-power-of-two meshes) so the sharded CRC program never
            # sees an indivisible axis.
            import math
            fq = 8 if mesh is None else math.lcm(8, int(mesh.devices.size))
            while fq < n:
                fq *= 2
            se = np.stack([np.pad(starts, (0, fq - n)),
                           np.pad(ends_a, (0, fq - n))])
            vals = _crc_program(mesh)(stream_dev, jnp.asarray(se))
            crc_pairs.append((vals, n))
            upload_bytes += se.nbytes
        _mark("dispatch")

    # ---- per-stream host fallback: decode only the streams that left
    # the device path (reference-exact error behavior lives there) and
    # graft their buckets/plans/CRC verdicts into this batch. Both paths
    # build the same _raw_plans form, so the merge is a stream-index
    # remap. (VERDICT r3 item 3: one odd stream in a 16-stream batch
    # must not re-upload the other 15.)
    for i in fb_learn:
        if len(_REJECT_CACHE) >= _REJECT_CACHE_CAP:
            break  # memo full: stop learning (bounded; routing only)
        k = _si_key(sis[i], len(datas[i]))
        if k is not None:
            _REJECT_CACHE.add(k)

    if fb_streams:
        fb_streams = sorted(set(fb_streams))
        fb_dd = _host_fallback([datas[i] for i in fb_streams], lane_quantum,
                               mesh, per_stream=True)
        fb_plans, fb_pcms = fb_dd._raw_plans
        for j, i in enumerate(fb_streams):
            results[i] = fb_dd.results[j]
            pcms[i] = fb_pcms[j]
        for plan in fb_plans:
            plans.append([(fb_streams[r[0]],) + tuple(r[1:])
                          for r in plan])
        dispatches.extend(fb_dd.dispatches)
        cc = fb_dd.crc_check
        if cc is not None:
            crc_pairs.extend(cc if isinstance(cc, list) else [cc])
        upload_bytes += getattr(fb_dd, "upload_bytes", 0)

    dd = DeviceDecoded(results, [], [], dispatches)
    dd._raw_plans = (plans, pcms)
    # markers: segmented = at least one stream decoded via the device
    # demux; seg_engaged = the fused demux ran at all (even if every
    # stream then fell back) -- segmentation="auto" uses the distinction
    # to cache "host" for corpora whose demux attempt is always wasted
    # while staying uncached on cheap shape rejections.
    dd.segmented = len(fb_streams) < len(datas)
    dd.seg_engaged = True
    dd.fallback_streams = list(fb_streams)
    if crc_pairs:
        dd.crc_check = crc_pairs
    dd.upload_bytes = upload_bytes
    if pending.marks is not None:
        deltas = [(b, round((t1 - t0) * 1e3, 3)) for (b, t1), (_, t0)
                  in zip(pending.marks[1:], pending.marks)]
        print("seg stage CPU ms:", deltas)
    return dd


def decode_streams_segmented(datas, lane_quantum=None, mesh=None):
    """Decode FLAC streams with on-device segmentation + demux.

    Drop-in sibling of ``pipeline.decode_streams_device`` (returns a
    ``DeviceDecoded``); the host never walks payload bytes. When a
    stream cannot ride the device-demux path -- more than 2 channels, a
    walk-rejected frame (escaped partitions, > 64 partitions, oversized
    codes...) or a chain break -- only THAT stream falls back to the
    host-walk bits pipeline (reference-exact error behavior) and its
    results merge back into the batch; a sync-saturated group
    (DemuxOverflow) falls back as a group, and an oversized batch
    (>= 2^27 bytes: int32 bit positions) routes whole before any
    upload. All paths are bit-exact.

    Overlapping callers use ``begin_segmented``/``finish_segmented``
    directly (`pipeline.decode_streams_device_async`) so the summary
    round trip hides behind the next batch's work. ``mesh``: a 1-D
    jax.sharding.Mesh lane-shards the decode programs over the chips
    (collective-free; the fused demux program replicates its outputs).
    """
    pending = begin_segmented(datas, lane_quantum, mesh)
    if pending is None:
        return _host_fallback(datas, lane_quantum, mesh)
    return finish_segmented(pending)
