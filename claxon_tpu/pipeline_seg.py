"""Segmented device decode: frame boundaries AND subframe demux on chip.

The round-3 decode path (VERDICT round-2 item 3): instead of the C++
host walk over every payload byte, the device recovers frame-header
candidates (``ops.segment.find_frame_headers``), the host decodes only
the few header bytes per candidate (vectorized numpy over its own copy
of the stream -- ~16 bytes per frame, no payload walk), and the device
walk (``ops.demux.walk_frames``) parses subframe headers and Rice
boundaries. The existing entropy/synthesis/epilogue/CRC-16 programs then
decode as usual. Host cost per sample drops from the ~3.7 ns/sample
boundary walk to effectively the per-frame planning cost.

Validation model: candidate chaining. A candidate is a REAL frame start
iff it is the frame-section start or the byte just after a previous real
frame's CRC-16. The walk returns each candidate's end, so the host chains
ends -> next starts; a break in the chain, a non-ok walk lane, or
incomplete coverage sends the WHOLE stream to the host-walk path
(``pipeline.extract_streams_bits``), which reproduces the reference's
exact error wording and ordering. Frame CRC-16s of chained frames are
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

__all__ = ["decode_streams_segmented", "host_header_fields"]

#: sample-rate extra bytes by code (codes 12, 13, 14 read 1/2/2 bytes).
_SR_EXTRA = np.array([0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 2, 2, 0],
                     np.int64)
_BPS_TABLE = np.array([0, 8, 12, -1, 16, 20, 24, -1], np.int64)


def host_header_fields(buf, positions):
    """Decode frame-header fields at ``positions`` of byte buffer ``buf``.

    Vectorized over candidates; reads at most 16 bytes per position. The
    grammar mirrors ``frame.read_frame_header_or_eof`` (reference
    `src/frame.rs:131-316`); malformed candidates get ok=False rather
    than an error (the device CRC-8 scan should already have rejected
    them, and non-chained candidates are ignored anyway).

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


#: walk lane-count quantum (frames per walk dispatch are padded to this).
_WALK_QUANTUM = 64

_WALK_KEYS = ("order", "shift", "wasted", "ps", "pbits", "flags", "warm",
              "coefs", "ks", "bases")


@lru_cache(maxsize=None)
def _walk_program(T, nch, F):
    """Jitted walk + per-frame fetch summary: returns the walk output
    arrays (device-resident, consumed by the decode program) plus ONE
    small (F, 4) array [ok, end_byte, n_parts_max, sa_max] for host
    planning (a single d2h fetch per walk group)."""
    import jax

    from .ops.demux import walk_frames

    def prog(stream, start_bits, bs, modes, bps0):
        out, end_bits, ok = walk_frames(stream, start_bits, bs, modes,
                                        bps0, T=T, nch=nch)
        jnp = _jnp()
        np_f = out["n_parts"].reshape(F, nch).max(axis=1)
        sa_f = out["sa_words"].reshape(F, nch).max(axis=1)
        summary = jnp.stack(
            [ok.astype(jnp.int32), end_bits >> 3, np_f, sa_f], axis=1)
        return tuple(out[k] for k in _WALK_KEYS), summary

    return jax.jit(prog)


@lru_cache(maxsize=1)
def _bswap_program():
    """bswap32 each word: little-endian upload -> the big-endian byte
    packing every stream kernel indexes (byte i = word i >> 2, lane
    3 - (i & 3))."""
    import jax

    def prog(w):
        jnp = _jnp()
        return (((w & 0xFF) << 24) | ((w & 0xFF00) << 8)
                | ((w >> 8) & 0xFF00) | ((w >> 24) & 0xFF))

    return jax.jit(prog)


@lru_cache(maxsize=None)
def _seg_decode_program(P, SA, out_packed):
    """The segmented-path decode program: gather the chained lanes from
    the walk outputs, then the production entropy decode -> synthesis ->
    epilogue -> transfer packing. All big inputs are already on device
    (walk outputs + the replicated stream); only the tiny (L, 3) plan
    array [row, length, mode] crosses the link."""
    import jax

    from .ops.entropy import decode_residual_bits_stream
    from .ops.epilogue import apply_epilogue, pack_int16_pairs
    from .ops.predict import synthesize_best
    from .pipeline import _split_lanes, _FETCH_CHUNKS

    def prog(stream, order, shift, wasted, ps, pbits, flags, warm, coefs,
             ks, bases, plan):
        jnp = _jnp()
        rows = plan[:, 0]
        lengths = plan[:, 1]
        L = rows.shape[0]
        pair_modes = plan[:, 2].reshape(L // 2, 2)[:, 0]
        g = lambda a: jnp.take(a, rows, axis=0)
        x = decode_residual_bits_stream(
            stream, g(bases), g(ks)[:, :P], g(ps), g(order), g(pbits),
            g(flags), g(warm), lengths, n_parts_max=P, sa=SA)
        out = synthesize_best(x, g(coefs), g(shift), g(order), lengths)
        out = apply_epilogue(out, g(wasted), pair_modes)
        if out_packed:
            packed, flag = pack_int16_pairs(out)
            return out, flag, _split_lanes(packed, _FETCH_CHUNKS)
        return out, _split_lanes(out, _FETCH_CHUNKS)

    return jax.jit(prog)


def decode_streams_segmented(datas, lane_quantum=None):
    """Decode FLAC streams with on-device segmentation + demux.

    Drop-in sibling of ``pipeline.decode_streams_device`` (returns a
    ``DeviceDecoded``); the host never walks payload bytes. When any
    stream cannot ride the device-demux path -- a walk-rejected frame
    (escaped partitions, > 64 partitions, oversized codes...), a chain
    break, > 2 channels, an oversized batch -- the WHOLE batch falls back
    to the host-walk bits pipeline, which reproduces the reference's
    exact error behavior. (Fallbacks are per-batch for simplicity; the
    host path is itself bit-exact, so this only affects speed.)
    """
    from . import native
    from .native.binding import _read_metadata
    from .ops.segment import find_frame_headers
    from .pipeline import (DecodedStream, DeviceDecoded, _BucketDispatch,
                           _LITTLE_ENDIAN, _L_QUANTUM, bucket_shape,
                           _T_BUCKETS, extract_streams_bits)
    from .pipeline_bits import (_STREAM_QUANTUM, _crc_program,
                                _P_CLASSES, decode_raw_bits_device)

    jnp = _jnp()
    if lane_quantum is None:
        lane_quantum = _L_QUANTUM

    # CLAXON_TPU_SEG_DEBUG=1: per-stage host-CPU accounting (diagnostic).
    import os
    import time as _time
    if os.environ.get("CLAXON_TPU_SEG_DEBUG"):
        _marks = [("start", _time.process_time())]
        _mark = lambda label: _marks.append((label, _time.process_time()))
    else:
        _marks = None
        _mark = lambda label: None

    def _fallback():
        braws, mode = extract_streams_bits(datas, native)
        return decode_raw_bits_device(braws, lane_quantum, mode)

    if not native.available():
        from .pipeline import decode_streams_device
        return decode_streams_device(datas, use_native=False,
                                     lane_quantum=lane_quantum)
    if sum(len(d) for d in datas) >= (1 << 27):
        return _fallback()  # int32 bit positions cap, like stream mode

    # ---- host metadata parse (headers only; no payload bytes touched).
    sis, payloads = [], []
    for d in datas:
        si, pos = _read_metadata(d)
        sis.append(si)
        payloads.append(np.frombuffer(d, np.uint8)[pos:])

    _mark("metadata")
    # ---- one shared word-aligned upload (the pipeline_bits layout).
    sizes = [p.nbytes for p in payloads]
    wcs = [(s + 3) // 4 for s in sizes]
    total_w = sum(wcs)
    total_q = -(-max(total_w, 1) // _STREAM_QUANTUM) * _STREAM_QUANTUM
    buf = np.zeros(total_q * 4, dtype=np.uint8)
    byte_off = []
    off = 0
    for p, s, wc in zip(payloads, sizes, wcs):
        buf[off:off + s] = p
        byte_off.append(off)
        off += wc * 4
    # Ship the raw little-endian words; the big-endian byte packing the
    # kernels expect is one on-device bswap (saves a full host pass over
    # the payload -- the .astype byteswap copy).
    stream_dev = _bswap_program()(jnp.asarray(buf.view(np.int32)))
    upload_bytes = stream_dev.nbytes

    _mark("upload")
    # ---- device segmentation: sync scan + header CRC-8 validation.
    # Sync-pattern hits are rare (~2/64Ki random byte pairs) and real
    # frames span KBs, so a bytes/512 estimate overshoots comfortably;
    # the count check below grows capacity in the rare overflow.
    cap = 256
    est = total_w * 4 // 512 + 1
    while cap < est and cap < (1 << 22):
        cap *= 2
    import jax
    while True:
        # ONE overlapped d2h for all three results (device_get starts
        # every copy before waiting; three np.asarray calls would pay
        # three serial tunnel round trips).
        cpos, cvalid, count = jax.device_get(
            find_frame_headers(stream_dev, total_q * 4, cap))
        count = int(count)
        if count <= cap:
            break
        while cap < count:
            cap *= 2
    cpos = cpos[:count]
    cvalid = cvalid[:count]

    _mark("segment")
    # ---- host header-field decode (~16 bytes per candidate).
    ends = np.asarray(byte_off, np.int64) + np.asarray(sizes, np.int64)
    c_si = np.searchsorted(ends, cpos, side="right")
    fields = host_header_fields(buf, cpos)
    si_bps = np.asarray([si.bits_per_sample for si in sis], np.int64)
    si_nch = np.asarray([si.channels for si in sis], np.int64)
    bps = np.where(fields["bps_code"] == 0, si_bps[c_si],
                   _BPS_TABLE[np.minimum(fields["bps_code"], 7)])
    walkable = (cvalid & fields["ok"] & (fields["nch"] <= 2)
                & (fields["nch"] == si_nch[c_si])
                & (fields["block_size"] >= 1)
                & (fields["block_size"] <= _T_BUCKETS[-1]))

    _mark("headers")
    # ---- walk groups: (T bucket, nch) over ALL plausible candidates
    # (false positives are walked too -- they lose the chain race below).
    tbv = np.asarray(_T_BUCKETS, np.int64)
    tb = np.where(fields["block_size"] >= 1,
                  tbv[np.minimum(np.searchsorted(tbv, fields["block_size"]),
                                 len(tbv) - 1)], 0)
    groups = {}
    for ci in np.flatnonzero(walkable):
        groups.setdefault((int(tb[ci]), int(fields["nch"][ci])),
                          []).append(int(ci))

    walk_out, walk_meta = {}, {}
    for (T, nch), cis in groups.items():
        F = -(-len(cis) // _WALK_QUANTUM) * _WALK_QUANTUM
        start_bits = np.zeros(F, np.int32)
        w_bs = np.zeros(F, np.int32)
        w_modes = np.zeros(F, np.int32)
        w_bps = np.ones(F, np.int32)
        idx = np.asarray(cis)
        start_bits[:len(cis)] = (cpos[idx] + fields["hlen"][idx]) * 8
        w_bs[:len(cis)] = fields["block_size"][idx]
        w_modes[:len(cis)] = fields["mode"][idx]
        w_bps[:len(cis)] = bps[idx]
        outs, summary = _walk_program(T, nch, F)(
            stream_dev, jnp.asarray(start_bits), jnp.asarray(w_bs),
            jnp.asarray(w_modes), jnp.asarray(w_bps))
        upload_bytes += 4 * F * 4
        walk_out[(T, nch)] = outs
        walk_meta[(T, nch)] = np.asarray(summary)

    _mark("walks")
    # ---- per-candidate walk summaries, scattered back to global arrays
    # (all planning below is vectorized numpy; no per-frame Python).
    walk_ok = np.zeros(count, bool)
    end_byte = np.zeros(count, np.int64)
    np_max_c = np.zeros(count, np.int64)
    sa_max_c = np.zeros(count, np.int64)
    wi_of = np.zeros(count, np.int64)
    for key, cis in groups.items():
        m = walk_meta[key]
        idx = np.asarray(cis)
        walk_ok[idx] = m[:len(cis), 0].astype(bool)
        end_byte[idx] = m[:len(cis), 1]
        np_max_c[idx] = m[:len(cis), 2]
        sa_max_c[idx] = m[:len(cis), 3]
        wi_of[idx] = np.arange(len(cis))

    _mark("scatter")
    # ---- chain per stream: ends -> next starts; must tile the payload.
    # Fast path: no false positives -- every candidate links to the next.
    ok_c = walkable & walk_ok
    byte_off_a = np.asarray(byte_off, np.int64)
    chains = []
    for si_idx, size in enumerate(sizes):
        idx = np.flatnonzero(c_si == si_idx)
        if idx.size == 0:
            if size != 0:
                return _fallback()
            chains.append(idx)
            continue
        local = cpos[idx] - byte_off_a[si_idx]
        nxt = end_byte[idx] - byte_off_a[si_idx] + 2
        if ok_c[idx].all() and local[0] == 0 and nxt[-1] == size \
                and np.array_equal(nxt[:-1], local[1:]):
            chains.append(idx)
            continue
        # Slow path (a payload byte mimicked a header): walk the chain.
        pos_map = {int(p): int(ci) for p, ci in zip(local, idx)}
        exp, chain, good = 0, [], True
        while exp < size:
            ci = pos_map.get(exp)
            if ci is None or not ok_c[ci]:
                good = False
                break
            chain.append(ci)
            nxt1 = int(end_byte[ci]) + 2 - int(byte_off_a[si_idx])
            if nxt1 <= exp:
                good = False
                break
            exp = nxt1
        if not good or exp != size:
            return _fallback()
        chains.append(np.asarray(chain, np.int64))

    _mark("chains")
    # ---- results + output offsets (chain order IS stream order).
    results, pcms = [], []
    out0_c = np.zeros(count, np.int64)
    chained_mask = np.zeros(count, bool)
    crc_starts, crc_ends = [], []
    for si_idx, (si, chain) in enumerate(zip(sis, chains)):
        bs_v = fields["block_size"][chain]
        total = int(bs_v.sum()) if chain.size else 0
        pcm = np.zeros((total, si.channels), dtype=np.int32)
        pcms.append(pcm)
        t_raw = fields["time_raw"][chain]
        times = np.where(fields["variable"][chain] != 0, t_raw,
                         t_raw * bs_v)
        results.append(DecodedStream(streaminfo=si, pcm=pcm,
                                     frame_times=times.tolist(),
                                     frame_sizes=bs_v.tolist()))
        if chain.size:
            out0_c[chain] = np.cumsum(bs_v) - bs_v
            chained_mask[chain] = True
            crc_starts.append(cpos[chain])
            crc_ends.append(end_byte[chain] + 2)

    _mark("results")
    # ---- decode dispatches: (walk group, P class) buckets.
    _P_CLASSES_V = np.asarray(_P_CLASSES, np.int64)
    dispatches, plans = [], []
    for (T, nch), cis in groups.items():
        g_idx = np.asarray(cis)[chained_mask[cis]]
        if g_idx.size == 0:
            continue
        pcls = _P_CLASSES_V[np.minimum(
            np.searchsorted(_P_CLASSES_V, np.maximum(np_max_c[g_idx], 1)),
            len(_P_CLASSES_V) - 1)]
        for P in np.unique(pcls):
            sub = g_idx[pcls == P]
            # Stream-then-position order makes runs contiguous.
            sub = sub[np.lexsort((out0_c[sub], c_si[sub]))]
            n_frames = sub.size
            n_lanes = n_frames * nch
            L, Tb = bucket_shape(n_lanes, T, lane_quantum)
            SA = _sa_class(int(sa_max_c[sub].max()))
            plan_arr = np.zeros((L, 3), np.int32)
            rows = (wi_of[sub, None] * nch +
                    np.arange(nch)[None, :]).reshape(-1)
            bs_v = fields["block_size"][sub]
            plan_arr[:n_lanes, 0] = rows
            plan_arr[:n_lanes, 1] = np.repeat(bs_v, nch)
            plan_arr[:n_lanes, 2] = np.repeat(fields["mode"][sub], nch)
            si_v = c_si[sub]
            out0_v = out0_c[sub]
            brk = np.flatnonzero(
                (si_v[1:] != si_v[:-1]) | (bs_v[1:] != bs_v[:-1])
                | (out0_v[1:] != out0_v[:-1] + bs_v[:-1])) + 1
            starts_r = np.concatenate([[0], brk])
            ends_r = np.concatenate([brk, [n_frames]])
            plan = [(int(si_v[st]), int(out0_v[st]), int(en - st),
                     int(bs_v[st]), nch, int(st * nch))
                    for st, en in zip(starts_r, ends_r)]
            out_packed = (_LITTLE_ENDIAN and Tb % 2 == 0
                          and int(bps[sub].max()) <= 16)
            prog = _seg_decode_program(int(P), SA, out_packed)
            args = walk_out[(T, nch)] + (jnp.asarray(plan_arr),)
            upload_bytes += plan_arr.nbytes
            if out_packed:
                out, flag, chunks = prog(stream_dev, *args)
                dispatches.append(_BucketDispatch([], nch, out, chunks,
                                                  True, flag))
            else:
                out, chunks = prog(stream_dev, *args)
                dispatches.append(_BucketDispatch([], nch, out, chunks,
                                                  False))
            plans.append(plan)

    dd = DeviceDecoded(results, [], [], dispatches)
    dd._raw_plans = (plans, pcms)

    if crc_starts:
        starts = np.concatenate(crc_starts).astype(np.int32)
        ends_a = np.concatenate(crc_ends).astype(np.int32)
        n = len(starts)
        fq = 8
        while fq < n:
            fq *= 2
        se = np.stack([np.pad(starts, (0, fq - n)),
                       np.pad(ends_a, (0, fq - n))])
        vals = _crc_program(None)(stream_dev, jnp.asarray(se))
        dd.crc_check = (vals, n)
        upload_bytes += se.nbytes

    dd.upload_bytes = upload_bytes
    _mark("dispatch")
    if _marks is not None:
        deltas = [(b, round((t1 - t0) * 1e3, 3)) for (b, t1), (_, t0)
                  in zip(_marks[1:], _marks)]
        print("seg stage CPU ms:", deltas)
    return dd


