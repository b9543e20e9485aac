"""Fused on-device demux: sync scan + header parse + subframe walk.

One jitted program per (T, nch, cap, S) class that takes a group's raw
little-endian stream words and returns everything the decode planner
needs: the byte-swapped stream (device-resident, reused by the decode
and CRC programs), the walk descriptor arrays, and ONE packed
per-candidate summary array -- so a segmented decode costs exactly one
upload, one dispatch, and one small d2h fetch before the decode
dispatches. This replaces the three-dispatch, three-fetch flow
(segmentation scan -> host header decode -> walk) with a single
round trip; on a high-latency link the removed round trips dominate
the host-side cost of small batches.

Grouping contract: the caller groups streams by (streaminfo channel
count, block-size bucket of the streaminfo maximum block size) BEFORE
upload -- both known from metadata without touching payload bytes -- so
``T`` and ``nch`` are static. Frames whose header contradicts the
group's static shape (more channels, larger block) simply come back
not-walkable and break the chain; the caller falls back to the host
walk, which reproduces the reference's error behavior exactly.

Header grammar: the device twin of ``pipeline_seg.host_header_fields``
(reference `src/frame.rs:131-316`); subframe walk: ``ops.demux``.
"""

from functools import lru_cache

import numpy as np

__all__ = ["fused_demux", "fused_demux_async", "SUMMARY_COLS", "pick_cap",
           "pick_wcap"]

#: summary columns, per candidate (int64 after unpacking):
#: pos, valid, walk_ok, end_byte, n_parts_max, sa_max, block_size, mode,
#: time_lo, time_hi, variable, bps, hlen, nch_hdr.
#: CONTRACT: 'valid' is valid & WALKABLE (header parse + CRC-8 ok AND
#: shape-matched to the stream -- the same predicate the device uses to
#: compact walk lanes), NOT raw sync validity: the host's walk_rank =
#: cumsum(valid) must reproduce the device's compaction rank exactly
#: (pipeline_seg.py), so the two predicates must never diverge.
SUMMARY_COLS = ("pos", "valid", "walk_ok", "end_byte", "n_parts", "sa",
                "block_size", "mode", "time_lo", "time_hi", "variable",
                "bps", "hlen", "nch_hdr")

#: on-device packed form: 5 int32 words per candidate (the summary is
#: the per-batch d2h payload and rides the slow link every batch).
#: w0=pos, w1=end_byte, w2=time_lo,
#: w3=block_size(17)|hlen(5)|nch_hdr(4)|mode(2)|variable(1)|valid(1)|
#:    walk_ok(1),
#: w4=time_hi(4)|n_parts(7)|sa(9)|bps(6).
PACKED_WORDS = 5


def _unpack_summary(s):
    """(N, PACKED_WORDS) int32 -> (N, len(SUMMARY_COLS)) int64."""
    s = np.asarray(s).astype(np.int64)
    pos, end_byte, lo, w3, w4 = (s[:, k] for k in range(PACKED_WORDS))
    cols = {
        "pos": pos, "end_byte": end_byte, "time_lo": lo,
        "block_size": w3 & 0x1FFFF, "hlen": (w3 >> 17) & 31,
        "nch_hdr": (w3 >> 22) & 15, "mode": (w3 >> 26) & 3,
        "variable": (w3 >> 28) & 1, "valid": (w3 >> 29) & 1,
        "walk_ok": (w3 >> 30) & 1,
        "time_hi": w4 & 0xF, "n_parts": (w4 >> 4) & 127,
        "sa": (w4 >> 11) & 511, "bps": (w4 >> 20) & 63,
    }
    return np.stack([cols[c] for c in SUMMARY_COLS], axis=1)

#: stream-count padding quantum (compile classes for the per-stream
#: metadata arrays).
S_QUANTUM = 8

_BPS_TABLE = np.array([0, 8, 12, -1, 16, 20, 24, -1], np.int32)


#: candidate-capacity ceiling per group. The walk materializes per-lane
#: descriptor arrays (warm-up, coefficients, Rice parameters: ~600 B per
#: (candidate, channel) lane), so a sync-saturated payload (0xFFF8
#: repeated: a candidate every 2 bytes) must not be allowed to regrow the
#: walk capacity into GBs of lanes -- past this ceiling the segmented
#: path hands the batch to the host walk (DemuxOverflow), which handles
#: such streams at full speed. 2^18 lanes x 2 ch is ~300 MB of walk
#: arrays.
MAX_CAP = 1 << 18


class DemuxOverflow(Exception):
    """More sync candidates than MAX_CAP: take the host-walk path."""


#: HBM budget for one group's walk descriptor arrays. The walk emits
#: per-sample values (int32) + deltas (int8) per lane since round 5, so
#: lane capacity must be bounded in BYTES, not lanes: a sync-saturated
#: payload at a large T bucket would otherwise regrow the walk into
#: tens of GB. Past the budget the group takes the host walk (which
#: handles such streams at full speed), exactly like MAX_CAP.
MAX_WALK_BYTES = 2 << 30


def max_walk_lanes(T, nch):
    """Largest power-of-2 walk-lane capacity within MAX_WALK_BYTES."""
    per_cand = nch * (6 * ((T + 31) // 32) * 32 + 1024)
    cap = 256
    while cap * 2 * per_cand <= MAX_WALK_BYTES and cap < MAX_CAP:
        cap *= 2
    return cap


def pick_cap(n_bytes, frames_est=None):
    """Sync-candidate capacity class for a group payload.

    With a frame-count estimate (STREAMINFO total samples / min block
    size) the capacity is frames + a sync-mimic budget (the 2-byte sync
    pattern hits ~n/32768 byte positions in random data; x4 margin for
    FF-heavy audio). ``PendingDemux.resolve`` re-dispatches with the
    next class on the rare overflow, so a tight cap costs at most one
    extra dispatch on first encounter, while an oversized one fetches
    dead summary rows every batch. Without an estimate: bytes/512 (a
    frame can be ~14 bytes in the degenerate 192-sample 8-bit mono
    constant case). A lying STREAMINFO cannot inflate the estimate past
    the physical frame floor (~14 bytes/frame) or MAX_CAP."""
    if frames_est is None:
        est = n_bytes // 512 + 1
    else:
        est = min(frames_est, n_bytes // 14 + 2) + n_bytes // 8192 + 64
    cap = 256
    while cap < est and cap < MAX_CAP:
        cap *= 2
    return cap


def pick_wcap(n_bytes, frames_est=None):
    """Walk-lane capacity class: how many candidates the subframe walk
    materializes descriptor arrays for. Much tighter than ``pick_cap``:
    only candidates that survive the full header parse + CRC-8 AND match
    the group's static shape are walked (the fused program compacts them
    to the front first), and CRC-8 filters ~255/256 of sync mimics -- so
    the estimate is the frame count plus a thin mimic budget. The walk's
    cost scales linearly with this capacity (VERDICT r3 item 1c), so a
    tight class directly buys demux throughput; overflow re-dispatches
    with the next class exactly like the sync cap."""
    if frames_est is None:
        est = n_bytes // 512 + 1
    else:
        est = min(frames_est, n_bytes // 14 + 2) + n_bytes // (1 << 21) + 32
    cap = 256
    while cap < est and cap < MAX_CAP:
        cap *= 2
    return cap


@lru_cache(maxsize=None)
def _program(T, nch, cap, wcap, S):
    import jax
    import jax.numpy as jnp

    from .demux import walk_frames
    from .segment import (MAX_HEADER_BYTES, _leading_ones8,
                          find_frame_headers)
    from ..pipeline_seg import _WALK_KEYS

    bps_table = jnp.asarray(_BPS_TABLE)

    def prog(words_le, n_bytes, stream_ends, si_bps):
        # words_le: (W,) int32 raw little-endian upload; byte i of the
        # stream is word i >> 2, lane i & 3. One on-device bswap gives
        # the big-endian packing every downstream kernel indexes.
        w = words_le
        stream = (((w & 0xFF) << 24) | ((w & 0xFF00) << 8)
                  | ((w >> 8) & 0xFF00) | ((w >> 24) & 0xFF))

        positions, valid, count, win = find_frame_headers(stream, n_bytes,
                                                          cap)

        # ---- header fields (device twin of host_header_fields), decoded
        # from the (cap, 16) window the sync scan already gathered.
        p = jnp.maximum(positions, 0)
        variable = win[:, 1] & 1
        bs_code = win[:, 2] >> 4
        sr_code = win[:, 2] & 15
        ca = win[:, 3] >> 4
        bps_code = (win[:, 3] >> 1) & 7
        nch_hdr = jnp.where(ca < 8, ca + 1, 2)
        mode = jnp.where(ca < 8, 0, ca - 7)

        # UTF-8 frame/sample number: value needs up to 36 bits -> split
        # halves (the TPU lanes are 32-bit; the host recombines).
        lead = _leading_ones8(win[:, 4])
        ulen = jnp.where(lead == 0, 1, lead)
        mask0 = jnp.asarray([0x7F, 0, 0x1F, 0x0F, 0x07, 0x03, 0x01, 0],
                            jnp.int32)
        lo = win[:, 4] & mask0[jnp.minimum(lead, 7)]
        hi = jnp.zeros_like(lo)
        for j in range(1, 7):
            use = j < ulen
            hi = jnp.where(use, (hi << 6) | ((lo >> 26) & 0x3F), hi)
            lo = jnp.where(use, (lo << 6) | (win[:, 4 + j] & 0x3F), lo)

        bs_extra = jnp.where(bs_code == 6, 1, 0) \
            + jnp.where(bs_code == 7, 2, 0)
        sr_extra = jnp.where(sr_code == 12, 1, 0) \
            + jnp.where((sr_code == 13) | (sr_code == 14), 2, 0)
        o = 4 + ulen
        b8 = jnp.take_along_axis(win, jnp.minimum(o, 15)[:, None],
                                 axis=1)[:, 0]
        b16 = (b8 << 8) | jnp.take_along_axis(
            win, jnp.minimum(o + 1, 15)[:, None], axis=1)[:, 0]
        block_size = jnp.select(
            [bs_code == 1, bs_code <= 5, bs_code == 6, bs_code == 7],
            [jnp.full_like(b8, 192),
             576 << jnp.maximum(bs_code - 2, 0), b8 + 1, b16 + 1],
            256 << jnp.maximum(bs_code - 8, 0))
        valid = valid & ~((bs_code == 7) & (b16 == 0xFFFF))
        hlen = o + bs_extra + sr_extra + 1  # + the CRC-8 byte

        # ---- per-candidate stream index + bps resolution.
        c_si = jnp.searchsorted(stream_ends, p, side="right")
        c_si = jnp.minimum(c_si, S - 1)
        bps = jnp.where(bps_code == 0, si_bps[c_si],
                        bps_table[jnp.minimum(bps_code, 7)])

        # ---- compact the walkable candidates to the front and walk ONLY
        # those ``wcap`` lanes (VERDICT r3 item 1c: the walk's cost is
        # linear in lanes, and CRC-8 + shape checks kill ~all mimics).
        # The host recomputes this exact rank from the summary's valid
        # bit (bit 29 = walkable), so no extra mapping crosses the link.
        walkable = (valid & (nch_hdr == nch) & (bps > 0)
                    & (block_size >= 1) & (block_size <= T))
        wk32 = walkable.astype(jnp.int32)
        walk_count = wk32.sum().astype(jnp.int32)
        rank = jnp.cumsum(wk32) - 1
        tgt = jnp.where(walkable, jnp.minimum(rank, wcap), wcap)
        cand = jnp.full(wcap + 1, cap, jnp.int32).at[tgt].set(
            jnp.arange(cap, dtype=jnp.int32), mode="drop")[:-1]
        live = cand < cap
        ci = jnp.minimum(cand, cap - 1)
        start_bits = jnp.where(live, ((p + hlen) * 8)[ci], 0)
        w_bs = jnp.where(live, block_size[ci], 0)
        w_mode = jnp.where(live, mode[ci], 0)
        w_bps = jnp.where(live, bps[ci], 1)
        out, end_bits_c, walk_ok_c = walk_frames(
            stream, start_bits, w_bs, w_mode, w_bps, T=T, nch=nch)

        # Scatter the summary-visible walk results back to candidate
        # order (wcap-sized scatter: cheap; cand == cap rows drop).
        def back(x):
            return jnp.zeros(cap, x.dtype).at[cand].set(x, mode="drop")

        walk_ok = back(walk_ok_c)
        end_bits = back(end_bits_c)
        np_f = back(out["n_parts"].reshape(wcap, nch).max(axis=1))
        sa_f = back(out["sa_words"].reshape(wcap, nch).max(axis=1))
        # Packed summary (see PACKED_WORDS): fields that only matter for
        # chained lanes are clamped into their widths -- walk-ok lanes
        # are in range by construction (n_parts <= 64, sa <= 64,
        # bps <= 32, hlen <= 16, time <= 36 bits), and not-ok lanes are
        # never chained.
        w3 = (jnp.clip(block_size, 0, 0x1FFFF)
              | (jnp.clip(hlen, 0, 31) << 17)
              | (jnp.clip(nch_hdr, 0, 15) << 22)
              | (jnp.clip(mode, 0, 3) << 26)
              | ((variable & 1) << 28)
              | ((valid & walkable).astype(jnp.int32) << 29)
              | (walk_ok.astype(jnp.int32) << 30))
        w4 = ((hi & 0xF)
              | (jnp.clip(np_f, 0, 127) << 4)
              | (jnp.clip(sa_f, 0, 511) << 11)
              | (jnp.clip(bps, 0, 63) << 20))
        summary = jnp.stack([positions, end_bits >> 3, lo, w3, w4],
                            axis=1)
        counts = jnp.stack([count, walk_count])
        return stream, tuple(out[k] for k in _WALK_KEYS), summary, counts

    return jax.jit(prog, static_argnames=("n_bytes",))


class PendingDemux:
    """An in-flight fused-demux dispatch: the program has been launched
    and the summary/count d2h copies started (``copy_to_host_async``), so
    the round trip overlaps whatever the caller does before ``resolve()``
    -- uploading the next group, planning the previous batch. ``resolve``
    blocks on the fetch and transparently re-dispatches with a larger
    candidate capacity on the rare overflow."""

    def __init__(self, words_le, n_bytes, T, nch, ends_d, bps_d, cap,
                 wcap, S):
        self._key = (words_le, n_bytes, T, nch, ends_d, bps_d, S)
        self._wcap_max = max_walk_lanes(T, nch)
        self._dispatch(cap, min(wcap, self._wcap_max))

    def _dispatch(self, cap, wcap):
        words_le, n_bytes, T, nch, ends_d, bps_d, S = self._key
        self.cap = cap
        self.wcap = wcap
        self.stream, self.walk, self._summary, self._counts = \
            _program(T, nch, cap, wcap, S)(words_le, n_bytes, ends_d,
                                           bps_d)
        self._summary.copy_to_host_async()
        self._counts.copy_to_host_async()

    def resolve(self):
        """(summary (np, count rows, SUMMARY_COLS layout), count) --
        blocks on the fetch, unpacks the 5-word device form. Re-dispatches
        with the next capacity class when either the sync-candidate or the
        walk-lane capacity overflowed; raises DemuxOverflow past MAX_CAP
        (caller falls back to the host walk)."""
        while True:
            counts = np.asarray(self._counts)
            count, walk_count = int(counts[0]), int(counts[1])
            if count <= self.cap and walk_count <= self.wcap:
                return _unpack_summary(
                    np.asarray(self._summary)[:count]), count
            cap, wcap = self.cap, self.wcap
            while cap < count:
                cap *= 2
            while wcap < walk_count:
                wcap *= 2
            if cap > MAX_CAP or wcap > min(MAX_CAP, self._wcap_max):
                raise DemuxOverflow(
                    f"{count} sync candidates / {walk_count} walk lanes "
                    f"> cap {MAX_CAP} / {min(MAX_CAP, self._wcap_max)}")
            self._dispatch(cap, wcap)


def fused_demux_async(words_le, n_bytes, T, nch, stream_ends, si_bps,
                      frames_est=None):
    """Launch the fused program and START the summary fetch; the caller
    overlaps host/link work with the round trip and calls ``resolve()``."""
    import jax.numpy as jnp

    S = -(-max(len(stream_ends), 1) // S_QUANTUM) * S_QUANTUM
    ends = np.full(S, n_bytes, np.int32)
    ends[:len(stream_ends)] = stream_ends
    bps_a = np.ones(S, np.int32)
    bps_a[:len(si_bps)] = si_bps
    return PendingDemux(words_le, n_bytes, T, nch, jnp.asarray(ends),
                        jnp.asarray(bps_a), pick_cap(n_bytes, frames_est),
                        pick_wcap(n_bytes, frames_est), S)


def fused_demux(words_le, n_bytes, T, nch, stream_ends, si_bps,
                frames_est=None):
    """Synchronous form: dispatch + ONE d2h round trip. Returns
    (stream_be, walk_arrays, summary (np, count rows), count)."""
    p = fused_demux_async(words_le, n_bytes, T, nch, stream_ends, si_bps,
                          frames_est)
    summary, count = p.resolve()
    return p.stream, p.walk, summary, count
