"""Batched TPU decode pipeline: the framework's flagship path.

Wiring (SURVEY.md section 7): host demux (``claxon_tpu.native`` C++, or the
Python ``claxon_tpu.extract`` fallback) walks the bit-serial stream once,
verifies CRCs, and emits per-(frame, channel) descriptors; this module
buckets those descriptors into fixed XLA shapes, dispatches ONE compiled
device program per bucket (synthesis + wasted-bits + stereo decorrelation,
fused by XLA), and reassembles the PCM.

Shape discipline: XLA compiles one program per (lanes, time) bucket, so both
axes are padded to a small set of bucket sizes; with the default 4096-sample
blocks of real-world FLAC, a whole file usually hits a single bucket and the
program is compiled exactly once per process.
"""

from dataclasses import dataclass
from functools import lru_cache
from typing import List

import numpy as np

from .extract import extract_stream, StreamBatch, MODE_CODES
from .ops.predict import synthesize, pack_coefficients, ORDER_MAX
from .ops.epilogue import (apply_epilogue, pack_int16_pairs,
                           unpack_int16_pairs)

__all__ = ["decode_stream", "decode_streams", "decode_batch",
           "decode_batches", "decode_streams_device", "DeviceDecoded",
           "DecodedStream", "bucket_shape", "device_decode_bucket"]

# Time-axis bucket sizes: the common FLAC block sizes plus power-of-two
# fill-ins, so a stream with one block size compiles exactly one program.
_T_BUCKETS = (64, 192, 256, 576, 1024, 1152, 2048, 2304, 4096, 4608,
              8192, 16384, 32768, 65535)
_L_QUANTUM = 128  # lane-axis padding quantum (one VPU lane row)


def bucket_shape(n_lanes, block_size, lane_quantum=_L_QUANTUM):
    """The padded (L, T) compile shape for a group of subframes."""
    if block_size > _T_BUCKETS[-1]:
        from .error import fmt_err
        fmt_err("invalid block size, exceeds 65535")
    for t in _T_BUCKETS:
        if block_size <= t:
            break
    l = ((n_lanes + lane_quantum - 1) // lane_quantum) * lane_quantum
    return max(l, lane_quantum), t


def _jnp():
    import jax.numpy as jnp
    return jnp


# Device-to-host results are fetched as this many independent lane-slice
# chunks, copied concurrently (copy_to_host_async): on links where a single
# large transfer is latency- or window-limited, concurrent chunks recover
# the bandwidth (measured on the tunneled link: 8 chunks ~21 MB/s, 128
# chunks ~33-48 MB/s).
_FETCH_CHUNKS = 128

# The int16-pair transfer packing reinterprets int32 words as int16 pairs
# via numpy views, which is only correct on little-endian hosts (every TPU
# host is; the guard keeps the pipeline bit-exact anywhere).
import sys as _sys

_LITTLE_ENDIAN = _sys.byteorder == "little"


def _split_lanes(a, n):
    """Split lanes into at most n nonempty, size-balanced chunks covering
    every lane (L need not divide n)."""
    L = a.shape[0]
    n = max(1, min(n, L))
    step = -(-L // n)  # ceil
    return tuple(a[i:i + step] for i in range(0, L, step))


@lru_cache(maxsize=None)
def _decode_program(in_packed, out_packed, chunked=True):
    """The fused per-bucket device program, compiled once per (shape,
    packing) combination. Input/output int16-pair packing halves the bytes
    crossing the host link for 16-bit audio (see ops.epilogue); the
    transfer form is pre-split into fetch chunks inside the program.
    ``chunked=False`` omits the transfer form entirely (callers that keep
    the result on device, or fetch it whole)."""
    import jax

    from .ops.predict import synthesize_best

    @jax.jit
    def prog(x, coefs, shifts, orders, wasted, pair_modes, lengths):
        if in_packed:
            x = unpack_int16_pairs(x)
        out = synthesize_best(x, coefs, shifts, orders, lengths)
        out = apply_epilogue(out, wasted, pair_modes)
        if not chunked:
            return out
        if out_packed:
            packed, flag = pack_int16_pairs(out)
            return out, flag, _split_lanes(packed, _FETCH_CHUNKS)
        return out, _split_lanes(out, _FETCH_CHUNKS)

    return prog


def device_decode_bucket(x, coefs, shifts, orders, wasted, pair_modes,
                         lengths=None):
    """Run the fused device program on one bucket. All arrays pre-padded;
    lanes pair-aligned (see ops.epilogue lane layout contract)."""
    if lengths is None:
        lengths = np.full(x.shape[0], x.shape[1], dtype=np.int32)
    return _decode_program(False, False, chunked=False)(
        x, coefs, shifts, orders, wasted, pair_modes, lengths)


def _pack_input_i16(x):
    """Host-side int16-pair packing of an (L, T) int32 bucket whose values
    all fit int16 (T even): one copy, then a zero-copy int32 view."""
    L, T = x.shape
    x16 = np.ascontiguousarray(x.reshape(L, T // 2, 2).astype(np.int16))
    return x16.view(np.int32).reshape(L, T // 2)


@dataclass
class DecodedStream:
    """Decoded PCM plus stream metadata."""
    streaminfo: object
    #: (total_samples, channels) int32, channels interleaved on axis 1.
    pcm: np.ndarray
    #: first inter-channel sample number of each frame
    frame_times: List[int]
    #: block size of each frame
    frame_sizes: List[int]


def group_frames(frames, lane_quantum=_L_QUANTUM):
    """Group frame indices by (block_size bucket, channels)."""
    groups = {}
    for i, f in enumerate(frames):
        key = (bucket_shape(0, f.block_size, lane_quantum)[1], f.channels)
        groups.setdefault(key, []).append(i)
    return groups


def pack_bucket(frames, frame_idx, n_ch, t_bucket, lane_quantum=_L_QUANTUM):
    """Pack one group of frames into the padded device-bucket arrays.

    Returns (x, coefs, shifts, orders, wasted, pair_modes, lengths), all
    padded to the (L, T) = ``bucket_shape`` compile shape, lanes
    pair-aligned; ``lengths`` holds each lane's valid sample count.
    """
    n_lanes = len(frame_idx) * n_ch
    L, T = bucket_shape(n_lanes, t_bucket, lane_quantum)

    x = np.zeros((L, T), dtype=np.int32)
    coef_lists = []
    shifts = np.zeros(L, dtype=np.int32)
    orders = np.zeros(L, dtype=np.int32)
    wasted = np.zeros(L, dtype=np.int32)
    pair_modes = np.zeros(L // 2, dtype=np.int32)
    lengths = np.zeros(L, dtype=np.int32)

    lane = 0
    for fi in frame_idx:
        f = frames[fi]
        for sf in f.subframes:
            x[lane, :f.block_size] = sf.x
            coef_lists.append(sf.coefs)
            shifts[lane] = sf.shift
            orders[lane] = sf.order
            wasted[lane] = sf.wasted
            lengths[lane] = f.block_size
            lane += 1
        if f.mode != MODE_CODES["independent"] and n_ch == 2:
            # Stereo lanes are pair-aligned: this frame occupies lanes
            # (lane-2, lane-1) == pair (lane-2)//2.
            pair_modes[(lane - 2) // 2] = f.mode
    coef_lists.extend([[]] * (L - lane))
    coefs = pack_coefficients(coef_lists)
    return x, coefs, shifts, orders, wasted, pair_modes, lengths


def scatter_bucket(out, frames, frame_idx, n_ch, targets):
    """Scatter one bucket's device output back into interleaved PCM.

    ``targets[fi]`` is the (pcm array, sample offset) destination of frame
    ``fi`` -- frames in one bucket may belong to different output streams.
    """
    lane = 0
    for fi in frame_idx:
        f = frames[fi]
        pcm, o = targets[fi]
        for ci in range(n_ch):
            pcm[o:o + f.block_size, ci] = out[lane, :f.block_size]
            lane += 1


def decode_frames_to(frames, targets, decode_bucket=None,
                     lane_quantum=_L_QUANTUM):
    """Decode a list of FrameDescs through bucketed device dispatch,
    scattering each frame into its ``targets`` destination."""
    decode_bucket = decode_bucket or device_decode_bucket
    for (t_bucket, n_ch), frame_idx in group_frames(
            frames, lane_quantum).items():
        packed = pack_bucket(frames, frame_idx, n_ch, t_bucket, lane_quantum)
        out = np.asarray(decode_bucket(*packed))
        scatter_bucket(out, frames, frame_idx, n_ch, targets)


@dataclass
class _BucketDispatch:
    """One in-flight device bucket: frame membership + device results."""
    frame_idx: List[int]
    n_ch: int
    out_full: object            # (L, T) int32, on device
    chunks: tuple               # lane-sliced transfer form, on device
    packed: bool                # chunks are int16-pair packed
    flag: object = None         # () int32 overflow flag (packed only)


@dataclass
class DeviceDecoded:
    """Decoded PCM resident on the device, bucket-major.

    This is the native product of a TPU framework: decoded audio that a TPU
    consumer (a training input pipeline, a feature extractor) reads straight
    from HBM in fixed-shape buckets -- no host round trip. ``to_host()``
    materializes the reference-shaped per-stream PCM, fetching the int16
    packed form when the whole bucket fits (half the link bytes) and falling
    back to int32 when the device-side overflow flag fires (invalid
    streams' garbage-not-crash contract).

    REQUIRED for device-resident consumers: on the stream-mode bits path
    frame CRC-16 verification runs on device, and its verdict surfaces
    only through ``verify_crc()`` (which ``sync()``/``to_host()`` call).
    A consumer that reads HBM buckets directly and never calls any of the
    three will not learn of a frame CRC mismatch -- call ``sync()`` (the
    completion barrier + CRC check) before trusting bucket contents.
    """
    results: List["DecodedStream"]
    frames: list
    targets: list
    dispatches: List[_BucketDispatch]
    _fetch_started: bool = False
    #: set by the raw fast path: (scatter plans, per-stream pcm arrays)
    _raw_plans: tuple = None
    #: set by the stream-mode bits path when frame CRC-16 verification ran
    #: on device: ((F,) int32 device values, n valid). A nonzero value is
    #: a CRC mismatch (kernel covers frame bytes incl. the stored CRC).
    crc_check: tuple = None

    def block_until_ready(self):
        import jax
        jax.block_until_ready([d.out_full for d in self.dispatches])
        return self

    def sync(self):
        """Force completion of every bucket's compute by fetching one tiny
        dependent value per bucket. On backends whose block_until_ready
        acknowledges asynchronously (remote transports), this is the
        reliable completion barrier. Raises if the device CRC verifier
        flagged a frame."""
        for d in self.dispatches:
            probe = d.flag if d.flag is not None else d.out_full[:1, :1]
            np.asarray(probe)
        self.verify_crc()
        return self

    def verify_crc(self):
        """Surface a device-verified frame CRC-16 mismatch (stream-mode
        bits path; reference wording `src/frame.rs:752-763` semantics).
        Idempotent; called by sync()/to_host(), and the entry point for
        device-resident consumers that never fetch PCM. A detected
        mismatch latches: every later verify_crc()/sync()/to_host() on
        this batch re-raises (so a caught first error cannot be followed
        by silently fetching the corrupt PCM)."""
        if self.crc_check is None:
            return
        if self.crc_check == "failed":
            from .error import fmt_err
            fmt_err("frame CRC mismatch")
        pairs = (self.crc_check if isinstance(self.crc_check, list)
                 else [self.crc_check])
        if any(np.asarray(vals)[:n].any() for vals, n in pairs):
            self.crc_check = "failed"
            from .error import fmt_err
            fmt_err("frame CRC mismatch")
        self.crc_check = None

    def start_fetch(self):
        """Begin the device-to-host copies of every transfer chunk without
        waiting for them, so they overlap any host work done before
        ``to_host()`` (e.g. extracting the next batch). Idempotent."""
        if self._fetch_started:
            return self
        self._fetch_started = True
        if self.crc_check is not None and self.crc_check != "failed":
            pairs = (self.crc_check if isinstance(self.crc_check, list)
                     else [self.crc_check])
            for vals, _n in pairs:
                vals.copy_to_host_async()
        for d in self.dispatches:
            if d.flag is not None:
                d.flag.copy_to_host_async()
            for c in d.chunks:
                c.copy_to_host_async()
        return self

    def device_buckets(self):
        """[(frame_idx, n_ch, (L, T) int32 device array), ...].

        ``frame_idx`` indexes ``self.frames`` on the FrameDesc path; the
        raw native path carries no FrameDesc objects, so there it is []
        and the lane-to-stream mapping comes from ``lane_plans()``."""
        return [(d.frame_idx, d.n_ch, d.out_full) for d in self.dispatches]

    def lane_plans(self):
        """Per-bucket lane layout: a list (one entry per bucket, parallel
        to ``device_buckets()``) of run tuples
        ``(stream_index, out_sample_offset, n_frames, block_size,
        n_channels, first_lane)`` -- each run occupies lanes
        ``[first_lane, first_lane + n_frames * n_channels)`` frame-major,
        channel-minor. Available on both decode paths."""
        if self._raw_plans is not None:
            return [list(p) for p in self._raw_plans[0]]
        stream_of_pcm = {id(r.pcm): i for i, r in enumerate(self.results)}
        plans = []
        for d in self.dispatches:
            plan = []
            lane = 0
            for fi in d.frame_idx:
                f = self.frames[fi]
                # targets[fi] = (pcm, offset); recover the stream index by
                # identity of the pcm array.
                pcm, off = self.targets[fi]
                si_idx = stream_of_pcm[id(pcm)]
                plan.append((si_idx, off, 1, f.block_size, d.n_ch, lane))
                lane += d.n_ch
            plans.append(plan)
        return plans

    @staticmethod
    def _fetch_bucket(d):
        if d.packed and bool(np.asarray(d.flag).any()):
            return np.asarray(d.out_full)  # rare: invalid-stream garbage
        out = np.concatenate([np.asarray(c) for c in d.chunks])
        if d.packed:
            # (L, T//2) int32 -> (L, T) int16, little-endian view.
            out = out.view(np.int16)
        return out

    def to_host(self):
        self.start_fetch()
        if self._raw_plans is not None:
            plans, pcms = self._raw_plans
            for d, plan in zip(self.dispatches, plans):
                out = self._fetch_bucket(d)
                for si_idx, out0, nf, bs, n_ch, lane0 in plan:
                    pcm = pcms[si_idx]
                    # One strided copy per (run, channel): frames of a run
                    # are stream-consecutive, so their output rows are too.
                    for ci in range(n_ch):
                        pcm[out0:out0 + nf * bs, ci] = \
                            out[lane0 + ci:lane0 + nf * n_ch:n_ch,
                                :bs].reshape(-1)
            self.verify_crc()
            return self.results
        for d in self.dispatches:
            scatter_bucket(self._fetch_bucket(d), self.frames, d.frame_idx,
                           d.n_ch, self.targets)
        return self.results


def _dispatch_bucket(frames, frame_idx, n_ch, t_bucket, lane_quantum):
    """Pack one bucket and launch the device program asynchronously."""
    x, coefs, shifts, orders, wasted, pair_modes, lengths = pack_bucket(
        frames, frame_idx, n_ch, t_bucket, lane_quantum)
    L, T = x.shape

    # Input packing: when every value (residuals + warm-up) fits int16 and
    # T is even, ship half the bytes and unpack on device.
    in_packed = (_LITTLE_ENDIAN and T % 2 == 0 and
                 x.min() >= -32768 and x.max() <= 32767)
    if in_packed:
        x = _pack_input_i16(x)

    # Output packing: final PCM fits bps bits for valid streams; the device
    # flag guards invalid ones.
    out_packed = (_LITTLE_ENDIAN and T % 2 == 0 and
                  all(frames[fi].bps <= 16 for fi in frame_idx))

    jnp = _jnp()
    prog = _decode_program(in_packed, out_packed)
    args = (jnp.asarray(x), jnp.asarray(coefs), jnp.asarray(shifts),
            jnp.asarray(orders), jnp.asarray(wasted),
            jnp.asarray(pair_modes), jnp.asarray(lengths))
    if out_packed:
        out, flag, chunks = prog(*args)
        return _BucketDispatch(frame_idx, n_ch, out, chunks, True, flag)
    out, chunks = prog(*args)
    return _BucketDispatch(frame_idx, n_ch, out, chunks, False)


def frame_offsets(frames):
    """Output-sample start offset of each frame (len(frames)+1 entries)."""
    offsets = np.zeros(len(frames) + 1, dtype=np.int64)
    for i, f in enumerate(frames):
        offsets[i + 1] = offsets[i] + f.block_size
    return offsets


def decode_batch(batch: StreamBatch, decode_bucket=None,
                 lane_quantum=_L_QUANTUM) -> DecodedStream:
    """Decode an extracted StreamBatch through the device pipeline.

    ``decode_bucket`` overrides the device program (used by
    ``claxon_tpu.parallel`` to substitute the mesh-sharded step).
    """
    return decode_batches([batch], decode_bucket, lane_quantum)[0]


def _prepare_outputs(batches):
    """Allocate per-stream PCM and the flat frame/target lists."""
    from .error import fmt_err

    frames, targets, results = [], [], []
    for batch in batches:
        si = batch.streaminfo
        # The aggregated (total, channels) output requires a consistent
        # channel count; the streaming blocks() API handles per-frame
        # variation, but here it is a format error (crash-free reject).
        for f in batch.frames:
            if f.channels != si.channels:
                fmt_err("frame channel count does not match streaminfo")
        total = sum(f.block_size for f in batch.frames)
        pcm = np.zeros((total, si.channels), dtype=np.int32)
        offsets = frame_offsets(batch.frames)
        for i, f in enumerate(batch.frames):
            frames.append(f)
            targets.append((pcm, int(offsets[i])))
        results.append(DecodedStream(
            streaminfo=si, pcm=pcm,
            frame_times=[f.time for f in batch.frames],
            frame_sizes=[f.block_size for f in batch.frames]))
    return frames, targets, results


def decode_batches_device(batches, lane_quantum=_L_QUANTUM) -> DeviceDecoded:
    """Decode many StreamBatches into device-resident buckets.

    All buckets are dispatched before any result is awaited, so host
    packing, host-to-device transfer, and device compute overlap across
    buckets (JAX async dispatch).
    """
    frames, targets, results = _prepare_outputs(batches)
    dispatches = [
        _dispatch_bucket(frames, frame_idx, n_ch, t_bucket, lane_quantum)
        for (t_bucket, n_ch), frame_idx in
        group_frames(frames, lane_quantum).items()
    ]
    return DeviceDecoded(results, frames, targets, dispatches)


def decode_batches(batches, decode_bucket=None,
                   lane_quantum=_L_QUANTUM) -> List[DecodedStream]:
    """Decode many StreamBatches at once; frames from *all* streams share
    device buckets, so a corpus of short files still fills wide lanes --
    this is the production many-streams-per-chip serving path."""
    if decode_bucket is None:
        # start_fetch() at dispatch time lets the device-to-host copies
        # overlap the remaining host work (and, in pipelined callers, the
        # extraction of the next batch).
        return decode_batches_device(batches,
                                     lane_quantum).start_fetch().to_host()
    frames, targets, results = _prepare_outputs(batches)
    decode_frames_to(frames, targets, decode_bucket, lane_quantum)
    return results


# ---------------------------------------------------------------------------
# Raw fast path: bucket dispatch straight from the native extractor's flat
# arrays (claxon_tpu.native.extract_stream_raw), with bulk numpy copies over
# contiguous lane runs instead of per-frame Python objects.


def _t_bucket_of(bs):
    from bisect import bisect_left
    return _T_BUCKETS[bisect_left(_T_BUCKETS, bs)]


def decode_raw_batches_device(raws, lane_quantum=_L_QUANTUM):
    """Decode [(streaminfo, frames_buf, subs_buf, samples), ...] into a
    DeviceDecoded. Semantically identical to extracting FrameDescs and
    calling decode_batches_device; this path never materializes per-frame
    Python objects and copies samples in contiguous runs."""
    results, targets_meta = [], []   # targets_meta: per stream (pcm,)
    # Per-frame flat records:
    # (stream, bs, nch, mode, sub0, samp0, out_off, bps)
    from .error import fmt_err

    recs = []
    groups = {}
    for si_idx, (si, frames_buf, subs_buf, samples) in enumerate(raws):
        if np.any(frames_buf["channels"] != si.channels):
            fmt_err("frame channel count does not match streaminfo")
        bs_v = frames_buf["block_size"].astype(np.int64)
        nch_v = frames_buf["channels"].astype(np.int64)
        sub0_v = np.concatenate([[0], np.cumsum(nch_v)[:-1]])
        samp0_v = np.concatenate([[0], np.cumsum(bs_v * nch_v)[:-1]])
        out0_v = np.concatenate([[0], np.cumsum(bs_v)[:-1]])
        total = int(bs_v.sum())
        pcm = np.zeros((total, si.channels), dtype=np.int32)
        results.append(DecodedStream(
            streaminfo=si, pcm=pcm,
            frame_times=frames_buf["time"].tolist(),
            frame_sizes=frames_buf["block_size"].tolist()))
        targets_meta.append(pcm)
        for i in range(len(frames_buf)):
            rec = (si_idx, int(bs_v[i]), int(nch_v[i]),
                   int(frames_buf["mode"][i]), int(sub0_v[i]),
                   int(samp0_v[i]), int(out0_v[i]),
                   int(frames_buf["bps"][i]))
            key = (_t_bucket_of(bs_v[i]), rec[2])
            groups.setdefault(key, []).append(rec)

    dispatches = []
    scatter_plans = []  # parallel to dispatches: list of (rec, lane0)
    jnp = _jnp()
    native = _native_mod()
    fast_pack = native is not None and native.has_pack_helpers()
    for (t_bucket, n_ch), rlist in groups.items():
        n_lanes = len(rlist) * n_ch
        L, T = bucket_shape(n_lanes, t_bucket, lane_quantum)
        coefs = np.zeros((L, ORDER_MAX), dtype=np.int32)
        shifts = np.zeros(L, dtype=np.int32)
        orders = np.zeros(L, dtype=np.int32)
        wasted = np.zeros(L, dtype=np.int32)
        pair_modes = np.zeros(L // 2, dtype=np.int32)
        lengths = np.zeros(L, dtype=np.int32)

        # Pass 1 -- contiguous runs: consecutive frames of one stream with
        # one block size have contiguous sample/subframe spans in the flat
        # arrays. Also decide input packing (single C min/max pass per
        # run) before any sample copy, so the int16 path converts in one
        # fused native pass instead of copy + scan + astype.
        lane = 0
        plan = []
        runs = []  # (si_idx, p0, nl, bs, lane0)
        mn = mx = 0
        i = 0
        while i < len(rlist):
            j = i
            si_idx, bs = rlist[i][0], rlist[i][1]
            while (j + 1 < len(rlist) and rlist[j + 1][0] == si_idx
                   and rlist[j + 1][1] == bs
                   and rlist[j + 1][4] == rlist[j][4] + n_ch):
                j += 1
            run = rlist[i:j + 1]
            nl = len(run) * n_ch
            _si, frames_buf, subs_buf, samples = raws[si_idx]
            s0 = run[0][4]
            p0 = run[0][5]
            runs.append((si_idx, p0, nl, bs, lane))
            plan.append((si_idx, run[0][6], len(run), bs, n_ch, lane))
            if fast_pack:
                lo, hi = native.minmax(samples[p0:p0 + nl * bs])
                mn = min(mn, lo)
                mx = max(mx, hi)
            coefs[lane:lane + nl] = subs_buf["coefs"][s0:s0 + nl]
            shifts[lane:lane + nl] = subs_buf["shift"][s0:s0 + nl]
            orders[lane:lane + nl] = subs_buf["order"][s0:s0 + nl]
            wasted[lane:lane + nl] = subs_buf["wasted"][s0:s0 + nl]
            lengths[lane:lane + nl] = bs
            if n_ch == 2:
                pair_modes[lane // 2:lane // 2 + len(run)] = \
                    [r[3] for r in run]
            lane += nl
            i = j + 1

        # Pass 2 -- fill the bucket in its final transfer form.
        if fast_pack:
            in_packed = (_LITTLE_ENDIAN and T % 2 == 0 and
                         mn >= -32768 and mx <= 32767)
            if in_packed:
                x16 = np.zeros((L, T), dtype=np.int16)
                for si_idx, p0, nl, bs, lane0 in runs:
                    native.rows_to_i16(raws[si_idx][3][p0:p0 + nl * bs],
                                       nl, bs, x16, lane0)
                x = x16.view(np.int32)  # (L, T//2) little-endian pairs
            else:
                x = np.zeros((L, T), dtype=np.int32)
                for si_idx, p0, nl, bs, lane0 in runs:
                    x[lane0:lane0 + nl, :bs] = \
                        raws[si_idx][3][p0:p0 + nl * bs].reshape(nl, bs)
        else:
            x = np.zeros((L, T), dtype=np.int32)
            for si_idx, p0, nl, bs, lane0 in runs:
                x[lane0:lane0 + nl, :bs] = \
                    raws[si_idx][3][p0:p0 + nl * bs].reshape(nl, bs)
            in_packed = (_LITTLE_ENDIAN and T % 2 == 0 and
                         x.min(initial=0) >= -32768 and
                         x.max(initial=0) <= 32767)
            if in_packed:
                x = _pack_input_i16(x)
        out_packed = (_LITTLE_ENDIAN and T % 2 == 0 and
                      all(r[7] <= 16 for r in rlist))

        prog = _decode_program(in_packed, out_packed)
        args = (jnp.asarray(x), jnp.asarray(coefs), jnp.asarray(shifts),
                jnp.asarray(orders), jnp.asarray(wasted),
                jnp.asarray(pair_modes), jnp.asarray(lengths))
        if out_packed:
            out, flag, chunks = prog(*args)
            dispatches.append(
                _BucketDispatch([], n_ch, out, chunks, True, flag))
        else:
            out, chunks = prog(*args)
            dispatches.append(_BucketDispatch([], n_ch, out, chunks, False))
        scatter_plans.append(plan)

    dd = DeviceDecoded(results, [], [], dispatches)
    # Bind a raw-plan scatter: overrides the FrameDesc-based one.
    dd._raw_plans = (scatter_plans, targets_meta)
    return dd


def _native_mod():
    try:
        from . import native
        return native if native.available() else None
    except ImportError:
        return None


def _extract(data, use_native):
    if use_native:
        native = _native_mod()
        if native is not None:
            return native.extract_stream(data)
    return extract_stream(data)


def decode_stream(data, use_native=True) -> DecodedStream:
    """Decode a whole FLAC stream (bytes) through the TPU pipeline.

    ``use_native`` selects the C++ demux core when built; the Python
    extractor is the fallback (bit-identical, slower).
    """
    return decode_streams([data], use_native)[0]


def decode_streams(datas, use_native=True, decode_bucket=None,
                   lane_quantum=_L_QUANTUM) -> List[DecodedStream]:
    """Decode many FLAC streams in one batched device dispatch."""
    if decode_bucket is None:
        return decode_streams_device(
            datas, use_native, lane_quantum).start_fetch().to_host()
    return decode_batches([_extract(d, use_native) for d in datas],
                          decode_bucket, lane_quantum)


def decode_streams_pipelined(datas, batch_streams=8, depth=6,
                             use_native=True,
                             lane_quantum=_L_QUANTUM) -> List[DecodedStream]:
    """Decode a large corpus as overlapping batches: batch n+1 extracts
    on the host and uploads while batch n's PCM streams back (the
    software pipeline bench.py measures, as a library call). ``depth``
    bounds the in-flight batches (each holds its device buckets +
    transfer buffers). Default 6: d2h fetch responses queue behind
    in-flight h2d uploads on a serializing link, so the loop is
    round-trip-latency-bound and deeper helps (measured interleaved
    depth-3/6 A/B on the bench rig: 5.70/7.60 then 9.13/9.52 Ms/s
    across an improving link phase; depth 3 was ~8% over depth 1).
    Results are in input order. On the segmented path each batch's
    demux round trip additionally hides behind the next batch's upload
    (the async split)."""
    results = []
    in_flight = []
    pending = None

    def _land(p):
        dev = p.finish()
        dev.start_fetch()
        in_flight.append(dev)
        if len(in_flight) > depth:
            results.extend(in_flight.pop(0).to_host())

    for i in range(0, len(datas), batch_streams):
        h = decode_streams_device_async(datas[i:i + batch_streams],
                                        use_native, lane_quantum)
        if pending is not None:
            _land(pending)
        pending = h
    if pending is not None:
        _land(pending)
    for dev in in_flight:
        results.extend(dev.to_host())
    return results


def extract_streams_bits(datas, native):
    """Bits-path extraction for a batch: pick the entropy mode and the
    CRC placement, then walk every stream. Returns (braws, mode).

    CLAXON_TPU_ENTROPY selects the kernel: "stream" (default -- raw frame
    words ship once, chunk gather + in-chunk scan on device, minimal
    uplink) or "delta" (host-relocated slots + per-sample gap bytes,
    fully parallel). The stream kernel's chunk bases are int32 bit
    offsets into the batch-wide upload, so oversized batches fall back to
    delta. Stream mode ships the raw frame bytes, so frame CRC-16
    verification moves to the device verifier too (the host walk stays
    boundary-only); CLAXON_TPU_HOST_CRC=1 keeps it on the host.
    """
    import os

    mode = os.environ.get("CLAXON_TPU_ENTROPY", "stream")
    if mode not in ("stream", "delta"):
        mode = "stream"
    if mode == "stream" and sum(len(d) for d in datas) >= (1 << 27):
        mode = "delta"
    defer = (mode == "stream" and
             not os.environ.get("CLAXON_TPU_HOST_CRC"))
    braws = [native.extract_stream_bits(
        d, emit_slots=(mode == "delta"), defer_crc=defer) for d in datas]
    return braws, mode


#: per-process calibration cache for segmentation="auto":
#: None = not yet calibrated, else "host" | "device".
_SEG_AUTO = {"choice": None}


def _calibrate_segmentation(datas, use_native, lane_quantum):
    """Time sync'd decodes of ``datas`` through each segmentation and
    cache the faster path for the process (VERDICT r3 item 2). Both
    paths are warmed first so compiles don't bias the measurement; the
    winner's (already computed) result is returned so the calibration
    batch is not decoded again. Timing is min-of-2 per path, interleaved
    device/host/device/host: the tunnel's rate swings between
    minutes-long phases, and a single-shot comparison was observed
    picking the loser when a phase dip landed on one run (r05: mixed
    segmented 9.3 vs host-walk 8.1 Ms/s in the same bench, auto cached
    "host"). Either path surfaces the same errors (bit-exact contract),
    so a failing batch raises here exactly as it would at the first
    sync."""
    import time as _time

    d_seg = decode_streams_device(datas, use_native, lane_quantum,
                                  "device")
    if not getattr(d_seg, "segmented", False):
        if getattr(d_seg, "seg_engaged", False):
            # The fused demux really ran and every stream STILL fell
            # back (e.g. >32-bit codes everywhere): cache "host" so
            # auto doesn't re-pay the doomed upload + demux + summary
            # round trip on every subsequent batch.
            _SEG_AUTO["choice"] = "host"
        # Otherwise the path was rejected on shape alone (cheap);
        # don't cache: a later corpus may engage.
        return "host", d_seg
    d_seg.sync()
    decode_streams_device(datas, use_native, lane_quantum, "host").sync()
    t_dev = t_host = float("inf")
    d_host = None
    for _ in range(2):
        t0 = _time.perf_counter()
        d_seg = decode_streams_device(datas, use_native, lane_quantum,
                                      "device")
        d_seg.sync()
        t_dev = min(t_dev, _time.perf_counter() - t0)
        t0 = _time.perf_counter()
        d_host = decode_streams_device(datas, use_native, lane_quantum,
                                       "host")
        d_host.sync()
        t_host = min(t_host, _time.perf_counter() - t0)
    choice = "device" if t_dev < t_host else "host"
    _SEG_AUTO["choice"] = choice
    return choice, (d_seg if choice == "device" else d_host)


def decode_streams_device(datas, use_native=True,
                          lane_quantum=_L_QUANTUM,
                          segmentation=None) -> DeviceDecoded:
    """Decode many FLAC streams into device-resident PCM buckets -- the
    zero-host-round-trip path for feeding TPU consumers directly.

    With the native core available this takes the bits path (the entropy
    decode runs on-chip; see pipeline_bits and extract_streams_bits for
    the mode/CRC-placement knobs). CLAXON_TPU_NO_BITS=1 forces the legacy
    sample-shipping path. ``segmentation="device"`` (or
    CLAXON_TPU_SEGMENTATION=device) also moves frame segmentation and
    subframe demux onto the chip (pipeline_seg; the host stops walking
    payload bytes entirely). The default is ``"auto"``: measure both
    paths on the first batch that engages the device demux and use the
    faster one for the rest of the process -- the rule bench.py
    headlines (CLAXON_TPU_SEGMENTATION=host|device pins a path). All
    paths are bit-exact.
    """
    import os

    if segmentation is None:
        segmentation = os.environ.get("CLAXON_TPU_SEGMENTATION", "auto")
    if segmentation == "auto":
        segmentation = _SEG_AUTO["choice"]
        if segmentation is None:
            if (use_native and _native_mod() is not None
                    and not os.environ.get("CLAXON_TPU_NO_BITS")):
                _choice, dd = _calibrate_segmentation(
                    datas, use_native, lane_quantum)
                return dd
            segmentation = "host"
    if use_native:
        native = _native_mod()
        if native is not None:
            if not os.environ.get("CLAXON_TPU_NO_BITS"):
                if segmentation == "device":
                    from .pipeline_seg import decode_streams_segmented
                    return decode_streams_segmented(datas, lane_quantum)
                from .pipeline_bits import decode_raw_bits_device
                braws, mode = extract_streams_bits(datas, native)
                return decode_raw_bits_device(braws, lane_quantum, mode)
            raws = [native.extract_stream_raw(d) for d in datas]
            return decode_raw_batches_device(raws, lane_quantum)
    return decode_batches_device([_extract(d, use_native) for d in datas],
                                 lane_quantum)


class _PendingDeviceBatch:
    """Handle for an in-flight ``decode_streams_device_async`` batch."""

    def __init__(self, finish):
        self._finish = finish
        self._done = None

    def finish(self) -> DeviceDecoded:
        if self._done is None:
            self._done = self._finish()
            self._finish = None
        return self._done


def decode_streams_device_async(datas, use_native=True,
                                lane_quantum=_L_QUANTUM,
                                segmentation=None) -> _PendingDeviceBatch:
    """Two-stage form of ``decode_streams_device`` for overlapping
    batches: returns immediately once the batch's uploads and first-stage
    programs are dispatched; ``finish()`` completes planning and returns
    the ``DeviceDecoded``.

    The split only has substance on the segmented path, whose demux
    summary fetch is a full link round trip: begin the next batch before
    finishing the current one and that round trip hides behind the next
    batch's host work + upload instead of idling the link. The other
    paths have no mid-batch round trip, so they dispatch eagerly and
    ``finish()`` is a no-op.
    """
    import os

    if segmentation is None:
        segmentation = os.environ.get("CLAXON_TPU_SEGMENTATION", "auto")
    if segmentation == "auto":
        segmentation = _SEG_AUTO["choice"]
        if segmentation is None:
            # First auto batch: calibrate synchronously (the begin/finish
            # overlap only matters once a steady path is chosen).
            dd = decode_streams_device(datas, use_native, lane_quantum,
                                       "auto")
            return _PendingDeviceBatch(lambda: dd)
    if (use_native and segmentation == "device"
            and not os.environ.get("CLAXON_TPU_NO_BITS")
            and _native_mod() is not None):
        from .pipeline_seg import (begin_segmented, finish_segmented,
                                   _host_fallback)
        pending = begin_segmented(datas, lane_quantum)
        if pending is not None:
            return _PendingDeviceBatch(lambda: finish_segmented(pending))
        dd = _host_fallback(datas, lane_quantum)
        return _PendingDeviceBatch(lambda: dd)
    dd = decode_streams_device(datas, use_native, lane_quantum, segmentation)
    return _PendingDeviceBatch(lambda: dd)
