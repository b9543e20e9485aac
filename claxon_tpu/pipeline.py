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

from dataclasses import dataclass, field
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
    for t in _T_BUCKETS:
        if block_size <= t:
            break
    l = ((n_lanes + lane_quantum - 1) // lane_quantum) * lane_quantum
    return max(l, lane_quantum), t


def _jnp():
    import jax.numpy as jnp
    return jnp


@lru_cache(maxsize=None)
def _decode_program(in_packed, out_packed):
    """The fused per-bucket device program, compiled once per (shape,
    packing) combination. Input/output int16-pair packing halves the bytes
    crossing the host link for 16-bit audio (see ops.epilogue)."""
    import jax

    @jax.jit
    def prog(x, coefs, shifts, orders, wasted, pair_modes):
        if in_packed:
            x = unpack_int16_pairs(x)
        out = synthesize(x, coefs, shifts, orders)
        out = apply_epilogue(out, wasted, pair_modes)
        if out_packed:
            packed, flag = pack_int16_pairs(out)
            return out, packed, flag
        return out

    return prog


def device_decode_bucket(x, coefs, shifts, orders, wasted, pair_modes):
    """Run the fused device program on one bucket. All arrays pre-padded;
    lanes pair-aligned (see ops.epilogue lane layout contract)."""
    return _decode_program(False, False)(x, coefs, shifts, orders, wasted,
                                         pair_modes)


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

    Returns (x, coefs, shifts, orders, wasted, pair_modes), all padded to
    the (L, T) = ``bucket_shape`` compile shape, lanes pair-aligned.
    """
    n_lanes = len(frame_idx) * n_ch
    L, T = bucket_shape(n_lanes, t_bucket, lane_quantum)

    x = np.zeros((L, T), dtype=np.int32)
    coef_lists = []
    shifts = np.zeros(L, dtype=np.int32)
    orders = np.zeros(L, dtype=np.int32)
    wasted = np.zeros(L, dtype=np.int32)
    pair_modes = np.zeros(L // 2, dtype=np.int32)

    lane = 0
    for fi in frame_idx:
        f = frames[fi]
        for sf in f.subframes:
            x[lane, :f.block_size] = sf.x
            coef_lists.append(sf.coefs)
            shifts[lane] = sf.shift
            orders[lane] = sf.order
            wasted[lane] = sf.wasted
            lane += 1
        if f.mode != MODE_CODES["independent"] and n_ch == 2:
            # Stereo lanes are pair-aligned: this frame occupies lanes
            # (lane-2, lane-1) == pair (lane-2)//2.
            pair_modes[(lane - 2) // 2] = f.mode
    coef_lists.extend([[]] * (L - lane))
    coefs = pack_coefficients(coef_lists)
    return x, coefs, shifts, orders, wasted, pair_modes


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
    out_packed: object = None   # (L, T//2) int32, on device (16-bit path)
    flag: object = None         # () int32 overflow flag, on device


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
    """
    results: List["DecodedStream"]
    frames: list
    targets: list
    dispatches: List[_BucketDispatch]

    def block_until_ready(self):
        import jax
        jax.block_until_ready([d.out_full for d in self.dispatches])
        return self

    def device_buckets(self):
        """[(frame_idx, n_ch, (L, T) int32 device array), ...]"""
        return [(d.frame_idx, d.n_ch, d.out_full) for d in self.dispatches]

    def to_host(self):
        for d in self.dispatches:
            if d.out_packed is not None and not int(np.asarray(d.flag)):
                # Little-endian reinterpret: (L, T//2) int32 -> (L, T) int16.
                out = np.asarray(d.out_packed).view(np.int16)
            else:
                out = np.asarray(d.out_full)
            scatter_bucket(out, self.frames, d.frame_idx, d.n_ch,
                           self.targets)
        return self.results


def _dispatch_bucket(frames, frame_idx, n_ch, t_bucket, lane_quantum):
    """Pack one bucket and launch the device program asynchronously."""
    x, coefs, shifts, orders, wasted, pair_modes = pack_bucket(
        frames, frame_idx, n_ch, t_bucket, lane_quantum)
    L, T = x.shape

    # Input packing: when every value (residuals + warm-up) fits int16 and
    # T is even, ship half the bytes and unpack on device.
    in_packed = (T % 2 == 0 and x.min() >= -32768 and x.max() <= 32767)
    if in_packed:
        x16 = x.reshape(L, T // 2, 2).astype(np.int16)
        x = np.ascontiguousarray(x16).view(np.int32).reshape(L, T // 2)

    # Output packing: final PCM fits bps bits for valid streams; the device
    # flag guards invalid ones.
    out_packed = (T % 2 == 0 and
                  all(frames[fi].bps <= 16 for fi in frame_idx))

    jnp = _jnp()
    prog = _decode_program(in_packed, out_packed)
    args = (jnp.asarray(x), jnp.asarray(coefs), jnp.asarray(shifts),
            jnp.asarray(orders), jnp.asarray(wasted),
            jnp.asarray(pair_modes))
    if out_packed:
        out, packed, flag = prog(*args)
        return _BucketDispatch(frame_idx, n_ch, out, packed, flag)
    return _BucketDispatch(frame_idx, n_ch, prog(*args))


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
    frames, targets, results = [], [], []
    for batch in batches:
        si = batch.streaminfo
        total = sum(f.block_size for f in batch.frames)
        pcm = np.empty((total, si.channels), dtype=np.int32)
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
        return decode_batches_device(batches, lane_quantum).to_host()
    frames, targets, results = _prepare_outputs(batches)
    decode_frames_to(frames, targets, decode_bucket, lane_quantum)
    return results


def _extract(data, use_native):
    if use_native:
        try:
            from . import native
            if native.available():
                return native.extract_stream(data)
        except ImportError:
            pass
    return extract_stream(data)


def decode_stream(data, use_native=True) -> DecodedStream:
    """Decode a whole FLAC stream (bytes) through the TPU pipeline.

    ``use_native`` selects the C++ demux core when built; the Python
    extractor is the fallback (bit-identical, slower).
    """
    return decode_batch(_extract(data, use_native))


def decode_streams(datas, use_native=True, decode_bucket=None,
                   lane_quantum=_L_QUANTUM) -> List[DecodedStream]:
    """Decode many FLAC streams in one batched device dispatch."""
    return decode_batches([_extract(d, use_native) for d in datas],
                          decode_bucket, lane_quantum)


def decode_streams_device(datas, use_native=True,
                          lane_quantum=_L_QUANTUM) -> DeviceDecoded:
    """Decode many FLAC streams into device-resident PCM buckets -- the
    zero-host-round-trip path for feeding TPU consumers directly."""
    return decode_batches_device([_extract(d, use_native) for d in datas],
                                 lane_quantum)
