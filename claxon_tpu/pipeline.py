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
from typing import List

import numpy as np

from .extract import extract_stream, StreamBatch, MODE_CODES
from .ops.predict import synthesize, pack_coefficients, ORDER_MAX
from .ops.epilogue import apply_epilogue

__all__ = ["decode_stream", "decode_streams", "decode_batch",
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


def device_decode_bucket(x, coefs, shifts, orders, wasted, pair_modes):
    """Run the fused device program on one bucket. All arrays pre-padded;
    lanes pair-aligned (see ops.epilogue lane layout contract)."""
    jnp = _jnp()
    out = synthesize(jnp.asarray(x), jnp.asarray(coefs), jnp.asarray(shifts),
                     jnp.asarray(orders))
    out = apply_epilogue(out, jnp.asarray(wasted), jnp.asarray(pair_modes))
    return out


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


def decode_batches(batches, decode_bucket=None,
                   lane_quantum=_L_QUANTUM) -> List[DecodedStream]:
    """Decode many StreamBatches at once; frames from *all* streams share
    device buckets, so a corpus of short files still fills wide lanes --
    this is the production many-streams-per-chip serving path."""
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
