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

__all__ = ["decode_stream", "decode_batch", "DecodedStream",
           "bucket_shape", "device_decode_bucket"]

# Time-axis bucket sizes: the common FLAC block sizes plus power-of-two
# fill-ins, so a stream with one block size compiles exactly one program.
_T_BUCKETS = (64, 192, 256, 576, 1024, 1152, 2048, 2304, 4096, 4608,
              8192, 16384, 32768, 65535)
_L_QUANTUM = 128  # lane-axis padding quantum (one VPU lane row)


def bucket_shape(n_lanes, block_size):
    """The padded (L, T) compile shape for a group of subframes."""
    for t in _T_BUCKETS:
        if block_size <= t:
            break
    lq = _L_QUANTUM
    l = ((n_lanes + lq - 1) // lq) * lq
    return l, t


def _jnp():
    import jax.numpy as jnp
    return jnp


def device_decode_bucket(x, coefs, shifts, orders, wasted, ch0, ch1, modes):
    """Run the fused device program on one bucket. All arrays pre-padded."""
    jnp = _jnp()
    out = synthesize(jnp.asarray(x), jnp.asarray(coefs), jnp.asarray(shifts),
                     jnp.asarray(orders))
    out = apply_epilogue(out, jnp.asarray(wasted), jnp.asarray(ch0),
                         jnp.asarray(ch1), jnp.asarray(modes))
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


def _group_frames(frames):
    """Group frame indices by (block_size bucket, channels)."""
    groups = {}
    for i, f in enumerate(frames):
        key = (bucket_shape(0, f.block_size)[1], f.channels)
        groups.setdefault(key, []).append(i)
    return groups


def decode_batch(batch: StreamBatch) -> DecodedStream:
    """Decode an extracted StreamBatch through the device pipeline."""
    frames = batch.frames
    si = batch.streaminfo
    channels = si.channels
    total = sum(f.block_size for f in frames)
    pcm = np.empty((total, channels), dtype=np.int32)

    # Frame start offsets in the output.
    offsets = np.zeros(len(frames) + 1, dtype=np.int64)
    for i, f in enumerate(frames):
        offsets[i + 1] = offsets[i] + f.block_size

    for (t_bucket, n_ch), frame_idx in _group_frames(frames).items():
        n_lanes = len(frame_idx) * n_ch
        L, T = bucket_shape(n_lanes, t_bucket)

        x = np.zeros((L, T), dtype=np.int32)
        coef_lists = []
        shifts = np.zeros(L, dtype=np.int32)
        orders = np.zeros(L, dtype=np.int32)
        wasted = np.zeros(L, dtype=np.int32)
        ch0, ch1, modes = [], [], []

        lane = 0
        for fi in frame_idx:
            f = frames[fi]
            for ci, sf in enumerate(f.subframes):
                x[lane, :f.block_size] = sf.x
                coef_lists.append(sf.coefs)
                shifts[lane] = sf.shift
                orders[lane] = sf.order
                wasted[lane] = sf.wasted
                lane += 1
            if f.mode != MODE_CODES["independent"] and n_ch == 2:
                ch0.append(lane - 2)
                ch1.append(lane - 1)
                modes.append(f.mode)
        coef_lists.extend([[]] * (L - lane))
        coefs = pack_coefficients(coef_lists)

        out = device_decode_bucket(
            x, coefs, shifts, orders, wasted,
            np.asarray(ch0, dtype=np.int32), np.asarray(ch1, dtype=np.int32),
            np.asarray(modes, dtype=np.int32))
        out = np.asarray(out)

        lane = 0
        for fi in frame_idx:
            f = frames[fi]
            o = offsets[fi]
            for ci in range(n_ch):
                pcm[o:o + f.block_size, ci] = out[lane, :f.block_size]
                lane += 1

    return DecodedStream(streaminfo=si, pcm=pcm,
                         frame_times=[f.time for f in frames],
                         frame_sizes=[f.block_size for f in frames])


def decode_stream(data, use_native=True) -> DecodedStream:
    """Decode a whole FLAC stream (bytes) through the TPU pipeline.

    ``use_native`` selects the C++ demux core when built; the Python
    extractor is the fallback (bit-identical, slower).
    """
    batch = None
    if use_native:
        try:
            from . import native
            if native.available():
                batch = native.extract_stream(data)
        except ImportError:
            batch = None
    if batch is None:
        batch = extract_stream(data)
    return decode_batch(batch)
