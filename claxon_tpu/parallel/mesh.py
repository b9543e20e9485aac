"""Mesh construction and the sharded decode step.

See the package docstring for the design: frames are independent
(reference `src/frame.rs:667-779`), so the bucket lane axis shards as pure
data parallelism with zero collectives.
"""

import math
from functools import partial

import numpy as np

from ..pipeline import decode_batch as _decode_batch

LANE_AXIS = "streams"

__all__ = ["make_mesh", "make_decode_step", "decode_batch_sharded",
           "LANE_AXIS"]


def make_mesh(n_devices=None, devices=None):
    """A 1-D ``jax.sharding.Mesh`` over ``n_devices`` (default: all)."""
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if len(devices) < n_devices:
                raise ValueError(
                    f"need {n_devices} devices, have {len(devices)}")
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (LANE_AXIS,))


def lane_quantum(mesh):
    """Lane padding quantum: a multiple of both the VPU row (128) and
    2 x mesh size, so every shard gets an equal, pair-aligned lane count."""
    n = mesh.devices.size
    return (128 * 2 * n) // math.gcd(128, 2 * n)


_STEP_CACHE = {}


def make_decode_step(mesh):
    """Build the jitted, mesh-sharded whole-decode-step program.

    Cached per mesh: jax.jit keys its compilation cache on the function
    object, so rebuilding the closure every call would recompile the
    sharded program (tens of seconds on TPU) on every decode.

    Shardings: every lane-indexed array is sharded on its lane axis over
    ``LANE_AXIS``; there is no replicated model state. The synthesis scan
    runs in lockstep on every chip over its lane shard; XLA inserts no
    collectives (verifiable: the compiled HLO contains no all-reduce /
    all-gather / collective-permute).
    """
    cached = _STEP_CACHE.get(mesh)
    if cached is not None:
        return cached

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops.predict import synthesize
    from ..ops.epilogue import apply_epilogue

    lanes = NamedSharding(mesh, P(LANE_AXIS, None))
    lanevec = NamedSharding(mesh, P(LANE_AXIS))

    @partial(jax.jit,
             in_shardings=(lanes, lanes, lanevec, lanevec, lanevec, lanevec,
                           lanevec),
             out_shardings=lanes)
    def decode_step(x, coefs, shifts, orders, wasted, pair_modes, lengths):
        out = synthesize(x, coefs, shifts, orders, lengths)
        return apply_epilogue(out, wasted, pair_modes)

    _STEP_CACHE[mesh] = decode_step
    return decode_step


def decode_batch_sharded(batch, mesh=None):
    """Decode a ``StreamBatch`` with buckets sharded across the mesh.

    Mirrors ``claxon_tpu.pipeline.decode_batch`` but pads lanes to the
    mesh-aware quantum and dispatches the sharded step.
    """
    if mesh is None:
        mesh = make_mesh()
    step = make_decode_step(mesh)
    return _decode_batch(batch, decode_bucket=step,
                         lane_quantum=lane_quantum(mesh))


def _calibrate_segmentation_sharded(datas, mesh):
    """Sharded analog of ``pipeline._calibrate_segmentation``: time one
    sync'd run of each path over the mesh and cache the faster choice in
    the same per-process slot (the compiled programs differ only in
    sharding, so the single cache stays coherent). Returns
    ``(choice, winner's DeviceDecoded)`` so the caller consumes the
    already-computed result instead of re-uploading the batch for a
    fifth decode (mirrors ``pipeline._calibrate_segmentation``)."""
    import time as _time

    from ..pipeline import _SEG_AUTO, extract_streams_bits, _native_mod
    from ..pipeline_bits import decode_raw_bits_device
    from ..pipeline_seg import decode_streams_segmented

    native = _native_mod()
    d_seg = decode_streams_segmented(datas, mesh=mesh)
    if not getattr(d_seg, "segmented", False):
        if getattr(d_seg, "seg_engaged", False):
            _SEG_AUTO["choice"] = "host"
        return "host", d_seg

    def host_run():
        braws, mode = extract_streams_bits(datas, native)
        return decode_raw_bits_device(braws, lane_quantum(mesh), mode,
                                      mesh=mesh)

    d_seg.sync()
    host_run().sync()
    # Min-of-2 interleaved timings per path (phase-dip robustness;
    # mirrors pipeline._calibrate_segmentation).
    t_dev = t_host = float("inf")
    d_host = None
    for _ in range(2):
        t0 = _time.perf_counter()
        d_seg = decode_streams_segmented(datas, mesh=mesh)
        d_seg.sync()
        t_dev = min(t_dev, _time.perf_counter() - t0)
        t0 = _time.perf_counter()
        d_host = host_run()
        d_host.sync()
        t_host = min(t_host, _time.perf_counter() - t0)
    choice = "device" if t_dev < t_host else "host"
    _SEG_AUTO["choice"] = choice
    return choice, (d_seg if choice == "device" else d_host)


def decode_streams_sharded(datas, mesh=None, use_native=True,
                           segmentation=None):
    """Decode many FLAC streams with frames sharded across all chips --
    the multi-chip corpus-decode entry point (pure data parallelism; see
    the package docstring).

    With the native core this is the full bits pipeline sharded over the
    mesh: on-device entropy decode, async dispatch, int16-packed chunked
    fetch -- the single-chip path's engineering, lane-sharded.
    ``segmentation="device"`` (or CLAXON_TPU_SEGMENTATION=device) runs
    the segmented path with its decode programs lane-sharded over the
    mesh (pipeline_seg; the fused demux program's outputs replicate).
    The FrameDesc fallback (no native core) routes through the
    synchronous FrameDesc packer with the sharded synthesis step.
    """
    import os

    from ..pipeline import (decode_batches, extract_streams_bits, _extract,
                            _native_mod)

    if mesh is None:
        mesh = make_mesh()
    if segmentation is None:
        segmentation = os.environ.get("CLAXON_TPU_SEGMENTATION", "auto")
    if use_native and not os.environ.get("CLAXON_TPU_NO_BITS"):
        native = _native_mod()
        if native is not None:
            if segmentation == "auto":
                from ..pipeline import _SEG_AUTO
                segmentation = _SEG_AUTO["choice"]
                if segmentation is None:
                    _choice, dd = _calibrate_segmentation_sharded(
                        datas, mesh)
                    return dd.start_fetch().to_host()
            if segmentation == "device":
                from ..pipeline_seg import decode_streams_segmented
                return decode_streams_segmented(
                    datas, mesh=mesh).start_fetch().to_host()
            from ..pipeline_bits import decode_raw_bits_device

            braws, mode = extract_streams_bits(datas, native)
            return decode_raw_bits_device(
                braws, lane_quantum(mesh), mode,
                mesh=mesh).start_fetch().to_host()
    step = make_decode_step(mesh)
    return decode_batches([_extract(d, use_native) for d in datas],
                          decode_bucket=step,
                          lane_quantum=lane_quantum(mesh))
