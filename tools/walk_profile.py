#!/usr/bin/env python
"""Intra-program attribution for the fused demux (ops/seg_parse.py).

Times the two candidate-dominant stages standalone on the real bench
corpus: the sync scan (ops.segment.find_frame_headers, which embeds an
8.9M-element scatter) and the subframe walk (ops.demux.walk_frames at
the production cap), so the 230 ms fused program's cost can be assigned
before optimizing either.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parent.parent
                      / ".bench_cache" / "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_corpus


def probe(x):
    leaf = jax.tree_util.tree_leaves(x)[-1]
    np.asarray(leaf if getattr(leaf, "ndim", 0) == 0
               else leaf.ravel()[:1])


def time_fn(fn, seconds=4.0, max_reps=40):
    probe(fn())
    reps = 0
    t0 = time.perf_counter()
    while (time.perf_counter() - t0 < seconds and reps < max_reps) \
            or reps < 3:
        out = fn()
        reps += 1
    probe(out)
    return (time.perf_counter() - t0) / reps


def main():
    from claxon_tpu.native.binding import _read_metadata
    from claxon_tpu.ops.segment import find_frame_headers
    from claxon_tpu.ops.demux import walk_frames
    from claxon_tpu.pipeline_bits import _STREAM_QUANTUM

    datas = build_corpus()
    payloads = []
    for d in datas:
        si, pos = _read_metadata(d)
        payloads.append(np.frombuffer(d, np.uint8)[pos:])
    sizes = [p.nbytes for p in payloads]
    wcs = [(s + 3) // 4 for s in sizes]
    total_w = sum(wcs)
    total_q = -(-total_w // _STREAM_QUANTUM) * _STREAM_QUANTUM
    buf = np.zeros(total_q * 4, np.uint8)
    off = 0
    for p, s, wc in zip(payloads, sizes, wcs):
        buf[off:off + s] = p
        off += wc * 4
    n_bytes = total_q * 4
    w = jnp.asarray(buf.view(np.int32))
    stream = (((w & 0xFF) << 24) | ((w & 0xFF00) << 8)
              | ((w >> 8) & 0xFF00) | ((w >> 24) & 0xFF))
    stream = jax.block_until_ready(stream)
    cap = 2048
    print(f"stream {n_bytes/1e6:.1f} MB, cap {cap}", flush=True)

    dt = time_fn(lambda: find_frame_headers(stream, n_bytes, cap))
    print(f"sync scan       {dt*1e3:8.2f} ms", flush=True)

    positions, valid, count, _win = jax.block_until_ready(
        find_frame_headers(stream, n_bytes, cap))
    nv = int(valid.sum())
    print(f"candidates: count={int(count)} valid={nv}", flush=True)

    # Realistic walk inputs from the valid candidates, padded to cap.
    pos_np = np.asarray(positions)
    val_np = np.asarray(valid)
    # start bits/bs/mode/bps via the host header parser.
    from claxon_tpu.pipeline_seg import host_header_fields
    hf = host_header_fields(buf, np.maximum(pos_np, 0))
    walkable = val_np & (hf["nch"] == 2) & (hf["block_size"] >= 1) \
        & (hf["block_size"] <= 4096)
    start_bits = np.where(walkable, (np.maximum(pos_np, 0)
                                     + hf["hlen"]) * 8, 0).astype(np.int32)
    bs = np.where(walkable, hf["block_size"], 0).astype(np.int32)
    mode = hf["mode"].astype(np.int32)
    bps = np.where(hf["bps_code"] == 0, 16,
                   np.maximum(hf["bps_code"], 1)).astype(np.int32)
    sb_d = jnp.asarray(start_bits)
    bs_d = jnp.asarray(bs)
    mode_d = jnp.asarray(mode)
    bps_d = jnp.asarray(bps)

    dt = time_fn(lambda: walk_frames(stream, sb_d, bs_d, mode_d, bps_d,
                                     T=4096, nch=2))
    print(f"walk cap={cap}  {dt*1e3:8.2f} ms "
          f"({int(walkable.sum())} real walkable)", flush=True)

    # Compacted variant: only the walkable lanes, padded to 1024.
    wi = np.flatnonzero(walkable)
    wcap = 1024
    idx = np.zeros(wcap, np.int64)
    idx[:len(wi)] = wi[:wcap]
    dt = time_fn(lambda: walk_frames(
        stream, jnp.asarray(start_bits[idx]), jnp.asarray(bs[idx]),
        jnp.asarray(mode[idx]), jnp.asarray(bps[idx]), T=4096, nch=2))
    print(f"walk cap={wcap}  {dt*1e3:8.2f} ms (compacted)", flush=True)


if __name__ == "__main__":
    main()
