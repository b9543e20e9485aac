#!/usr/bin/env python
"""Profile the decode pipeline stage by stage on the current JAX device.

Mirrors the reference's profiling role of examples/bench_decode.rs +
tools/benchmark.sh: where does a decoded sample's time go?
Stages: native extract | bucket pack (host numpy) | H2D transfer |
device compute | D2H transfer | scatter.

``--trace DIR`` wraps the run in a JAX profiler trace (view with
TensorBoard/xprof) -- the TPU-native counterpart of the reference's
external profiling workflow (`tools/benchmark.sh`).
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    from claxon_tpu.testing import encode_flac, synth_music
    from claxon_tpu import native
    from claxon_tpu.pipeline import (group_frames, pack_bucket,
                                     device_decode_bucket, scatter_bucket,
                                     frame_offsets)
    from claxon_tpu.ops.predict import synthesize
    from claxon_tpu.ops.epilogue import apply_epilogue

    print("device:", jax.devices()[0], file=sys.stderr)

    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    datas = []
    cache = pathlib.Path(".bench_cache/corpus_v1")
    if cache.is_dir():
        files = sorted(cache.glob("*.flac"))[:n_streams]
        datas = [f.read_bytes() for f in files]
    while len(datas) < n_streams:
        pcm = synth_music(441000, channels=2, bps=16, seed=2000 + len(datas))
        datas.append(encode_flac(pcm, 44100, 16, block_size=4096))

    def t(fn, reps=3):
        fn()  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - t0) / reps

    # 1. extract
    te = t(lambda: [native.extract_stream(d) for d in datas])
    batches = [native.extract_stream(d) for d in datas]
    frames = [f for b in batches for f in b.frames]
    total = sum(f.block_size * f.channels for f in frames)
    print(f"extract: {te*1e3:8.1f} ms  ({total/te/1e6:7.1f} Msamples/s)")

    # 2. pack
    groups = group_frames(frames)
    def pack_all():
        return [pack_bucket(frames, idx, nch, tb)
                for (tb, nch), idx in groups.items()]
    tp = t(pack_all)
    packed = pack_all()
    print(f"pack:    {tp*1e3:8.1f} ms  ({total/tp/1e6:7.1f} Msamples/s)")
    for p in packed:
        print(f"  bucket L={p[0].shape[0]} T={p[0].shape[1]}", file=sys.stderr)

    # 3. H2D
    def h2d():
        outs = [[jax.device_put(a) for a in p] for p in packed]
        jax.block_until_ready(outs)
        return outs
    th = t(h2d)
    dev = h2d()
    print(f"h2d:     {th*1e3:8.1f} ms  ({total/th/1e6:7.1f} Msamples/s)")

    # 4. device compute (synthesize + epilogue), data already on device
    def compute():
        outs = []
        for (x, coefs, shifts, orders, wasted, pm, lengths) in dev:
            o = synthesize(x, coefs, shifts, orders, lengths)
            outs.append(apply_epilogue(o, wasted, pm))
        jax.block_until_ready(outs)
        return outs
    tc = t(compute)
    outs = compute()
    print(f"compute: {tc*1e3:8.1f} ms  ({total/tc/1e6:7.1f} Msamples/s)")

    # 5. D2H
    td = t(lambda: [np.asarray(o) for o in outs])
    host_outs = [np.asarray(o) for o in outs]
    print(f"d2h:     {td*1e3:8.1f} ms  ({total/td/1e6:7.1f} Msamples/s)")

    # 6. scatter
    targets = []
    for b in batches:
        pcm = np.empty((sum(f.block_size for f in b.frames),
                        b.streaminfo.channels), np.int32)
        offs = frame_offsets(b.frames)
        for i in range(len(b.frames)):
            targets.append((pcm, int(offs[i])))
    def scatter_all():
        for ((tb, nch), idx), out in zip(groups.items(), host_outs):
            scatter_bucket(out, frames, idx, nch, targets)
    ts = t(scatter_all)
    print(f"scatter: {ts*1e3:8.1f} ms  ({total/ts/1e6:7.1f} Msamples/s)")

    tot = te + tp + th + tc + td + ts
    print(f"TOTAL:   {tot*1e3:8.1f} ms  ({total/tot/1e6:7.1f} Msamples/s) "
          f"for {total/1e6:.1f} Msamples")

    # ---- Production bits path (stream mode). Timing closes with tiny
    # dependent fetches -- block_until_ready acks early on the tunneled
    # backend, so the legacy-section numbers above are optimistic there.
    print("\n-- bits path (production stream mode) --")
    from claxon_tpu.pipeline import decode_streams_device

    tb_ = t(lambda: [native.extract_stream_bits(d, emit_slots=False,
                                                defer_crc=True)
                     for d in datas])
    print(f"bits extract: {tb_*1e3:8.1f} ms  ({total/tb_/1e6:7.1f} "
          f"Msamples/s)  [boundary-only walk, CRC-16 deferred]")

    warm = decode_streams_device(datas)
    warm.sync()

    def dispatch_and_sync():
        decode_streams_device(datas).sync()
    tds = t(dispatch_and_sync)
    print(f"extract+dispatch+device (sync): {tds*1e3:8.1f} ms  "
          f"({total/tds/1e6:7.1f} Msamples/s)")

    # Device-only rate: re-dispatch the captured programs on HBM-resident
    # args (the staged-corpus scenario; no link traffic in the window).
    import importlib
    bench = importlib.import_module("bench")
    pairs = bench.capture_programs(decode_streams_device, datas)
    rate, reps = bench.time_device_resident(pairs, total, 4.0)
    print(f"device programs (HBM-resident): {total/rate/1e3:8.1f} ms  "
          f"({rate:7.1f} Msamples/s over {reps} reps)")

    tth = t(lambda: decode_streams_device(datas).to_host(), reps=2)
    print(f"end-to-end to host: {tth*1e3:8.1f} ms  "
          f"({total/tth/1e6:7.1f} Msamples/s)")


if __name__ == "__main__":
    if "--trace" in sys.argv:
        import jax

        idx = sys.argv.index("--trace")
        trace_dir = sys.argv[idx + 1]
        del sys.argv[idx:idx + 2]
        with jax.profiler.trace(trace_dir):
            main()
        print(f"profiler trace written to {trace_dir}", file=sys.stderr)
    else:
        main()
