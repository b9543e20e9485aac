#!/usr/bin/env python
"""Where does the to-device wall clock go on the segmented path?

bench.py r04 measured link_efficiency 0.514: the to-device loop achieves
~half the upload-ceiling rate even though the upload itself is at the
compressed floor. This tool decomposes one batch period into its
candidate costs on the real link:

  1. upload-only        : device_put of the batch bytes, back to back
  2. upload+demux       : begin_segmented (upload + fused demux + summary
                          fetch), no decode dispatch
  3. full to-device     : the production async depth-3 loop
  4. per-stage wall time: begin vs finish split, and finish's resolve /
                          chain / dispatch shares

plus the same decomposition for the host-walk path for contrast. Run on
the real TPU: `python tools/seg_link_profile.py [reps]`.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench  # noqa: E402  (corpus + cache helpers)


def _sync_probe():
    import jax

    x = jax.device_put(np.zeros(16, np.int32))
    np.asarray(x.sum())


def time_loop(fn, reps, close):
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    close(out)
    return (time.perf_counter() - t0) / reps


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(bench.CACHE / "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from claxon_tpu.pipeline import decode_streams_device_async
    from claxon_tpu.pipeline_seg import begin_segmented, finish_segmented

    datas = bench.build_corpus()
    total_samples = bench.verify_corpus(datas)
    n_bytes = sum(len(d) for d in datas)
    print(f"corpus: {len(datas)} streams, {n_bytes/1e6:.2f} MB, "
          f"{total_samples/1e6:.2f} Msamples")

    # Warm both paths to completion (async compiles).
    for seg in ("device", "host"):
        decode_streams_device_async(datas, segmentation=seg).finish().sync()
    _sync_probe()

    # ---- 1. upload-only: one device_put of the same byte volume.
    buf = np.zeros(((n_bytes + 127) // 128) * 32, np.int32)
    tiny = jax.jit(lambda x: x.ravel()[::65536].sum())

    def upload():
        return tiny(jax.device_put(buf))

    t_up = time_loop(upload, reps, lambda o: np.asarray(o))
    print(f"upload-only      : {t_up*1e3:8.1f} ms/batch "
          f"({buf.nbytes/t_up/1e6:.1f} MB/s, "
          f"{total_samples/t_up/1e6:.1f} Msamples/s-equivalent)")

    # ---- 2. upload + fused demux + summary fetch (no decode).
    def demux_only():
        p = begin_segmented(datas)
        if p is None or not p.groups:
            raise SystemExit(
                "segmented path did not engage on this corpus (shape "
                "rejection, no native core, or every stream learned "
                "into the reject cache) -- nothing to profile")
        for g in p.groups:
            g[-1].resolve()
        return p.groups[-1][-1].stream

    t_dm = time_loop(demux_only, max(reps // 2, 3),
                     lambda s: np.asarray(s[:1]))
    print(f"upload+demux     : {t_dm*1e3:8.1f} ms/batch "
          f"({total_samples/t_dm/1e6:.1f} Msamples/s)")

    # ---- 3/4. production depth-3 async loop with begin/finish split.
    for seg in ("device", "host"):
        tb = tf = 0.0
        in_flight = []
        last = None
        t0 = time.perf_counter()
        for _ in range(reps):
            s = time.perf_counter()
            h = decode_streams_device_async(datas, segmentation=seg)
            tb += time.perf_counter() - s
            in_flight.append(h)
            if len(in_flight) > 3:
                s = time.perf_counter()
                last = in_flight.pop(0).finish()
                tf += time.perf_counter() - s
        for h in in_flight:
            s = time.perf_counter()
            last = h.finish()
            tf += time.perf_counter() - s
        last.sync()
        t_all = (time.perf_counter() - t0) / reps
        print(f"to-device [{seg:6s}]: {t_all*1e3:8.1f} ms/batch "
              f"({total_samples/t_all/1e6:.1f} Msamples/s) "
              f"begin {tb/reps*1e3:.1f} ms, finish {tf/reps*1e3:.1f} ms")

    # ---- begin/finish internals, one synchronous pass with marks.
    import os

    os.environ["CLAXON_TPU_SEG_DEBUG"] = "1"
    s = time.perf_counter()
    p = begin_segmented(datas)
    t_begin = time.perf_counter() - s
    s = time.perf_counter()
    finish_segmented(p).sync()
    t_finish = time.perf_counter() - s
    del os.environ["CLAXON_TPU_SEG_DEBUG"]
    print(f"sync begin {t_begin*1e3:.1f} ms, finish+sync "
          f"{t_finish*1e3:.1f} ms (stage CPU ms above)")


if __name__ == "__main__":
    main()
