#!/usr/bin/env python
"""Time the segmented-path device programs on the real chip.

Builds the bench corpus, captures the fused demux + decode programs the
segmented path dispatches (bench.py's capture mechanism), and times
them HBM-resident -- the figure VERDICT r3 wants >= 100 Ms/s. Also
times the host-walk decode programs for the decode-only baseline.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parent.parent
                      / ".bench_cache" / "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import (build_corpus, capture_programs, time_device_resident,
                   verify_corpus)
from claxon_tpu.pipeline import decode_streams_device


def main():
    datas = build_corpus()
    total = verify_corpus(datas)
    for name, seg in (("seg", "device"), ("host", "host")):
        t0 = time.perf_counter()
        pairs = capture_programs(
            lambda b: decode_streams_device(b, segmentation=seg), datas)
        print(f"{name}: captured {len(pairs)} programs "
              f"in {time.perf_counter() - t0:.0f}s (incl compile)",
              flush=True)
        rate, reps = time_device_resident(pairs, total, 6.0)
        print(f"{name}: resident {rate:.1f} Ms/s ({reps} reps)", flush=True)


if __name__ == "__main__":
    main()
