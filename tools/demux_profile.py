#!/usr/bin/env python
"""Per-program cost breakdown of the segmented path on the real chip.

Captures the programs one segmented decode dispatches (bench.py's
capture mechanism) and times EACH separately, HBM-resident, with a
dependent-fetch close -- so optimization effort lands on the program
that actually dominates (VERDICT r3 item 1).
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

from bench import build_corpus, capture_programs, verify_corpus
from claxon_tpu.pipeline import decode_streams_device


def probe(outs):
    small = jax.tree_util.tree_leaves(outs)[-1]
    np.asarray(small if getattr(small, "ndim", 0) == 0
               else small.ravel()[:1])


def time_one(prog, args, seconds=4.0, max_reps=60):
    outs = prog(*args)
    probe(outs)  # warm
    reps = 0
    t0 = time.perf_counter()
    while (time.perf_counter() - t0 < seconds and reps < max_reps) \
            or reps < 3:
        outs = prog(*args)
        reps += 1
    probe(outs)
    return (time.perf_counter() - t0) / reps


def main():
    datas = build_corpus()
    total = verify_corpus(datas)
    pairs = capture_programs(
        lambda b: decode_streams_device(b, segmentation="device"), datas)
    print(f"{len(pairs)} programs; corpus {total/1e6:.2f} Msamples",
          flush=True)
    ttot = 0.0
    for i, (prog, args) in enumerate(pairs):
        shapes = [getattr(a, "shape", None) for a in args]
        dt = time_one(prog, args)
        ttot += dt
        print(f"prog[{i}] {dt*1e3:8.2f} ms  args={shapes}", flush=True)
    print(f"total {ttot*1e3:.1f} ms -> {total/ttot/1e6:.1f} Ms/s resident",
          flush=True)


if __name__ == "__main__":
    main()
