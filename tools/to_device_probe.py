#!/usr/bin/env python
"""Probe the to-device (sustained decode-to-HBM) rate per path/corpus.

Runs bench.py's time_to_device loop on the real chip for the headline
and mixed corpora through both segmentation paths, printing rate and
upload bytes/sample -- the round-over-round view VERDICT r4 item 2/3
tracks without paying a full bench run. `--debug` adds one SEG_DEBUG
batch per corpus for the per-stage host-CPU marks.
"""

import argparse
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parent.parent
                      / ".bench_cache" / "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import (build_corpus, build_mixed_corpus, time_to_device,
                   verify_corpus)
from claxon_tpu.pipeline import decode_streams_device_async


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--debug", action="store_true")
    ap.add_argument("--paths", default="device,host")
    ap.add_argument("--corpora", default="headline,mixed")
    args = ap.parse_args()

    corpora = {}
    if "headline" in args.corpora:
        corpora["headline"] = build_corpus()
    if "mixed" in args.corpora:
        corpora["mixed"] = build_mixed_corpus()

    for cname, datas in corpora.items():
        total = verify_corpus(datas)
        nbytes = sum(len(d) for d in datas)
        print(f"{cname}: {len(datas)} streams, {nbytes / 1e6:.1f} MB, "
              f"{total / 1e6:.1f} Msamples "
              f"({nbytes / total:.3f} B/sample)", flush=True)
        for seg in args.paths.split(","):
            t0 = time.perf_counter()
            dd = decode_streams_device_async(datas, segmentation=seg)
            dd.finish().sync()
            warm = time.perf_counter() - t0
            rate, reps = time_to_device(
                lambda b: decode_streams_device_async(b, segmentation=seg),
                datas, total, args.seconds)
            print(f"  {cname}/{seg}: {rate:.2f} Ms/s ({reps} reps, "
                  f"warm batch {warm:.1f}s)", flush=True)
        if args.debug:
            os.environ["CLAXON_TPU_SEG_DEBUG"] = "1"
            dd = decode_streams_device_async(datas, segmentation="device")
            dd.finish().sync()
            del os.environ["CLAXON_TPU_SEG_DEBUG"]


if __name__ == "__main__":
    main()
