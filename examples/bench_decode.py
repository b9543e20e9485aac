#!/usr/bin/env python
"""Per-block decode timing for one FLAC file: p10/p50/p90/mean ns per
sample plus input MiB/s, over 5 runs.

Counterpart of the reference's `examples/bench_decode.rs:36-115` with the
same methodology: the file is fully in memory before timing, metadata bytes
are excluded from the bytes/s figure (`bench_decode.rs:42-45`), timing is
per block.

Usage: python examples/bench_decode.py [--pipeline] FILE
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from claxon_tpu import FlacReader
from claxon_tpu.io.readers import MemReader


def metadata_size(data):
    """Bytes of header + metadata: the cursor position after FlacReader
    construction (the reference's into_inner().position() trick,
    `examples/bench_decode.rs:42-45`)."""
    cursor = MemReader(data)
    FlacReader(cursor)
    return cursor.pos


def decode_file_scalar(data):
    """One full scalar decode; returns per-block ns/sample samples."""
    reader = FlacReader(data)
    frames = reader.blocks()
    buf = None
    timings = []
    while True:
        t0 = time.perf_counter_ns()
        block = frames.read_next_or_eof(buf)
        t1 = time.perf_counter_ns()
        if block is None:
            break
        timings.append((t1 - t0) / max(block.len(), 1))
        buf = block.into_buffer()
    return timings


def decode_file_pipeline(data):
    """One batched pipeline decode; returns [total_ns / total_samples]."""
    from claxon_tpu.pipeline import decode_stream
    t0 = time.perf_counter_ns()
    dec = decode_stream(data)
    t1 = time.perf_counter_ns()
    return [(t1 - t0) / max(dec.pcm.size, 1)]


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    pipeline = "--pipeline" in argv
    if len(args) != 1:
        print(__doc__)
        return 1
    data = pathlib.Path(args[0]).read_bytes()
    audio_bytes = len(data) - metadata_size(data)

    decode = decode_file_pipeline if pipeline else decode_file_scalar
    decode(data)  # warm-up (compiles device programs on the pipeline path)
    for run in range(5):
        t0 = time.perf_counter()
        timings = np.array(decode(data))
        wall = time.perf_counter() - t0
        p10, p50, p90 = np.percentile(timings, [10, 50, 90])
        print(f"run {run}: p10 {p10:8.2f}  p50 {p50:8.2f}  p90 {p90:8.2f}  "
              f"mean {timings.mean():8.2f} ns/sample   "
              f"{audio_bytes / wall / 2**20:8.2f} MiB/s")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
