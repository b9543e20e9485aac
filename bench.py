#!/usr/bin/env python
"""Throughput benchmark: aggregate decoded Msamples/s per chip.

Mirrors the reference's methodology (`examples/bench_decode.rs:36-89`,
`tools/benchmark_against_libflac.sh`): the corpus is fully in memory before
timing, metadata cost is included only once per stream, and the measured
number is decoded samples per wall-clock second. The baseline is the
driver's north star of 4.4 Msamples/s/chip (BASELINE.json; derived from
claxon's ~11-12 Msamples/s/core, `docs/generic_integer_width.md:21-73`).

Corpus: generated 16-bit/44.1 kHz stereo streams (flac-subset style: 4096
blocks, LPC order 8, mid/side) via the spec-derived encoder in
``claxon_tpu.testing``, cached under .bench_cache/. Bit-exactness is
asserted against the STREAMINFO MD5 before timing.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import hashlib
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

BASELINE_MSAMPLES_S = 4.4
CACHE = pathlib.Path(__file__).resolve().parent / ".bench_cache"
CORPUS_VERSION = "v1"
N_STREAMS = 8
SECONDS_PER_STREAM = 10
MIN_TIMED_SECONDS = 5.0


def build_corpus():
    from claxon_tpu.testing import encode_flac, synth_music

    cache = CACHE / f"corpus_{CORPUS_VERSION}"
    cache.mkdir(parents=True, exist_ok=True)
    datas = []
    for i in range(N_STREAMS):
        p = cache / f"s{i:02d}.flac"
        if not p.exists():
            pcm = synth_music(44100 * SECONDS_PER_STREAM, channels=2,
                              bps=16, seed=1000 + i)
            p.write_bytes(encode_flac(pcm, 44100, 16, block_size=4096))
        datas.append(p.read_bytes())
    return datas


def pcm_md5(pcm, bps):
    nbytes = (bps + 7) // 8
    raw = np.ascontiguousarray(pcm, dtype="<i4").tobytes()
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 4)[:, :nbytes]
    return hashlib.md5(arr.tobytes()).digest()


def main():
    from claxon_tpu.pipeline import decode_streams
    from claxon_tpu import native

    datas = build_corpus()

    # Warm-up: compiles the device programs AND verifies bit-exactness
    # against the STREAMINFO MD5 oracle (the generated corpus is
    # self-verifying; see claxon_tpu/testing/flacgen.py).
    decoded = decode_streams(datas)
    total_samples = 0
    for d in decoded:
        si = d.streaminfo
        assert pcm_md5(d.pcm, si.bits_per_sample) == si.md5sum, \
            "decode is not bit-exact"
        total_samples += d.pcm.size

    # Timed runs: whole pipeline (host demux + device decode), repeated
    # until enough wall time has accumulated for a stable number.
    reps = 0
    t0 = time.perf_counter()
    while True:
        decode_streams(datas)
        reps += 1
        elapsed = time.perf_counter() - t0
        if elapsed >= MIN_TIMED_SECONDS and reps >= 2:
            break
        if reps >= 50:
            break
    elapsed = time.perf_counter() - t0

    msamples_s = total_samples * reps / elapsed / 1e6
    print(json.dumps({
        "metric": "decode_throughput_per_chip",
        "value": round(msamples_s, 3),
        "unit": "Msamples/s",
        "vs_baseline": round(msamples_s / BASELINE_MSAMPLES_S, 3),
        "native_demux": native.available(),
        "streams": len(datas),
        "reps": reps,
    }))


if __name__ == "__main__":
    main()
