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
MIN_TIMED_SECONDS = 9.0
N_WINDOWS = 3


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
    # Persistent compilation cache: repeated bench runs skip the (remote,
    # slow) XLA compile entirely.
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          str(CACHE / "xla_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from claxon_tpu.pipeline import decode_streams
    from claxon_tpu import native

    datas = build_corpus()

    # Warm-up, kept link-light (the tunneled device link has slow phases):
    # 1. decode ONE stream end-to-end and verify bit-exactness against the
    #    STREAMINFO MD5 oracle (the generated corpus is self-verifying; the
    #    full corpus is bit-exactness-tested in the test suite);
    # 2. compile + run the full-corpus device program without fetching.
    from claxon_tpu.pipeline import decode_streams_device

    d = decode_streams(datas[:1])[0]
    assert pcm_md5(d.pcm, d.streaminfo.bits_per_sample) == \
        d.streaminfo.md5sum, "decode is not bit-exact"
    warm = decode_streams_device(datas).block_until_ready()
    total_samples = sum(r.pcm.size for r in warm.results)

    # Timed runs: whole pipeline (host demux + device decode + PCM back on
    # the host), software-pipelined: while one batch's results stream back
    # over the link, the next batch is already being demuxed and decoded.
    # The reported figure is the MEDIAN over several self-contained timed
    # windows -- the reference's methodology also averages many runs
    # (`tools/benchmark_against_libflac.sh`, 11 rounds) because a single
    # window is at the mercy of environmental noise; this device link in
    # particular has order-of-magnitude slow phases. Each window is also
    # wall-time capped so a stall cannot run the benchmark for minutes.
    rates = []
    reps = 0
    bench_t0 = time.perf_counter()
    for _window in range(N_WINDOWS):
        w0 = time.perf_counter()
        w_reps = 0
        in_flight = []
        while True:
            dev = decode_streams_device(datas)
            dev.start_fetch()
            in_flight.append(dev)
            w_reps += 1
            if len(in_flight) > 1:
                in_flight.pop(0).to_host()
            if (time.perf_counter() - w0 >= MIN_TIMED_SECONDS / N_WINDOWS
                    or w_reps >= 20):
                break
        for dev in in_flight:
            dev.to_host()
        rates.append(total_samples * w_reps /
                     (time.perf_counter() - w0))
        reps += w_reps
        if time.perf_counter() - bench_t0 > 120:
            break  # pathological stall phase: stop with what we have
    rates.sort()
    mid = len(rates) // 2
    if len(rates) % 2:
        median = rates[mid]
    else:
        median = (rates[mid - 1] + rates[mid]) / 2
    msamples_s = median / 1e6

    # Decode-to-device: the zero-host-round-trip path feeding TPU
    # consumers straight from HBM (the framework's native product).
    # Pipelined: extract batch n+1 while batch n computes.
    # Device work executes in dispatch order, so ONE final sync (a tiny
    # dependent fetch -- the reliable barrier on this transport) proves
    # every rep completed; per-rep probes would bill the link's scalar
    # round-trip latency to the decoder.
    dev_reps = 0
    last = None
    t0 = time.perf_counter()
    while True:
        last = decode_streams_device(datas)
        dev_reps += 1
        dev_elapsed = time.perf_counter() - t0
        if dev_elapsed >= MIN_TIMED_SECONDS or dev_reps >= 50:
            break
    last.sync()
    dev_elapsed = time.perf_counter() - t0
    dev_msamples_s = total_samples * dev_reps / dev_elapsed / 1e6

    # Host scalar decode (FlacReader.blocks(), the claxon-equivalent
    # CPU-to-CPU path) for context. Time-capped like every other phase:
    # without the native core this path is pure Python and must not run
    # for minutes.
    from claxon_tpu import FlacReader
    t0 = time.perf_counter()
    n = 0
    deadline = t0 + MIN_TIMED_SECONDS / 2
    while time.perf_counter() < deadline:
        for data in datas:
            fr = FlacReader(data).blocks()
            buf = None
            while (b := fr.read_next_or_eof(buf)) is not None:
                n += b.len()
                buf = b.into_buffer()
                if time.perf_counter() > deadline:
                    break
            if time.perf_counter() > deadline:
                break
    scalar_msamples_s = n / (time.perf_counter() - t0) / 1e6

    print(json.dumps({
        "metric": "decode_throughput_per_chip",
        "value": round(msamples_s, 3),
        "unit": "Msamples/s",
        "vs_baseline": round(msamples_s / BASELINE_MSAMPLES_S, 3),
        "to_device_msamples_s": round(dev_msamples_s, 3),
        "to_device_vs_baseline": round(dev_msamples_s / BASELINE_MSAMPLES_S,
                                       3),
        "host_scalar_msamples_s": round(scalar_msamples_s, 3),
        "native_demux": native.available(),
        "streams": len(datas),
        "reps": reps,
    }))


if __name__ == "__main__":
    main()
