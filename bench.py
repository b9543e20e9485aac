#!/usr/bin/env python
"""Throughput benchmark: aggregate decoded Msamples/s per chip.

Mirrors the reference's methodology (`examples/bench_decode.rs:36-89`,
`tools/benchmark_against_libflac.sh`): the corpus is fully in memory before
timing, metadata cost is included only once per stream, and the measured
number is decoded samples per wall-clock second. The baseline is the
driver's north star of 4.4 Msamples/s/chip (BASELINE.json; derived from
claxon's ~11-12 Msamples/s/core, `docs/generic_integer_width.md:21-73`).

Link physics on this tunneled backend (measured, tools/link_probe.py):
block_until_ready acknowledges transfers early, so the only honest timing
closes with a dependent fetch; sustained host-to-device is ~30-45 MB/s.
The to-device window dispatches batches back to back and is closed by ONE
dependent flag fetch (it cannot resolve before every queued program
finishes); the JSON reports the measured link rate and the physical
ceiling it implies (rate / upload bytes per sample) next to the achieved
figure.

Bit-exactness is asserted against the STREAMINFO MD5 oracle through the
native scalar decoder BEFORE any device work (no link traffic).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} --
`value` is the end-to-end to-host rate (the honest headline), with the
to-device rate, percentiles, corpus mix, and backend recorded as fields.
"""

import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

BASELINE_MSAMPLES_S = 4.4
CACHE = pathlib.Path(__file__).resolve().parent / ".bench_cache"
CORPUS_VERSION = "v1"
MIXED_VERSION = "m1"
N_STREAMS = 8
SECONDS_PER_STREAM = 10
TO_DEVICE_SECONDS = 8.0
TO_HOST_SECONDS = 20.0
N_WINDOWS = 5


def build_corpus():
    """The headline corpus: 8 x 10 s of 16-bit/44.1 kHz stereo (flac-subset
    style: 4096 blocks, LPC order 8, mid/side)."""
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


def build_mixed_corpus():
    """Anti-self-flattery corpus (VERDICT r1 item 4): varied block sizes,
    LPC orders, stereo modes, partition orders, rice2 and bit depths, plus
    the reference's committed real files."""
    from claxon_tpu.testing import encode_flac, synth_music

    cache = CACHE / f"mixed_{MIXED_VERSION}"
    cache.mkdir(parents=True, exist_ok=True)
    specs = [
        dict(block_size=1152, max_lpc_order=2, partition_order=1),
        dict(block_size=4096, max_lpc_order=12, partition_order=4),
        dict(block_size=4608, max_lpc_order=8, partition_order=3),
        dict(block_size=4096, stereo="left_side", partition_order=2),
        dict(block_size=4096, stereo="right_side", partition_order=2),
        dict(block_size=4096, rice2=True, partition_order=4),
        dict(block_size=2048, bps=24, max_lpc_order=8, partition_order=3),
        dict(block_size=4096, bps=16, force_subframe="fixed",
             partition_order=2),
    ]
    datas = []
    for i, spec in enumerate(specs):
        p = cache / f"m{i:02d}.flac"
        if not p.exists():
            spec = dict(spec)
            bps = spec.pop("bps", 16)
            pcm = synth_music(44100 * 4, channels=2, bps=bps, seed=2000 + i)
            p.write_bytes(encode_flac(pcm, 44100, bps, **spec))
        datas.append(p.read_bytes())
    ref = pathlib.Path("/root/reference/testsamples")
    for name in ("pop.flac", "short.flac", "wasted_bits.flac",
                 "non_subset.flac"):
        f = ref / name
        if f.exists():
            datas.append(f.read_bytes())
    return datas


def pcm_md5(pcm, bps):
    from claxon_tpu.testing import pcm_md5 as canonical
    return canonical(pcm, bps)


def verify_corpus(datas):
    """Bit-exactness gate through the native scalar oracle -- runs before
    any device traffic so the link stays in its clean phase."""
    from claxon_tpu import native

    total = 0
    for data in datas:
        si, pcm = native.decode_stream_scalar(data)
        if si.md5sum != b"\x00" * 16:  # e.g. non_subset.flac stores none
            assert pcm_md5(pcm, si.bits_per_sample) == si.md5sum, \
                "decode is not bit-exact"
        total += pcm.size
    return total


def time_to_device(decode_async, datas, total_samples,
                   seconds, max_reps=200, depth=6):
    """Sustained decode-to-HBM rate: dispatch batches back to back with a
    depth-6 begin/finish overlap (the production async API -- on the
    segmented path batch n's demux round trip hides behind the next
    ``depth`` batches' host work + uploads), closed by one dependent
    flag fetch (the only d2h of the phase, inside the timed window).
    Depth measured round 5 (real chip): the demux summary's d2h response
    waits behind the queued h2d batches on this serializing tunnel, so
    small-batch corpora are LATENCY-bound and deeper helps (mixed
    corpus 6.2 / 9.9 / 11.2 / 11.8 Ms/s at depth 1/2/3/6 in one phase);
    the headline corpus is bandwidth-bound and depth-flat (24.5-25.4)."""
    reps = 0
    in_flight = []
    last = None
    t0 = time.perf_counter()
    while True:
        in_flight.append(decode_async(datas))
        if len(in_flight) > depth:
            last = in_flight.pop(0).finish()
        reps += 1
        if time.perf_counter() - t0 >= seconds or reps >= max_reps:
            break
    for h in in_flight:
        last = h.finish()
    last.sync()
    elapsed = time.perf_counter() - t0
    return total_samples * reps / elapsed / 1e6, reps


def time_pure_upload(datas, seconds, max_reps=200, depth=6):
    """Sustained pure-upload rate on the decode corpus's own bytes: the
    same loop shape and depth as ``time_to_device`` with ALL decode work
    removed (device_put of each stream + one tiny dependent reduction
    per batch, closed by its fetch). The depths MUST match or the
    efficiency quotient measures pipeline-depth mismatch, not
    engineering loss. Measured adjacent to the decode loop, this is the
    honest in-phase ceiling: the clean-phase 16 MiB probe (phase1) is a
    burst rate the tunnel does not sustain (probe ~75 MB/s vs ~30 MB/s
    sustained, tools/link_probe.py), so an efficiency quotient against
    it conflates engineering loss with link weather. decode-rate /
    pure-upload-rate on adjacent windows is the phase-robust figure --
    >= 1.0 means the decode loop saturates everything the link actually
    gives (measured round 5, both at depth 3: 1.14-1.58, decode's
    coalesced group buffers beat per-stream puts)."""
    import jax
    import jax.numpy as jnp

    bufs = [np.frombuffer(d, np.uint8)[:len(d) & ~3].view(np.int32)
            for d in datas]
    nbytes = sum(b.nbytes for b in bufs)

    @jax.jit
    def probe(*xs):
        return sum(x[::1 << 16].astype(jnp.int32).sum() for x in xs)

    np.asarray(probe(*[jnp.asarray(b) for b in bufs]))  # warm compile
    reps = 0
    in_flight = []
    t0 = time.perf_counter()
    while True:
        in_flight.append(probe(*[jnp.asarray(b) for b in bufs]))
        if len(in_flight) > depth:
            np.asarray(in_flight.pop(0))
        reps += 1
        if time.perf_counter() - t0 >= seconds or reps >= max_reps:
            break
    for h in in_flight:
        np.asarray(h)
    elapsed = time.perf_counter() - t0
    return nbytes * reps / elapsed / 1e6, reps


def capture_programs(decode_fn, datas):
    """Run one batch while capturing every (compiled program, device args)
    pair it dispatches -- the re-dispatchable form of the decode step with
    all inputs resident in HBM. Covers both the host-walk bits programs
    and the segmented path's fused demux + decode programs, so the
    resident rate measures the FULL on-chip decode of whichever path ran
    (on the segmented path that includes the demux itself)."""
    import claxon_tpu.ops.seg_parse as sp
    import claxon_tpu.pipeline as pl
    import claxon_tpu.pipeline_bits as pb
    import claxon_tpu.pipeline_seg as ps

    pairs = []

    def wrap(orig):
        def factory(*k, **kw):
            prog = orig(*k, **kw)

            def run(*args, **pkw):
                pairs.append((prog, args))
                return prog(*args, **pkw)

            return run

        return factory

    saved = (pb._stream_program, pb._bits_program, pb._crc_program,
             pl._decode_program, ps._seg_decode_program, sp._program)
    pb._stream_program = wrap(saved[0])
    pb._bits_program = wrap(saved[1])
    pb._crc_program = wrap(saved[2])
    pl._decode_program = wrap(saved[3])
    ps._seg_decode_program = wrap(saved[4])
    sp._program = wrap(saved[5])
    try:
        decode_fn(datas).sync()
    finally:
        (pb._stream_program, pb._bits_program, pb._crc_program,
         pl._decode_program, ps._seg_decode_program, sp._program) = saved
    return pairs


def _probe_outputs(outs):
    """Tiny dependent fetch per program output (completion proof)."""
    import jax

    for o in outs:
        small = jax.tree_util.tree_leaves(o)[-1]
        np.asarray(small if getattr(small, "ndim", 0) == 0
                   else small.ravel()[:1])


def time_device_resident(pairs, total_samples, seconds, max_reps=60):
    """Chip decode rate with the compressed corpus resident in HBM -- the
    staged-corpus scenario (a training input pipeline stages the bits once
    and decodes per epoch): no link traffic in the steady state. All reps
    dispatch back to back (the device executes programs in dispatch
    order) and ONE set of tiny dependent fetches closes each window.

    Three-window form: the tunnel's d2h latency has minutes-long degraded
    phases, so a single closing fetch can bill many times the actual chip
    time to a window (observed: the same close that costs ~10 ms in a
    clean phase stalls > 120 s in a bad one, while dispatch + execution
    are unaffected). All windows end with the identical close, so the
    rep-count SLOPE of window time is chip time with the phase-stable
    close cost cancelled. Three windows give two independent slopes whose
    agreement certifies the decomposition; they are measured in
    NON-MONOTONE rep order (small, large, mid) so that a close cost
    drifting linearly in time -- which in measured-in-rep-order windows
    is mathematically indistinguishable from per-rep chip time and would
    silently inflate the rate -- shows up as a slope disagreement
    instead. The conservative whole-window rate is the fallback when no
    self-consistent decomposition emerges."""
    def window(reps):
        outs = None
        t0 = time.perf_counter()
        for _ in range(reps):
            outs = [prog(*args) for prog, args in pairs]
        _probe_outputs(outs)
        return time.perf_counter() - t0

    window(1)  # warm: drain any pending transfers / stalled phase debt
    if max_reps < 3:
        t = window(max_reps)
        return total_samples * max_reps / t / 1e6, max_reps
    r1 = max(max_reps // 3, 1)
    r2 = max(2 * max_reps // 3, r1 + 1)
    r3 = max(max_reps, r2 + 1)
    t1 = window(r1)
    # Don't grow the later windows past the time budget when the chip is
    # genuinely slow (t1 dominated by execution, not the close).
    if t1 > seconds:
        r3 = min(r3, 2 * r1)
        r2 = min(r2, max(r1 + 1, (r1 + r3) // 2))
        if r2 >= r3:
            # Three distinct rep counts can't be formed (r1 == 1, so the
            # budget clamp collapses r2 into r3): report the conservative
            # single-window rate, as the max_reps < 3 branch does.
            return total_samples * r1 / t1 / 1e6, r1
    conservative = total_samples * r1 / t1 / 1e6
    spent = t1
    for _attempt in range(2):
        t3 = window(r3)
        t2 = window(r2)
        spent += t2 + t3
        conservative = max(conservative,
                           total_samples * r3 / t3 / 1e6,
                           total_samples * r2 / t2 / 1e6)
        s12 = (t2 - t1) / (r2 - r1)
        s23 = (t3 - t2) / (r3 - r2)
        s13 = (t3 - t1) / (r3 - r1)
        close = t1 - r1 * s13
        # Accept only a self-consistent decomposition: positive slopes
        # that agree with each other, and a non-negative implied close
        # cost (small negative = timer noise). Any phase shift between
        # windows -- including a monotone drift, thanks to the shuffled
        # measurement order -- breaks at least one condition.
        if (s13 > 0 and min(s12, s23) > 0
                and abs(s12 - s23) <= 0.3 * s13
                and close >= -0.05 * t1):
            return total_samples / s13 / 1e6, r3
        # Retry costs three more closes. The observed ~2 min degraded-
        # phase closes are worth retrying through (the whole point); only
        # a pathological stall (10+ min spent already) skips the retry so
        # the bench run stays bounded.
        if _attempt == 0 and spent < 600.0:
            t1 = window(r1)
            spent += t1
        else:
            break
    # No consistent decomposition: report the conservative whole-window
    # rate (close cost billed to the reps -- an underestimate).
    return conservative, r3


def main():
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          str(CACHE / "xla_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from claxon_tpu import native
    from claxon_tpu.pipeline import (decode_streams, decode_streams_device,
                                     decode_streams_device_async)

    datas = build_corpus()
    mixed = build_mixed_corpus()
    total_samples = verify_corpus(datas)
    mixed_samples = verify_corpus(mixed)

    # ---- Phase 1: to-device. Warm-up must COMPLETE (sync) before timing:
    # compilation on this backend is asynchronous and block_until_ready
    # acks early, so an unfinished warm-up silently bills its compile to
    # the first timed window.
    #
    # Path choice per corpus is the PRODUCTION rule: segmentation="auto"
    # (pipeline._calibrate_segmentation) warms both paths and times one
    # sync'd run of each, picking the faster. The headline is whatever
    # production would run; the JSON records the choice and the losing
    # path's rate for continuity (VERDICT r3 item 2).
    import jax
    import claxon_tpu.pipeline as pl

    def calibrated(corpus):
        pl._SEG_AUTO["choice"] = None
        dd = decode_streams_device(corpus, segmentation="auto")
        dd.sync()
        choice = pl._SEG_AUTO["choice"]  # None = seg path never engaged
        pl._SEG_AUTO["choice"] = None
        return choice or "host", choice is not None, dd

    seg_choice, seg_engaged, warm = calibrated(datas)
    mixed_choice, mixed_engaged, warm_mixed = calibrated(mixed)

    tiny_sum = jax.jit(lambda x: x.ravel()[::65536].sum())
    probe = np.zeros(4 * 1024 * 1024, dtype=np.int32)  # 16 MiB
    np.asarray(tiny_sum(jax.device_put(probe)))

    def probe_h2d():
        # One 16 MiB upload closed by a dependent fetch. The tunnel's
        # rate swings ~3x between minutes-long phases, so every ceiling
        # is derived from a MEDIAN of probes -- and the efficiency
        # ratios only from probes BRACKETING the phase they normalize.
        t0 = time.perf_counter()
        np.asarray(tiny_sum(jax.device_put(probe)))
        return 16 / (time.perf_counter() - t0)

    # Probes bracketing the to-device timings: the efficiency ratio must
    # compare a rate with the link state DURING that rate's window, not
    # with a probe taken minutes (= link phases) later.
    def dev_async(b):
        return decode_streams_device_async(b, segmentation=seg_choice)

    def mixed_async(b):
        return decode_streams_device_async(b, segmentation=mixed_choice)

    h2d_probes = [probe_h2d()]
    sustained_mbps, _ = time_pure_upload(datas, TO_DEVICE_SECONDS / 2)
    dev_msamples_s, dev_reps = time_to_device(
        dev_async, datas, total_samples, TO_DEVICE_SECONDS)
    h2d_probes.append(probe_h2d())
    sustained_mixed_mbps, _ = time_pure_upload(mixed, TO_DEVICE_SECONDS / 4)
    mixed_dev_msamples_s, _ = time_to_device(
        mixed_async, mixed, mixed_samples, TO_DEVICE_SECONDS / 2)
    h2d_probes.append(probe_h2d())
    # Continuity figures: BOTH paths are always reported, for BOTH
    # corpora (VERDICT r4 item 4). The losing path gets a short window
    # under the same methodology; a segmented figure is 0 when the
    # device demux never engaged on that corpus.
    other = "host" if seg_choice == "device" else "device"
    other_msamples_s = 0.0
    if seg_choice == "device" or seg_engaged:
        other_msamples_s, _ = time_to_device(
            lambda b: decode_streams_device_async(b, segmentation=other),
            datas, total_samples, TO_DEVICE_SECONDS / 2)
    hostwalk_msamples_s = (other_msamples_s if seg_choice == "device"
                           else dev_msamples_s)
    segmented_msamples_s = (dev_msamples_s if seg_choice == "device"
                            else other_msamples_s)
    other_m = "host" if mixed_choice == "device" else "device"
    mixed_other_msamples_s = 0.0
    if mixed_choice == "device" or mixed_engaged:
        mixed_other_msamples_s, _ = time_to_device(
            lambda b: decode_streams_device_async(b, segmentation=other_m),
            mixed, mixed_samples, TO_DEVICE_SECONDS / 2)
    mixed_hostwalk_msamples_s = (mixed_other_msamples_s
                                 if mixed_choice == "device"
                                 else mixed_dev_msamples_s)
    mixed_segmented_msamples_s = (mixed_dev_msamples_s
                                  if mixed_choice == "device"
                                  else mixed_other_msamples_s)
    phase1_mbps = sorted(h2d_probes)[1]

    # ---- Phase 1b: chip decode rate with the compressed corpus resident
    # in HBM (staged once, decoded repeatedly -- the training-input /
    # repeat-serve scenario). This isolates the decode engine from the
    # tunnel: entropy decode + synthesis + epilogue + CRC verify + int16
    # pack, dispatched exactly as production does.
    pairs = capture_programs(
        lambda b: decode_streams_device(b, segmentation=seg_choice), datas)
    resident_msamples_s, resident_reps = time_device_resident(
        pairs, total_samples, TO_DEVICE_SECONDS / 2)
    pairs = None
    # BOTH paths' resident rates are always reported (VERDICT r4 item
    # 4: in r04 `device_resident_msamples_s` silently switched from the
    # host-walk decode-only rate to the segmented-with-demux rate when
    # auto picked the segmented path, breaking round-over-round
    # comparability). The segmented figure includes the fused demux; the
    # host-walk figure is decode-only (bases/deltas staged by the C++
    # walk) -- r02's 194.4 is the host-walk lineage.
    seg_resident_msamples_s = (resident_msamples_s
                               if seg_choice == "device" else 0.0)
    hostwalk_resident_msamples_s = (resident_msamples_s
                                    if seg_choice != "device" else 0.0)
    if seg_choice != "device" and seg_engaged:
        pairs = capture_programs(
            lambda b: decode_streams_device(b, segmentation="device"),
            datas)
        seg_resident_msamples_s, _ = time_device_resident(
            pairs, total_samples, TO_DEVICE_SECONDS / 4)
        pairs = None
    if seg_choice == "device":
        pairs = capture_programs(
            lambda b: decode_streams_device(b, segmentation="host"),
            datas)
        hostwalk_resident_msamples_s, _ = time_device_resident(
            pairs, total_samples, TO_DEVICE_SECONDS / 4)
        pairs = None

    # ---- Phase 1c: host-CPU cost per decoded sample, host walk vs the
    # segmented (device-demux) path. time.process_time() counts CPU only
    # -- device waits don't bill -- so this isolates the host's share of
    # each path: the C++ boundary walk + packing vs header-field decode +
    # chain/bucket planning (VERDICT r2 item 3's >= 5x criterion).
    from claxon_tpu.pipeline_seg import decode_streams_segmented

    # Measured on a 4x-replicated corpus: the host walk's cost is
    # O(payload bytes) so its ns/sample is scale-invariant, while the
    # segmented path's per-batch fixed costs (jit dispatches, small
    # fetches) amortize -- the at-scale number is the honest asymptote
    # for both.
    datas_1c = datas * 4
    samples_1c = total_samples * 4
    _seg_warm = decode_streams_segmented(datas_1c)
    # The metric is only meaningful if the device-demux path actually
    # engaged (a chain break silently falls back to the host walk).
    seg_engaged_1c = getattr(_seg_warm, "segmented", False)
    _seg_warm.sync()  # compile warm-up

    def host_cpu_ns(fn, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.process_time()
            dd = fn(datas_1c)
            dt = time.process_time() - t0
            dd.sync()
            best = min(best, dt)
        return best * 1e9 / samples_1c

    def host_cpu_ns_seg(n=3):
        # process_time() is NOT stall-proof on this runtime: the demux
        # summary wait inside finish_segmented spins in the PJRT client,
        # so a degraded-link phase bills wall stalls as host CPU (r05: a
        # naive measurement read 4.48 ns/sample in a stall phase vs 2.31
        # in r04). Splitting begin/finish with an untimed wall settle
        # between them leaves only real host compute in the window.
        from claxon_tpu.pipeline_seg import begin_segmented, \
            finish_segmented
        best = float("inf")
        for _ in range(n):
            t0 = time.process_time()
            pend = begin_segmented(datas_1c)
            dt = time.process_time() - t0
            if pend is None:
                return host_cpu_ns(decode_streams_segmented)
            time.sleep(1.0)  # let the summary d2h land (wall, untimed)
            t0 = time.process_time()
            dd = finish_segmented(pend)
            dt += time.process_time() - t0
            dd.sync()
            best = min(best, dt)
        return best * 1e9 / samples_1c

    # Pin the path explicitly: with segmentation="auto" the library
    # default, a cached "device" choice would silently turn this into a
    # second segmented measurement.
    hostwalk_ns = host_cpu_ns(
        lambda b: decode_streams_device(b, segmentation="host"))
    seg_ns = host_cpu_ns_seg()
    datas_1c = None

    # Link budget: sustained h2d rate (dependent-fetch barrier -- the only
    # honest one on this transport, see tools/link_probe.py) and the upload
    # bytes per decoded sample. Their quotient is the hard physical ceiling
    # the tunnel imposes on ANY decode-to-device path; reporting it lets
    # the headline be judged against the medium, not just the baseline.
    upload_bytes = getattr(warm, "upload_bytes", 0)
    bytes_per_sample = upload_bytes / max(total_samples, 1)

    # ---- Phase 2: end-to-end to-host (d2h-bound by nature; the process
    # link is in its degraded regime now, which is this phase's reality).
    # Software-pipelined: batch n+1 extracts/dispatches while batch n's
    # PCM streams back. Median over windows (the reference also averages
    # many runs; this link has order-of-magnitude slow phases).
    # Pin the already-calibrated path for the MD5 gate: with the library
    # default ("auto") and _SEG_AUTO reset by calibrated(), a bare
    # decode_streams would re-calibrate on this 1-stream batch -- ~6
    # decodes plus fresh 1-stream compile classes mid-bench, and a
    # cached choice derived from a single stream.
    pl._SEG_AUTO["choice"] = seg_choice
    d = decode_streams(datas[:1])[0]
    assert pcm_md5(d.pcm, d.streaminfo.bits_per_sample) == \
        d.streaminfo.md5sum, "device decode is not bit-exact"

    rates = []
    reps = 0
    bench_t0 = time.perf_counter()
    for _window in range(N_WINDOWS):
        w0 = time.perf_counter()
        w_reps = 0
        in_flight = []
        pending = None

        def _land(p):
            dev = p.finish()
            dev.start_fetch()
            in_flight.append(dev)
            # Depth-6 fetch pipeline: the d2h responses queue behind
            # in-flight h2d uploads on this tunnel (same latency story
            # as time_to_device); measured interleaved depth-3/6 A/B:
            # 5.70/7.60 then 9.13/9.52 Ms/s across an improving phase.
            if len(in_flight) > 6:
                in_flight.pop(0).to_host()

        while True:
            h = dev_async(datas)
            if pending is not None:
                _land(pending)
            pending = h
            w_reps += 1
            if (time.perf_counter() - w0 >= TO_HOST_SECONDS / N_WINDOWS
                    or w_reps >= 20):
                break
        _land(pending)
        for dev in in_flight:
            dev.to_host()
        rates.append(total_samples * w_reps / (time.perf_counter() - w0))
        reps += w_reps
        if time.perf_counter() - bench_t0 > 120:
            break  # pathological stall phase: stop with what we have
    h2d_probes.append(probe_h2d())  # mid-run phase sample
    rates.sort()
    mid = len(rates) // 2
    median = rates[mid] if len(rates) % 2 else \
        (rates[mid - 1] + rates[mid]) / 2
    msamples_s = median / 1e6
    p10 = rates[0] / 1e6
    p90 = rates[-1] / 1e6

    # ---- Phase 3: host scalar decode (FlacReader.blocks(), the
    # claxon-equivalent CPU path) for context. Time-capped.
    from claxon_tpu import FlacReader
    t0 = time.perf_counter()
    n = 0
    deadline = t0 + TO_HOST_SECONDS / 2
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

    h2d_probes.append(probe_h2d())
    h2d_mbps = sorted(h2d_probes)[len(h2d_probes) // 2]
    link_ceiling = (h2d_mbps * 1e6 / bytes_per_sample / 1e6
                    if bytes_per_sample else 0.0)
    # Ceiling-normalized efficiency: the phase-stable figures of merit
    # (VERDICT r2 item 6 -- a bad link phase shifts both the rate and the
    # ceiling, so their ratio survives phase luck).
    phase1_ceiling = (phase1_mbps * 1e6 / bytes_per_sample / 1e6
                      if bytes_per_sample else 0.0)
    mixed_bps = (getattr(warm_mixed, "upload_bytes", 0)
                 / max(mixed_samples, 1))
    mixed_ceiling = (phase1_mbps * 1e6 / mixed_bps / 1e6
                     if mixed_bps else 0.0)
    eff = (dev_msamples_s / phase1_ceiling) if phase1_ceiling else 0.0
    eff_mixed = (mixed_dev_msamples_s / mixed_ceiling) if mixed_ceiling \
        else 0.0
    # The phase-robust efficiency (see time_pure_upload): decode byte
    # rate over the adjacent pure-upload rate. >= 1.0 = link-saturated.
    eff_sustained = (dev_msamples_s * bytes_per_sample / sustained_mbps
                     if sustained_mbps else 0.0)
    eff_sustained_mixed = (mixed_dev_msamples_s * mixed_bps
                           / sustained_mixed_mbps
                           if sustained_mixed_mbps else 0.0)

    backend = "pallas" if (jax.devices()[0].platform == "tpu"
                           and not os.environ.get("CLAXON_TPU_NO_PALLAS")) \
        else "xla-scan"
    print(json.dumps({
        "metric": "decode_throughput_per_chip",
        "value": round(msamples_s, 3),
        "unit": "Msamples/s",
        "vs_baseline": round(msamples_s / BASELINE_MSAMPLES_S, 3),
        "to_device_msamples_s": round(dev_msamples_s, 3),
        "to_device_vs_baseline": round(dev_msamples_s / BASELINE_MSAMPLES_S,
                                       3),
        "to_device_mixed_msamples_s": round(mixed_dev_msamples_s, 3),
        "to_device_path": "segmented" if seg_choice == "device"
                          else "hostwalk",
        "to_device_mixed_path": "segmented" if mixed_choice == "device"
                                else "hostwalk",
        "to_device_hostwalk_msamples_s": round(hostwalk_msamples_s, 3),
        "to_device_segmented_msamples_s": round(segmented_msamples_s, 3),
        "to_device_mixed_hostwalk_msamples_s":
            round(mixed_hostwalk_msamples_s, 3),
        "to_device_mixed_segmented_msamples_s":
            round(mixed_segmented_msamples_s, 3),
        "link_efficiency": round(eff, 3),
        "link_efficiency_mixed": round(eff_mixed, 3),
        "link_efficiency_sustained": round(eff_sustained, 3),
        "link_efficiency_sustained_mixed": round(eff_sustained_mixed, 3),
        "sustained_upload_mbps": round(sustained_mbps, 1),
        "sustained_upload_mixed_mbps": round(sustained_mixed_mbps, 1),
        "device_resident_msamples_s": round(resident_msamples_s, 3),
        "device_resident_hostwalk_msamples_s":
            round(hostwalk_resident_msamples_s, 3),
        "device_resident_segmented_msamples_s":
            round(seg_resident_msamples_s, 3),
        "device_resident_reps": resident_reps,
        "to_host_p10_msamples_s": round(p10, 3),
        "to_host_p90_msamples_s": round(p90, 3),
        "to_host_window_rates_msamples_s": [round(r / 1e6, 3)
                                            for r in rates],
        "host_scalar_msamples_s": round(scalar_msamples_s, 3),
        "host_cpu_ns_per_sample_hostwalk": round(hostwalk_ns, 2),
        "host_cpu_ns_per_sample_segmented": round(seg_ns, 2),
        "host_demux_speedup": round(hostwalk_ns / max(seg_ns, 1e-9), 2),
        "segmented_engaged": seg_engaged_1c,
        "synthesis_backend": backend,
        "entropy_decode": "device" if not os.environ.get(
            "CLAXON_TPU_NO_BITS") else "host",
        "native_demux": native.available(),
        "upload_bytes_per_sample": round(bytes_per_sample, 3),
        "upload_bytes_per_sample_mixed": round(mixed_bps, 3),
        "link_h2d_phase1_mbps": round(phase1_mbps, 1),
        "link_h2d_mbps": round(h2d_mbps, 1),
        "link_h2d_probes_mbps": [round(x, 1) for x in h2d_probes],
        "link_ceiling_msamples_s": round(link_ceiling, 1),
        "streams": len(datas),
        "mixed_streams": len(mixed),
        "reps": reps,
        "to_device_reps": dev_reps,
    }))


if __name__ == "__main__":
    main()
