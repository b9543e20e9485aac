#!/usr/bin/env python
"""Corpus-scale verification: every decode path, bit-exact, at scale.

The reference validates against real-world corpora: `verify_extra_samples`
walks `testsamples/extra` (a symlink to a music library) comparing every
sample against the `flac` binary, and the changelog records verification
over >11000 files (`tests/testsamples.rs:471-496`, `changelog.md:88-89`).
This environment has no network and no real music library, so this tool
provides both halves as far as physically possible:

* ``python tools/verify_samples.py DIR`` -- walk DIR recursively and
  verify every ``*.flac`` found (point it at a music library when one is
  available; the committed reference samples work too).
* ``python tools/verify_samples.py --generate N [--seed S]`` -- the
  corpus-scale self-test: N streams with randomized audio content AND
  randomized encoder configuration (block size, LPC order, partition
  order, stereo mode, rice2, bit depth, channels, wasted bits, forced
  subframe types), verified the same way. The STREAMINFO MD5 is computed
  from the ORIGINAL PCM before encoding, so an encoder bug cannot
  self-confirm a matching decoder bug.

Per file, three checks (mirroring the reference's three comparisons):
  1. native scalar decode matches the STREAMINFO MD5 (the oracle);
  2. the batched device pipeline (bits path) is bit-identical to 1 --
     files are decoded in batches to amortize the link;
  3. metadata: streaminfo fields parse and tags round-trip.

Exit code 0 iff every file passes. Use --cpu to force the CPU backend
(no TPU traffic; the kernels are identical). --segmented routes check 2
through ``decode_streams_segmented`` (on-device frame segmentation +
subframe demux + single-pass delta decode) and reports how many streams
rode the device demux vs took the per-stream host fallback.
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _pcm_md5(pcm, bps):
    from claxon_tpu.testing import pcm_md5
    return pcm_md5(pcm, bps)


def random_stream(rng, max_samples=44100):
    """One randomized (content, encoder-config) FLAC stream + its PCM."""
    from claxon_tpu.testing import encode_flac, synth_music

    bps = int(rng.choice([8, 12, 16, 20, 24]))
    channels = int(rng.choice([1, 2, 2, 2, 3, 4]))  # stereo-weighted
    n = int(rng.integers(1, max_samples))
    pcm = synth_music(n, channels=channels, bps=bps,
                      seed=int(rng.integers(0, 1 << 31)))
    if rng.random() < 0.1:  # silence stretches exercise constant frames
        a = int(rng.integers(0, n + 1))
        b = int(rng.integers(a, n + 1))
        pcm[a:b] = 0
    if rng.random() < 0.1:  # wasted bits
        pcm &= ~np.int64((1 << int(rng.integers(1, 4))) - 1)
    kw = dict(
        block_size=int(rng.choice([192, 576, 1024, 1152, 2048, 4096,
                                   4608])),
        max_lpc_order=int(rng.choice([0, 2, 4, 8, 12, 16])),
        # Up to order 7 = 128 partitions: the encoder clamps per
        # subframe (divisibility + warm-up fit), and > 64 partitions
        # exercises the segmented path's per-stream fallback (P_CAP).
        partition_order=int(rng.integers(0, 8)),
        rice2=bool(rng.random() < 0.25),
        lpc_precision=int(rng.choice([12, 14, 15])),
    )
    if channels == 2:
        kw["stereo"] = str(rng.choice(["auto", "independent", "left_side",
                                       "right_side", "mid_side"]))
    if rng.random() < 0.15:
        kw["force_subframe"] = str(rng.choice(["constant", "verbatim",
                                               "fixed"]))
        if kw["force_subframe"] == "constant":
            pcm[:] = pcm[0]
    if rng.random() < 0.2:
        kw["variable_blocking"] = True
    data = encode_flac(pcm, 44100, bps, **kw)
    return data, pcm.astype(np.int32)


#: --segmented engagement accounting: streams decoded via the device
#: demux vs per-stream host fallbacks (both must be bit-exact; the split
#: shows how much of the sweep really exercised the newest path).
SEG_STATS = {"device": 0, "fallback": 0}


def verify_batch(datas, origs, use_device=True, segmented=False):
    """Run the three checks over one batch; returns a list of failures."""
    from claxon_tpu import FlacReader, FlacReaderOptions, native
    from claxon_tpu.pipeline import decode_streams_device

    fails = []
    scalar = []
    for i, data in enumerate(datas):
        si, pcm = native.decode_stream_scalar(data)
        if si.md5sum != b"\x00" * 16 and \
                _pcm_md5(pcm, si.bits_per_sample) != si.md5sum:
            fails.append((i, "scalar decode does not match STREAMINFO MD5"))
        if origs is not None and origs[i] is not None and \
                not np.array_equal(pcm, origs[i]):
            fails.append((i, "scalar decode does not match original PCM"))
        scalar.append(pcm)
        r = FlacReader(data, FlacReaderOptions(metadata_only=True,
                                               read_vorbis_comment=True))
        if r.streaminfo().channels != si.channels:
            fails.append((i, "metadata-only streaminfo mismatch"))
    if use_device:
        if segmented:
            from claxon_tpu.pipeline_seg import decode_streams_segmented
            dd = decode_streams_segmented(datas)
            fb = set(getattr(dd, "fallback_streams", []))
            if not getattr(dd, "segmented", False):
                fb = set(range(len(datas)))
            SEG_STATS["fallback"] += len(fb)
            SEG_STATS["device"] += len(datas) - len(fb)
        else:
            # Pinned to the host walk: path coverage must be
            # deterministic here (the library default "auto" would
            # calibrate on the first batch and ride one winner).
            dd = decode_streams_device(datas, segmentation="host")
        res = dd.to_host()
        for i, (dec, pcm) in enumerate(zip(res, scalar)):
            if not np.array_equal(dec.pcm, pcm):
                fails.append((i, "device pipeline is not bit-identical to "
                                 "the scalar oracle"))
    return fails


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dir", nargs="?", help="directory of .flac files")
    ap.add_argument("--generate", type=int, default=0,
                    help="generate-and-verify N randomized streams")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (identical kernels)")
    ap.add_argument("--no-device", action="store_true",
                    help="scalar + metadata checks only")
    ap.add_argument("--segmented", action="store_true",
                    help="route the device check through the segmented "
                         "(on-device demux) path, decode_streams_segmented")
    ap.add_argument("--shards", type=int, default=0,
                    help="split --generate across this many child "
                         "processes (XLA:CPU accumulates JIT state; very "
                         "large in-process runs can exhaust it)")
    args = ap.parse_args()

    if args.shards > 1 and args.generate:
        import subprocess

        per = -(-args.generate // args.shards)
        failed = 0
        for i in range(args.shards):
            n = min(per, args.generate - i * per)
            if n <= 0:
                break
            cmd = [sys.executable, __file__, "--generate", str(n),
                   "--seed", str(args.seed + 7919 * i),
                   "--batch", str(args.batch)]
            if args.cpu:
                cmd.append("--cpu")
            if args.no_device:
                cmd.append("--no-device")
            if args.segmented:
                cmd.append("--segmented")
            failed |= subprocess.call(cmd)
        print("all shards done;", "FAILURES above" if failed else "all ok")
        return failed

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        # Randomized configs hit many (shape, class) program variants; the
        # persistent cache makes repeat TPU runs compile-free. CPU runs
        # must NOT use it: XLA:CPU AOT cache entries fail to reload on
        # this jax build (machine-feature mismatch -> LLVM alloc errors
        # and SIGSEGV).
        cache = (pathlib.Path(__file__).resolve().parent.parent /
                 ".bench_cache")
        try:
            jax.config.update("jax_compilation_cache_dir",
                              str(cache / "xla_cache"))
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
        except Exception:
            pass

    from claxon_tpu.error import Error

    t0 = time.perf_counter()
    n_files = n_failed = 0
    rng = np.random.default_rng(args.seed)

    def run_batch(names, datas, origs):
        nonlocal n_failed
        try:
            fails = verify_batch(datas, origs,
                                 use_device=not args.no_device,
                                 segmented=args.segmented)
        except Error as e:
            print(f"FAIL batch {names[0]}..: decode error {e}")
            n_failed += len(datas)
            return
        for i, why in fails:
            print(f"FAIL {names[i]}: {why}")
        n_failed += len(set(i for i, _ in fails))

    if args.generate:
        batch_n, batch_d, batch_o = [], [], []
        for j in range(args.generate):
            data, pcm = random_stream(rng)
            n_files += 1
            batch_n.append(f"gen#{j}")
            batch_d.append(data)
            batch_o.append(pcm)
            if len(batch_d) >= args.batch:
                run_batch(batch_n, batch_d, batch_o)
                batch_n, batch_d, batch_o = [], [], []
        if batch_d:
            run_batch(batch_n, batch_d, batch_o)
    elif args.dir:
        batch_n, batch_d = [], []
        for p in sorted(pathlib.Path(args.dir).rglob("*.flac")):
            data = p.read_bytes()
            try:  # skip files that are (deliberately) invalid
                from claxon_tpu import native
                native.decode_stream_scalar(data)
            except Error:
                continue
            n_files += 1
            batch_n.append(str(p))
            batch_d.append(data)
            if len(batch_d) >= args.batch:
                run_batch(batch_n, batch_d, None)
                batch_n, batch_d = [], []
        if batch_d:
            run_batch(batch_n, batch_d, None)
    else:
        ap.error("give a directory or --generate N")

    dt = time.perf_counter() - t0
    seg_note = ""
    if args.segmented and not args.no_device:
        seg_note = (f" (segmented: {SEG_STATS['device']} via device "
                    f"demux, {SEG_STATS['fallback']} per-stream "
                    f"fallbacks)")
    print(f"verified {n_files} files in {dt:.1f} s: "
          f"{n_files - n_failed} ok, {n_failed} failed{seg_note}")
    return 1 if n_failed else 0


if __name__ == "__main__":
    sys.exit(main())
