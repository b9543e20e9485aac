#!/usr/bin/env python
"""Regenerate the committed test corpus (testsamples/generated/).

Deterministic, spec-derived streams covering every decode path; each file's
STREAMINFO carries the true PCM MD5, so the corpus is self-verifying (the
role the reference's committed testsamples + external `flac` binary play,
`tests/testsamples.rs:164-212`). Re-running must be byte-identical.
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from claxon_tpu.testing import encode_flac, synth_music

OUT = pathlib.Path(__file__).resolve().parent.parent / "testsamples" / \
    "generated"

CASES = {
    "stereo16.flac": lambda: encode_flac(
        synth_music(30000, channels=2, bps=16, seed=101), 44100, 16,
        tags=(("TITLE", "stereo16"), ("ARTIST", "claxon_tpu"))),
    "mono8_fixed.flac": lambda: encode_flac(
        synth_music(8000, channels=1, bps=8, seed=102), 22050, 8,
        force_subframe="fixed", block_size=1152),
    "hires24.flac": lambda: encode_flac(
        synth_music(20000, channels=2, bps=24, seed=103), 96000, 24,
        max_lpc_order=16, lpc_precision=15, block_size=2048),
    "nonsubset32.flac": lambda: encode_flac(
        synth_music(6000, channels=2, bps=20, seed=104), 48000, 20,
        max_lpc_order=32, block_size=8192),
    "rice2.flac": lambda: encode_flac(
        synth_music(9000, channels=2, bps=16, seed=105), 44100, 16,
        rice2=True, partition_order=4),
    "wasted.flac": lambda: encode_flac(
        np.asarray(synth_music(9000, channels=2, bps=16, seed=106))
        & ~np.int64(0xF), 44100, 16),
    "sixchan.flac": lambda: encode_flac(
        synth_music(5000, channels=6, bps=16, seed=107), 48000, 16,
        block_size=576),
    "verbatim.flac": lambda: encode_flac(
        synth_music(2000, channels=2, bps=16, seed=108), 44100, 16,
        force_subframe="verbatim", block_size=256),
    "constant.flac": lambda: encode_flac(
        np.full((4096, 2), -777, dtype=np.int64), 44100, 16,
        force_subframe="constant"),
    "variable_blocking.flac": lambda: encode_flac(
        synth_music(7000, channels=2, bps=16, seed=109), 44100, 16,
        variable_blocking=True, block_size=1000),
    "leftside.flac": lambda: encode_flac(
        synth_music(6000, channels=2, bps=16, seed=110), 44100, 16,
        stereo="left_side"),
    "rightside.flac": lambda: encode_flac(
        synth_music(6000, channels=2, bps=16, seed=111), 44100, 16,
        stereo="right_side"),
}


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    for name, gen in CASES.items():
        data = gen()
        path = OUT / name
        if path.exists() and path.read_bytes() == data:
            print(f"unchanged {name} ({len(data)} bytes)")
        else:
            path.write_bytes(data)
            print(f"wrote {name} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
