#!/usr/bin/env python
"""Decode FLAC files to WAV at full speed -- `flac -d` equivalent.

Counterpart of the reference's performance-champion example
(`examples/decode.rs:20-66`, the binary behind its published libflac
comparison). The default path is the framework's flagship pipeline (C++
demux + batched TPU kernels); ``--scalar`` uses the streaming ``blocks()``
API with buffer recycling, mirroring the reference example line by line.

Usage: python examples/decode.py [--scalar] FILE [FILE ...]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from claxon_tpu import FlacReader
from claxon_tpu.utils import write_wav


def decode_file_scalar(fname):
    """Streaming decode via blocks() with a recycled buffer
    (reference `examples/decode.rs:20-66`)."""
    reader = FlacReader.open(fname)
    si = reader.streaminfo()
    frames = reader.blocks()
    buf = None
    parts = []
    while (block := frames.read_next_or_eof(buf)) is not None:
        parts.append(np.stack([np.array(block.channel(ch))
                               for ch in range(block.channels())], axis=1))
        buf = block.into_buffer()
    pcm = (np.concatenate(parts, axis=0) if parts
           else np.zeros((0, si.channels), np.int32))
    out = pathlib.Path(fname).with_suffix(".wav")
    write_wav(out, pcm, si.sample_rate, si.bits_per_sample)
    return out


def decode_file_pipeline(fname):
    """Batched pipeline decode (native demux + device kernels)."""
    from claxon_tpu.pipeline import decode_stream
    dec = decode_stream(pathlib.Path(fname).read_bytes())
    si = dec.streaminfo
    out = pathlib.Path(fname).with_suffix(".wav")
    write_wav(out, dec.pcm, si.sample_rate, si.bits_per_sample)
    return out


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    scalar = "--scalar" in argv
    if not args:
        print(__doc__)
        return 1
    for fname in args:
        out = (decode_file_scalar if scalar else decode_file_pipeline)(fname)
        print(f"{fname} -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
