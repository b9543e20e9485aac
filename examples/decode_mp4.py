#!/usr/bin/env python
"""Decode a FLAC-in-MP4 (.mp4/.m4a) file to WAV.

Counterpart of the reference's `examples/decode_mp4.rs:26-167`: find the
FLAC track, take STREAMINFO from the FLACSpecificBox, then walk the chunk
offsets (stco) and samples-per-chunk (stsc) tables, decoding
samples-per-chunk FLAC frames at each chunk offset.

Usage: python examples/decode_mp4.py FILE.mp4
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from claxon_tpu.containers import read_flac_from_mp4
from claxon_tpu.frame import FrameReader
from claxon_tpu.io.readers import MemReader
from claxon_tpu.utils import write_wav


def decode_frames(data, offset, num_frames, buffer, parts):
    """Decode ``num_frames`` frames starting at byte ``offset``
    (reference `decode_mp4.rs:132-167`)."""
    frames = FrameReader(MemReader(data, pos=offset))
    for _ in range(num_frames):
        block = frames.read_next_or_eof(buffer)
        if block is None:
            break
        parts.append(np.stack([np.array(block.channel(ch))
                               for ch in range(block.channels())], axis=1))
        buffer = block.into_buffer()
    return buffer


def decode_file(fname):
    data = pathlib.Path(fname).read_bytes()
    track = read_flac_from_mp4(data)
    si = track.streaminfo
    parts = []
    buf = None
    for offset, n in zip(track.chunk_offsets, track.samples_per_chunk):
        buf = decode_frames(data, offset, n, buf, parts)
    pcm = (np.concatenate(parts, axis=0) if parts
           else np.zeros((0, si.channels), np.int32))
    out = pathlib.Path(fname).with_suffix(".wav")
    write_wav(out, pcm, si.sample_rate, si.bits_per_sample)
    print(f"{fname} -> {out}")


if __name__ == "__main__":
    if len(sys.argv) != 2:
        print(__doc__)
        sys.exit(1)
    decode_file(sys.argv[1])
