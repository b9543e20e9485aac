#!/usr/bin/env python
"""Decode a FLAC-in-Ogg file to WAV.

Counterpart of the reference's `examples/decode_ogg.rs:26-125`: the first
packet carries the mapping header + STREAMINFO, subsequent header packets
are metadata blocks (decoded and discarded), and every audio packet is one
FLAC frame decoded by a FrameReader over an in-memory cursor.

Usage: python examples/decode_ogg.py FILE.oga
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from claxon_tpu.containers import read_flac_from_ogg
from claxon_tpu.frame import FrameReader
from claxon_tpu.io.readers import MemReader
from claxon_tpu.metadata import read_metadata_block_with_header
from claxon_tpu.utils import write_wav


def decode_frame(packet, buffer):
    """Decode one audio packet (= one FLAC frame); returns (samples, buf)."""
    frames = FrameReader(MemReader(packet))
    block = frames.read_next_or_eof(buffer)
    if block is None:
        return None, buffer
    arr = np.stack([np.array(block.channel(ch))
                    for ch in range(block.channels())], axis=1)
    return arr, block.into_buffer()


def decode_file(fname):
    with open(fname, "rb") as f:
        streaminfo, header_packets, audio_packets = read_flac_from_ogg(f)
        for packet in header_packets:
            # Decode and discard remaining metadata (mirrors
            # `decode_ogg.rs:39-43`).
            read_metadata_block_with_header(MemReader(packet))
        parts = []
        buf = None
        for packet in audio_packets:
            if not packet:
                continue  # empty packets are allowed; skip them
            arr, buf = decode_frame(packet, buf)
            if arr is not None:
                parts.append(arr)
    pcm = (np.concatenate(parts, axis=0) if parts
           else np.zeros((0, streaminfo.channels), np.int32))
    out = pathlib.Path(fname).with_suffix(".wav")
    write_wav(out, pcm, streaminfo.sample_rate, streaminfo.bits_per_sample)
    print(f"{fname} -> {out}")


if __name__ == "__main__":
    if len(sys.argv) != 2:
        print(__doc__)
        sys.exit(1)
    decode_file(sys.argv[1])
