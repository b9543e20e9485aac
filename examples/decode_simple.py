#!/usr/bin/env python
"""Decode a FLAC file to WAV via the simple ``samples()`` iterator.

Counterpart of the reference's `examples/decode_simple.rs:1-56`, including
the exhaustive error-variant match it demonstrates
(`decode_simple.rs:40-56`).

Usage: python examples/decode_simple.py FILE
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from claxon_tpu import FlacReader
from claxon_tpu.error import Error, IoError, FormatError, Unsupported
from claxon_tpu.utils import write_wav


def decode_file(fname):
    reader = FlacReader.open(fname)
    si = reader.streaminfo()
    samples = np.fromiter(reader.samples(), dtype=np.int32)
    pcm = samples.reshape(-1, si.channels)
    out = pathlib.Path(fname).with_suffix(".wav")
    write_wav(out, pcm, si.sample_rate, si.bits_per_sample)
    print(f"{fname} -> {out}")


def main(argv):
    if len(argv) != 1:
        print(__doc__)
        return 1
    try:
        decode_file(argv[0])
    except IoError as e:
        # An IO error: file not found, no permissions, unexpected EOF, ...
        print(f"A problem with the underlying IO occurred: {e}")
        return 2
    except FormatError as e:
        print(f"The input is not valid FLAC: {e}")
        return 3
    except Unsupported as e:
        print(f"This feature of the FLAC format is not supported: {e}")
        return 4
    except Error as e:
        print(f"Decode error: {e}")
        return 5
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
