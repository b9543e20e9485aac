"""claxon_tpu: a TPU-native FLAC decoding framework.

A from-scratch reimplementation of the capabilities of the Claxon FLAC
decoder (reference: ruuda/claxon v0.4.3, mounted at /root/reference), built
TPU-first:

* A 1:1 public API: ``FlacReader`` with ``blocks()``/``samples()``
  iterators, ``StreamInfo``/Vorbis-comment metadata, Ogg- and MP4-embedded
  FLAC support, and hardened error handling (``FormatError``/
  ``Unsupported``/``IoError``).
* A reference-fidelity scalar host path (this package's pure-Python
  modules) serving as oracle and fallback.
* A C++ host demux core (``claxon_tpu.native``) that segments frames and
  extracts residuals/descriptors at native speed.
* Batched device kernels (``claxon_tpu.ops``, JAX/XLA/Pallas) that perform
  the numeric reconstruction -- fixed/LPC prediction, wasted-bits shifts,
  stereo decorrelation -- for many frames per dispatch, orchestrated by
  ``claxon_tpu.pipeline``.
* Multi-chip scaling as a pure data-parallel map over frames
  (``claxon_tpu.parallel``).

All decode paths are bit-exact against each other and against the MD5
signature of the original PCM stored in STREAMINFO.
"""

from .error import Error, IoError, FormatError, Unsupported
from .frame import Block, FrameReader
from .metadata import StreamInfo, VorbisComment
from .reader import (FlacReader, FlacReaderOptions, FlacSamples,
                     FlacIntoSamples)

__version__ = "0.1.0"

__all__ = [
    "Error", "IoError", "FormatError", "Unsupported",
    "Block", "FrameReader",
    "StreamInfo", "VorbisComment",
    "FlacReader", "FlacReaderOptions", "FlacSamples", "FlacIntoSamples",
    "__version__",
]
