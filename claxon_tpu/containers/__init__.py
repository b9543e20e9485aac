"""Container demuxers for FLAC-in-Ogg and FLAC-in-MP4.

The reference supports these through its examples plus external crates
(`examples/decode_ogg.rs:1-14` uses the ``ogg`` crate,
`examples/decode_mp4.rs:1-16` uses ``mp4parse``); this package provides the
equivalent demux layers spec-derived in Python, and the high-level
``read_flac_from_ogg`` / ``read_flac_from_mp4`` entry points used by the
examples and by ``claxon_tpu.pipeline`` container decoding.
"""

from .ogg import OggPacketReader, read_flac_from_ogg
from .mp4 import Mp4FlacTrack, read_flac_from_mp4
from .pipeline import decode_ogg_stream, decode_mp4_stream

__all__ = ["OggPacketReader", "read_flac_from_ogg",
           "Mp4FlacTrack", "read_flac_from_mp4",
           "decode_ogg_stream", "decode_mp4_stream"]
