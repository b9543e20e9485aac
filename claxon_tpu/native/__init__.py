"""C++ host demux core (native production path).

Loads ``libclaxon_demux.so`` via ctypes when built (``python -m
claxon_tpu.native.build``); falls back cleanly when absent --
``available()`` returns False and callers use the Python extractor.
"""

from .binding import (available, extract_stream, extract_stream_raw,
                      extract_stream_bits, extract_frames_bits, BitsBatch,
                      merge_bits_batches, crc16_bytes,
                      extract_frames, decode_frames_limited,
                      decode_stream_scalar, has_pack_helpers, rows_to_i16,
                      minmax)

__all__ = ["available", "extract_stream", "extract_stream_raw",
           "extract_stream_bits", "extract_frames_bits", "BitsBatch",
           "merge_bits_batches", "crc16_bytes",
           "extract_frames", "decode_frames_limited",
           "decode_stream_scalar", "has_pack_helpers", "rows_to_i16",
           "minmax"]
