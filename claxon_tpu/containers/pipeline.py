"""Container decode through the batched TPU pipeline.

The reference's container examples decode frame-at-a-time on the CPU; here
the same demux layers feed the batched device pipeline: Ogg audio packets
are whole consecutive FLAC frames (one per packet) and MP4 chunks are runs
of consecutive frames, so concatenating them reconstitutes a plain frame
section. With the native core that section rides the flagship bits
pipeline (boundary-only host walk, on-device entropy decode --
``pipeline_bits``); otherwise the FrameDesc path decodes it.
"""

import io as _io

from ..error import Error, fmt_err
from ..io.readers import MemReader
from ..metadata import read_metadata_block_with_header
from .mp4 import read_flac_from_mp4
from .ogg import read_flac_from_ogg

__all__ = ["decode_ogg_stream", "decode_mp4_stream"]


def _extract_section(payload, use_native, max_frames=None):
    from ..extract import extract_frames
    from ..pipeline import _native_mod

    if use_native:
        native = _native_mod()
        if native is not None:
            return native.extract_frames(payload, max_frames)
    return extract_frames(MemReader(payload), max_frames=max_frames)


#: merged container payloads past this use the FrameDesc path -- chunk
#: bit bases are int32 positions into the stream upload (see pipeline.py's
#: matching gate on whole-stream batches). CLAXON_TPU_BITS_PAYLOAD_CAP
#: overrides (tests exercise the boundary without a 128 MiB payload).
_BITS_PAYLOAD_CAP = 1 << 27


def _payload_cap():
    import os

    v = os.environ.get("CLAXON_TPU_BITS_PAYLOAD_CAP")
    return int(v) if v else _BITS_PAYLOAD_CAP


def _cap_fallback(n_bytes):
    """Describe the silent-looking path switch once per process."""
    import warnings

    warnings.warn(
        f"container payload of {n_bytes} bytes exceeds the bits-pipeline "
        f"cap ({_payload_cap()}); decoding via the FrameDesc path "
        "(slower uplink, same result)", RuntimeWarning, stacklevel=3)


def _bits_native(use_native):
    """The native module when the bits fast path applies, else None."""
    import os

    from ..pipeline import _native_mod

    if not use_native or os.environ.get("CLAXON_TPU_NO_BITS"):
        return None
    return _native_mod()


def _defer_crc():
    import os

    return not os.environ.get("CLAXON_TPU_HOST_CRC")


def _decode_frames_bits(streaminfo, batches, native):
    """Decode merged per-chunk BitsBatches through the flagship bits
    pipeline (on-device entropy decode; see pipeline_bits)."""
    from ..pipeline_bits import decode_raw_bits_device

    bb = native.merge_bits_batches(batches)
    dd = decode_raw_bits_device([(streaminfo, bb)])
    return dd.start_fetch().to_host()[0]


def _decode_frames(streaminfo, frames):
    from ..extract import StreamBatch
    from ..pipeline import decode_batch

    return decode_batch(StreamBatch(streaminfo=streaminfo, frames=frames))


def decode_ogg_stream(data, use_native=True, verify_crc=True):
    """Decode a whole FLAC-in-Ogg stream (bytes) through the TPU pipeline;
    returns a ``DecodedStream``."""
    stream = _io.BytesIO(data) if isinstance(
        data, (bytes, bytearray, memoryview)) else data
    streaminfo, header_packets, audio_packets = read_flac_from_ogg(
        stream, verify_crc=verify_crc)
    for packet in header_packets:
        # Metadata blocks: decoded (validated) and discarded, mirroring
        # the reference example (`examples/decode_ogg.rs:39-43`).
        read_metadata_block_with_header(MemReader(packet))
    # Every audio packet is exactly one frame, so the concatenation is a
    # plain frame section.
    payload = b"".join(p for p in audio_packets if p)
    native = _bits_native(use_native)
    if native is not None:
        if len(payload) < _payload_cap():
            bb = native.extract_frames_bits(payload, emit_slots=False,
                                            defer_crc=_defer_crc())
            return _decode_frames_bits(streaminfo, [bb], native)
        _cap_fallback(len(payload))
    return _decode_frames(streaminfo,
                          _extract_section(payload, use_native))


def decode_mp4_stream(data, use_native=True):
    """Decode a whole FLAC-in-MP4 file (bytes) through the TPU pipeline;
    returns a ``DecodedStream``."""
    data = bytes(data)
    view = memoryview(data)
    track = read_flac_from_mp4(data)
    # Bound each chunk's byte range by the next chunk's offset (offsets may
    # be written in any order) so a decode never copies the whole file
    # suffix per chunk.
    sorted_offsets = sorted(o for o, n in
                            zip(track.chunk_offsets,
                                track.samples_per_chunk) if n)
    native = _bits_native(use_native)
    use_bits = native is not None and len(data) < _payload_cap()
    if native is not None and not use_bits:
        _cap_fallback(len(data))
    frames, batches = [], []

    def _crc_before_error():
        # Reference order parity: frames of EARLIER chunks (and of the
        # current chunk's successful prefix) precede the error about to
        # surface, so any deferred CRC mismatch among them wins -- the
        # sequential reference would have hit it first. The C++ walker
        # only re-verifies within one extract call; chunks are separate
        # calls, so the cross-chunk pass happens here.
        from ..pipeline_bits import _host_verify_deferred

        for done in batches:
            _host_verify_deferred(done, len(done.bframes))

    for offset, n in zip(track.chunk_offsets, track.samples_per_chunk):
        if not n:
            continue
        if not 0 <= offset < len(data):
            if use_bits:
                _crc_before_error()
            fmt_err("invalid MP4 chunk offset")
        nxt = [o for o in sorted_offsets if o > offset]
        end = nxt[0] if nxt else len(data)
        # A chunk holds exactly n frames; the bounded parse stops before
        # any inter-chunk slack (`examples/decode_mp4.rs:132-167`).
        if use_bits:
            used = []
            try:
                bb = native.extract_frames_bits(view[offset:end],
                                                emit_slots=False,
                                                max_frames=n,
                                                consumed=used,
                                                defer_crc=_defer_crc())
            except Error:
                _crc_before_error()
                raise
            # Trim inter-chunk slack so merged chunk payloads reconstitute
            # a contiguous frame section.
            bb.payload = view[offset:offset + used[0]]
            batches.append(bb)
            if len(bb.bframes) < n:
                _crc_before_error()
                fmt_err("MP4 chunk ends before its declared frame count")
            continue
        got = _extract_section(view[offset:end], use_native, max_frames=n)
        if len(got) < n:
            fmt_err("MP4 chunk ends before its declared frame count")
        frames.extend(got)
    if use_bits and batches:
        return _decode_frames_bits(track.streaminfo, batches, native)
    return _decode_frames(track.streaminfo, frames)
