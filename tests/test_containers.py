"""Round-trip tests for the FLAC-in-Ogg and FLAC-in-MP4 container layers
(reference parity: `examples/decode_ogg.rs`, `examples/decode_mp4.rs`).
The muxers live in claxon_tpu.testing; the demuxers under test in
claxon_tpu.containers."""

import io
import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from claxon_tpu import FlacReader
from claxon_tpu.containers import read_flac_from_ogg, read_flac_from_mp4
from claxon_tpu.containers.ogg import OggPacketReader
from claxon_tpu.error import FormatError
from claxon_tpu.frame import FrameReader
from claxon_tpu.io.readers import MemReader
from claxon_tpu.testing import (encode_flac, synth_music, split_flac,
                                mux_ogg_flac, mux_mp4_flac)
from util import decode_all_blocks, interleave


def make_flac(n=9000, tags=(("TITLE", "t"), ("ARTIST", "a")), **kw):
    pcm = synth_music(n, channels=2, bps=16, seed=77)
    return encode_flac(pcm, 44100, 16, block_size=1024, tags=tags, **kw)


def reference_pcm(flac):
    return interleave(decode_all_blocks(FlacReader(flac)))


def test_split_flac_roundtrip():
    flac = make_flac()
    blocks, frames = split_flac(flac)
    assert len(frames) == 9  # ceil(9000 / 1024)
    assert b"fLaC" + b"".join(blocks) + b"".join(frames) == flac


def test_ogg_roundtrip():
    flac = make_flac()
    ogg = mux_ogg_flac(flac)
    want = reference_pcm(flac)

    streaminfo, headers, audio = read_flac_from_ogg(io.BytesIO(ogg))
    assert streaminfo.sample_rate == 44100
    n_headers = sum(1 for _ in headers)
    assert n_headers >= 1  # at least the Vorbis comment block

    parts = []
    buf = None
    for packet in audio:
        block = FrameReader(MemReader(packet)).read_next_or_eof(buf)
        parts.append(np.stack([np.array(block.channel(c))
                               for c in range(block.channels())], axis=1))
        buf = block.into_buffer()
    got = np.concatenate(parts, axis=0)
    assert np.array_equal(got, want)


def test_ogg_large_packet_spanning_pages():
    # Verbatim subframes make frames large enough to exercise 255-lacing
    # continuation across pages.
    pcm = synth_music(70000, channels=2, bps=16, seed=78)
    flac = encode_flac(pcm, 44100, 16, block_size=32768,
                       force_subframe="verbatim")
    ogg = mux_ogg_flac(flac)
    want = reference_pcm(flac)
    _si, headers, audio = read_flac_from_ogg(io.BytesIO(ogg))
    list(headers)
    parts = []
    for packet in audio:
        block = FrameReader(MemReader(packet)).read_next_or_eof()
        parts.append(np.stack([np.array(block.channel(c))
                               for c in range(block.channels())], axis=1))
    assert np.array_equal(np.concatenate(parts, axis=0), want)


def test_ogg_orphaned_continuation_is_dropped():
    # A page with the continuation flag set while no partial packet is
    # pending carries the tail of a packet whose head was never seen
    # (e.g. after interleaved pages of another serial); those segments
    # must be discarded, not glued onto the next packet.
    import struct

    from claxon_tpu.containers.ogg import ogg_page_crc

    def page(serial, seq, segs, htype=0):
        lacing = b"".join(bytes([l]) for s in segs
                          for l in [255] * (len(s) // 255) + [len(s) % 255])
        body = b"".join(segs)
        hdr = struct.pack("<4sBBqIIIB", b"OggS", 0, htype, 0, serial, seq,
                          0, len(lacing))
        pg = hdr + lacing + body
        return pg[:22] + struct.pack("<I", ogg_page_crc(pg)) + pg[26:]

    data = page(7, 0, [b"AAA"]) + page(7, 1, [b"XX", b"BBB"], htype=1)
    assert list(OggPacketReader(io.BytesIO(data))) == [b"AAA", b"BBB"]
    # Consecutive orphan pages: each drops its own leading tail.
    data = (page(7, 0, [b"AAA"]) + page(7, 1, [b"Y" * 255], htype=1)
            + page(7, 2, [b"ZZ", b"CCC"], htype=1))
    assert list(OggPacketReader(io.BytesIO(data))) == [b"AAA", b"CCC"]


def test_ogg_crc_detects_corruption():
    ogg = bytearray(mux_ogg_flac(make_flac(n=2000)))
    ogg[len(ogg) // 2] ^= 0xFF
    with pytest.raises(FormatError):
        for _ in OggPacketReader(io.BytesIO(bytes(ogg))):
            pass


@pytest.mark.parametrize("frames_per_chunk", [1, 3, 4])
def test_mp4_roundtrip(frames_per_chunk):
    flac = make_flac()
    mp4 = mux_mp4_flac(flac, frames_per_chunk=frames_per_chunk)
    want = reference_pcm(flac)

    track = read_flac_from_mp4(mp4)
    assert track.streaminfo.sample_rate == 44100
    assert sum(track.samples_per_chunk) == 9

    parts = []
    buf = None
    for offset, n in zip(track.chunk_offsets, track.samples_per_chunk):
        fr = FrameReader(MemReader(mp4, pos=offset))
        for _ in range(n):
            block = fr.read_next_or_eof(buf)
            parts.append(np.stack([np.array(block.channel(c))
                                   for c in range(block.channels())], axis=1))
            buf = block.into_buffer()
    assert np.array_equal(np.concatenate(parts, axis=0), want)


def test_mp4_no_flac_track():
    with pytest.raises(FormatError):
        read_flac_from_mp4(b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00")


@pytest.mark.parametrize("use_native", [True, False])
def test_pipeline_decode_ogg(use_native):
    from claxon_tpu.containers import decode_ogg_stream

    flac = make_flac()
    want = reference_pcm(flac)
    dec = decode_ogg_stream(mux_ogg_flac(flac), use_native=use_native)
    assert np.array_equal(dec.pcm, want)


@pytest.mark.parametrize("use_native", [True, False])
@pytest.mark.parametrize("frames_per_chunk", [1, 4])
def test_pipeline_decode_mp4(use_native, frames_per_chunk):
    from claxon_tpu.containers import decode_mp4_stream

    flac = make_flac()
    want = reference_pcm(flac)
    mp4 = mux_mp4_flac(flac, frames_per_chunk=frames_per_chunk)
    dec = decode_mp4_stream(mp4, use_native=use_native)
    assert np.array_equal(dec.pcm, want)


def test_pipeline_decode_mp4_with_interchunk_slack():
    """Frames must parse strictly per chunk: insert garbage between
    chunks and confirm the bounded parse never touches it."""
    from claxon_tpu.containers import decode_mp4_stream
    from claxon_tpu.testing.containers_gen import split_flac, _box
    import struct

    flac = make_flac()
    want = reference_pcm(flac)
    blocks, frames = split_flac(flac)
    # Build an mp4 manually with 0xEE slack after each chunk.
    chunks = [b"".join(frames[i:i + 3]) for i in range(0, len(frames), 3)]
    dfla = _box(b"dfLa", b"\x00\x00\x00\x00" + b"".join(blocks))
    entry = _box(b"fLaC", b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 8 +
                 struct.pack(">HHHHI", 2, 16, 0, 0, 44100 << 16) + dfla)
    stsd = _box(b"stsd", struct.pack(">II", 0, 1) + entry)
    entries = [(1, 3, 1)]
    if len(frames) % 3:
        entries.append((len(chunks), len(frames) % 3, 1))
    stsc = _box(b"stsc", struct.pack(">II", 0, len(entries)) +
                b"".join(struct.pack(">III", *e) for e in entries))
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")

    def moov(offs):
        stco = _box(b"stco", struct.pack(">II", 0, len(offs)) +
                    b"".join(struct.pack(">I", o) for o in offs))
        return _box(b"moov", _box(b"trak", _box(b"mdia", _box(
            b"minf", _box(b"stbl", stsd + stsc + stco)))))

    slack = b"\xEE" * 17
    msz = len(moov([0] * len(chunks)))
    payload = bytearray()
    offs = []
    base = len(ftyp) + msz + 8
    for c in chunks:
        offs.append(base + len(payload))
        payload += c + slack
    mp4 = ftyp + moov(offs) + _box(b"mdat", bytes(payload))

    dec = decode_mp4_stream(mp4)
    assert np.array_equal(dec.pcm, want)


def test_container_malformed_inputs_raise_error_only():
    """Crafted invalid container bytes must raise claxon_tpu.Error, never
    struct.error / StopIteration / RuntimeError (review regressions)."""
    import struct as _s
    from claxon_tpu.error import Error
    from claxon_tpu.containers import decode_mp4_stream
    from claxon_tpu.testing.containers_gen import _box

    cases = [
        b"",                                               # empty ogg
        b"OggS" + b"\x00" * 23,                            # truncated page
        _box(b"ftyp", b"isomAAAA") + b"\x00\x00\x00\x01moov\xff\xff",
        _box(b"ftyp", b"isomAAAA") +
        _box(b"moov", _box(b"trak", _box(b"mdia", _box(b"minf", _box(
            b"stbl",
            _box(b"stsd", _s.pack(">II", 0, 1) + _box(
                b"fLaC", b"\x00" * 28 + _box(b"dfLa", b"\x00" * 4))) +
            _box(b"stsc", _s.pack(">II", 0, 0xFFFFFFF0)) +
            _box(b"stco", _s.pack(">II", 0, 1) + _s.pack(">I", 0))))))),
    ]
    for i, data in enumerate(cases):
        for fn in (lambda d: read_flac_from_ogg(io.BytesIO(d)),
                   lambda d: decode_mp4_stream(d)):
            try:
                r = fn(data)
                if isinstance(r, tuple):
                    list(r[1]); list(r[2])
            except Error:
                pass
            except Exception as e:
                raise AssertionError(
                    f"case {i}: {type(e).__name__}: {e}") from e


def test_ogg_missing_header_packets_is_format_error():
    import struct
    from claxon_tpu.testing.containers_gen import _ogg_pages, split_flac

    flac = make_flac(n=2000)
    blocks, _frames = split_flac(flac)
    # An ID packet declaring 3 header packets, but the stream ends after it.
    id_packet = (bytes([0x7F]) + b"FLAC" + bytes([1, 0]) +
                 struct.pack(">H", 3) + b"fLaC" + blocks[0])
    ogg = b"".join(_ogg_pages([id_packet]))
    si, headers, audio = read_flac_from_ogg(io.BytesIO(ogg))
    with pytest.raises(FormatError, match="header packets"):
        list(headers)


def test_mp4_single_short_chunk_stsc_valid():
    """A 2-frame file with frames_per_chunk=3 must not emit duplicate
    stsc first_chunk entries."""
    pcm = synth_music(2000, channels=2, bps=16, seed=5)
    flac = encode_flac(pcm, 44100, 16, block_size=1024)
    mp4 = mux_mp4_flac(flac, frames_per_chunk=3)
    track = read_flac_from_mp4(mp4)
    assert sum(track.samples_per_chunk) == 2
    from claxon_tpu.containers import decode_mp4_stream
    dec = decode_mp4_stream(mp4)
    assert np.array_equal(dec.pcm, reference_pcm(flac))


def test_containers_take_bits_path(monkeypatch):
    """With the native core present, Ogg and MP4 decode must route through
    the bits pipeline (on-device entropy decode), not the FrameDesc
    packer -- and stay bit-exact (VERDICT round-1 item 6)."""
    from claxon_tpu import native
    from claxon_tpu.containers import decode_mp4_stream, decode_ogg_stream
    import claxon_tpu.containers.pipeline as cp

    if not native.available():
        pytest.skip("native core unavailable")
    flac = make_flac()
    want = reference_pcm(flac)
    calls = []
    orig = cp._decode_frames_bits
    monkeypatch.setattr(cp, "_decode_frames_bits",
                        lambda *a: calls.append(1) or orig(*a))
    dec = decode_ogg_stream(mux_ogg_flac(flac))
    assert np.array_equal(dec.pcm, want)
    dec = decode_mp4_stream(mux_mp4_flac(flac, frames_per_chunk=2))
    assert np.array_equal(dec.pcm, want)
    assert len(calls) == 2


def test_merge_bits_batches_rebases_chunk_positions():
    """Splitting a frame section at a frame boundary and merging the two
    bounded bits walks must reproduce the single-walk decode exactly."""
    from claxon_tpu import native
    from claxon_tpu.pipeline_bits import decode_raw_bits_device

    if not native.available():
        pytest.skip("native core unavailable")
    flac = make_flac()
    want = reference_pcm(flac)
    si, pos = native.binding._read_metadata(flac)
    section = memoryview(flac)[pos:]
    used = []
    first = native.extract_frames_bits(section, emit_slots=False,
                                       max_frames=3, consumed=used)
    assert len(first.bframes) == 3
    first.payload = section[:used[0]]
    rest = native.extract_frames_bits(section[used[0]:], emit_slots=False)
    merged = native.merge_bits_batches([first, rest])
    dec = decode_raw_bits_device([(si, merged)]).to_host()[0]
    assert np.array_equal(dec.pcm, want)


def test_mp4_deferred_crc_precedes_later_chunk_error():
    """Cross-chunk reference order parity: a CRC-corrupt frame in chunk 1
    must surface "frame CRC mismatch" even when chunk 2 is truncated (the
    sequential reference hits the CRC failure first)."""
    from claxon_tpu import native
    from claxon_tpu.containers import decode_mp4_stream
    from claxon_tpu.error import Error

    if not native.available():
        pytest.skip("native core unavailable")
    flac = make_flac()
    mp4 = bytearray(mux_mp4_flac(flac, frames_per_chunk=2))
    track = read_flac_from_mp4(bytes(mp4))
    # Corrupt the stored CRC-16 of chunk 0's first frame (frame parses).
    off0 = track.chunk_offsets[0]
    used = []
    bb = native.extract_frames_bits(memoryview(bytes(mp4))[off0:],
                                    emit_slots=False, max_frames=1,
                                    consumed=used)
    mp4[off0 + used[0] - 1] ^= 0xFF
    # Truncate the file inside the LAST chunk.
    last = max(track.chunk_offsets)
    bad = bytes(mp4[:last + 4])
    with pytest.raises(Error) as ei:
        decode_mp4_stream(bad)
    assert "frame CRC mismatch" in str(ei.value)


@pytest.mark.parametrize("fmt", ["ogg", "mp4"])
def test_payload_cap_falls_back_with_warning(monkeypatch, fmt):
    """Payloads at/over the bits-pipeline cap must switch to the FrameDesc
    path WITH a RuntimeWarning describing the switch, and stay bit-exact.
    The cap is shrunk via CLAXON_TPU_BITS_PAYLOAD_CAP so the boundary is
    exercised without a 128 MiB allocation (VERDICT round-2 item 6)."""
    from claxon_tpu import native
    from claxon_tpu.containers import decode_mp4_stream, decode_ogg_stream
    import claxon_tpu.containers.pipeline as cp

    if not native.available():
        pytest.skip("native core unavailable")
    flac = make_flac()
    want = reference_pcm(flac)
    monkeypatch.setenv("CLAXON_TPU_BITS_PAYLOAD_CAP", "1024")
    bits_calls = []
    monkeypatch.setattr(cp, "_decode_frames_bits",
                        lambda *a: bits_calls.append(1))
    with pytest.warns(RuntimeWarning, match="bits-pipeline cap"):
        if fmt == "ogg":
            dec = decode_ogg_stream(mux_ogg_flac(flac))
        else:
            dec = decode_mp4_stream(mux_mp4_flac(flac, frames_per_chunk=2))
    assert not bits_calls
    assert np.array_equal(dec.pcm, want)


def test_payload_cap_boundary_keeps_bits_path(monkeypatch):
    """One byte under the (overridden) cap still rides the bits path."""
    from claxon_tpu import native
    from claxon_tpu.containers import decode_ogg_stream
    import claxon_tpu.containers.pipeline as cp

    if not native.available():
        pytest.skip("native core unavailable")
    flac = make_flac()
    want = reference_pcm(flac)
    ogg = mux_ogg_flac(flac)
    monkeypatch.setenv("CLAXON_TPU_BITS_PAYLOAD_CAP", str(len(ogg) + 1))
    calls = []
    orig = cp._decode_frames_bits
    monkeypatch.setattr(cp, "_decode_frames_bits",
                        lambda *a: calls.append(1) or orig(*a))
    dec = decode_ogg_stream(ogg)
    assert calls
    assert np.array_equal(dec.pcm, want)
