"""Metadata-layer tests: streaminfo parse, Vorbis comments incl. edge/DoS
files (reference test tier 2, `tests/testsamples.rs:289-426`)."""

import io
import struct

import pytest

from claxon_tpu import FlacReader, FlacReaderOptions
from claxon_tpu.error import Error, FormatError, Unsupported
from claxon_tpu.io.readers import MemReader
from claxon_tpu.metadata import read_metadata_block, read_vorbis_comment_block


def test_streaminfo_pop(testsamples):
    si = FlacReader.open(testsamples / "pop.flac").streaminfo()
    assert si.sample_rate == 44100
    assert si.channels == 1
    assert si.bits_per_sample == 16
    assert si.samples == 100
    assert si.min_block_size >= 16
    assert len(si.md5sum) == 16


def test_streaminfo_non_subset(testsamples):
    si = FlacReader.open(testsamples / "non_subset.flac").streaminfo()
    assert si.channels == 2
    assert si.bits_per_sample == 24


def test_large_vorbis_comment_block_rejected(testsamples):
    # A file claiming a huge Vorbis comment block must be rejected without
    # allocating (DoS hardening); reference `tests/testsamples.rs:404-426`.
    with pytest.raises(Error):
        FlacReader.open(testsamples / "large_vorbis_comment_block.flac")


def test_large_vendor_string_rejected(testsamples):
    with pytest.raises(Error):
        FlacReader.open(testsamples / "large_vendor_string.flac")


def test_empty_vorbis_comment(testsamples):
    # Old libflac versions wrote zero-length comments; these are skipped.
    r = FlacReader.open(testsamples / "empty_vorbis_comment.flac")
    assert all(name != "" or value != "" for name, value in r.tags())


def test_repeated_vorbis_comment(testsamples):
    # Names need not be unique; repeated tags are all preserved.
    r = FlacReader.open(testsamples / "repeated_vorbis_comment.flac")
    tags = list(r.tags())
    names = [n.upper() for n, _ in tags]
    # Repeated names must NOT be deduplicated: some name appears twice.
    assert len(set(names)) < len(names)
    dup = max(set(names), key=names.count)
    assert len(list(r.get_tag(dup))) == names.count(dup) >= 2


def _vorbis_block(vendor=b"v", comments=()):
    body = struct.pack("<I", len(vendor)) + vendor
    body += struct.pack("<I", len(comments))
    for c in comments:
        body += struct.pack("<I", len(c)) + c
    return body


def test_vorbis_comment_parse():
    body = _vorbis_block(b"test vendor", [b"ARTIST=Queen", b"Artist=Bowie"])
    vc = read_vorbis_comment_block(MemReader(body), len(body))
    assert vc.vendor == "test vendor"
    assert vc.comments == [("ARTIST=Queen", 6), ("Artist=Bowie", 6)]


def test_vorbis_comment_missing_separator():
    body = _vorbis_block(b"v", [b"NOSEPARATOR"])
    with pytest.raises(FormatError):
        read_vorbis_comment_block(MemReader(body), len(body))


def test_vorbis_comment_invalid_name_byte():
    body = _vorbis_block(b"v", [b"BAD\x19NAME=x"])
    with pytest.raises(FormatError):
        read_vorbis_comment_block(MemReader(body), len(body))


def test_vorbis_comment_excess_data():
    body = _vorbis_block(b"v", [b"A=b"]) + b"xx"
    with pytest.raises(FormatError):
        read_vorbis_comment_block(MemReader(body), len(body))


def test_vorbis_comment_wrong_count():
    # Claim 2 comments but provide 1.
    body = _vorbis_block(b"v", [b"A=b"])
    body = body[:5 + 1] + struct.pack("<I", 2) + body[5 + 1 + 4:]
    with pytest.raises(FormatError):
        read_vorbis_comment_block(MemReader(body), len(body))


def test_vorbis_comment_empty_comment_skipped():
    vendor = b"v"
    body = struct.pack("<I", 1) + vendor
    body += struct.pack("<I", 2)
    body += struct.pack("<I", 0)          # empty comment: skipped
    body += struct.pack("<I", 3) + b"A=b"
    vc = read_vorbis_comment_block(MemReader(body), len(body))
    assert vc.comments == [("A=b", 1)]


def test_vorbis_comment_vendor_not_utf8():
    body = _vorbis_block(b"\xff\xfe", [])
    with pytest.raises(FormatError):
        read_vorbis_comment_block(MemReader(body), len(body))


def test_streaminfo_validation_errors():
    def streaminfo_bytes(min_bs=4096, max_bs=4096, sample_rate=44100):
        # Layout after the four block-size/frame-size fields: sample rate
        # (20 bits), channels-1 (3), bps-1 (5), total samples (36).
        val = (sample_rate << 44) | (0 << 41) | ((16 - 1) << 36) | 0
        b = struct.pack(">HH", min_bs, max_bs) + b"\x00" * 6
        b += val.to_bytes(8, "big")
        b += b"\x00" * 16
        return b

    # min > max block size
    with pytest.raises(FormatError):
        read_metadata_block(MemReader(streaminfo_bytes(min_bs=8192, max_bs=4096)), 0, 34)
    # block size < 16
    with pytest.raises(FormatError):
        read_metadata_block(MemReader(streaminfo_bytes(min_bs=8, max_bs=8)), 0, 34)
    # sample rate 0
    with pytest.raises(FormatError):
        read_metadata_block(MemReader(streaminfo_bytes(sample_rate=0)), 0, 34)
    # valid one parses
    blk = read_metadata_block(MemReader(streaminfo_bytes()), 0, 34)
    assert blk.streaminfo.sample_rate == 44100
    assert blk.streaminfo.bits_per_sample == 16
    assert blk.streaminfo.channels == 1


def test_streaminfo_wrong_length():
    with pytest.raises(FormatError):
        read_metadata_block(MemReader(b"\x00" * 33), 0, 33)


def test_block_type_127_invalid():
    with pytest.raises(FormatError):
        read_metadata_block(MemReader(b""), 127, 0)


def test_reserved_block_skipped():
    blk = read_metadata_block(MemReader(b"\x00" * 10), 99, 10)
    assert blk.kind == "reserved"


def test_application_block():
    data = struct.pack(">I", 0x74657374) + b"payload"
    blk = read_metadata_block(MemReader(data), 2, len(data))
    assert blk.kind == "application"
    assert blk.application_id == 0x74657374
    assert blk.application_data == b"payload"


def test_application_block_too_short():
    with pytest.raises(FormatError):
        read_metadata_block(MemReader(b"ab"), 2, 2)


def test_application_block_dos_cap():
    with pytest.raises(Unsupported):
        read_metadata_block(MemReader(b""), 2, 11 * 1024 * 1024)
