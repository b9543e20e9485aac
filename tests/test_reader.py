"""Public-API integration tests (reference test tiers 2 and 4,
`tests/testsamples.rs`).

The bit-exactness oracle is the MD5 signature of the unencoded PCM stored in
STREAMINFO -- written by the encoder that produced the file (libflac for the
committed corpus), so a match proves bit-exact decoding against the format's
own ground truth.
"""

import io

import numpy as np
import pytest

from claxon_tpu import FlacReader, FlacReaderOptions
from claxon_tpu.error import Error, FormatError
from util import decode_all_blocks, interleave, pcm_md5

MD5_FILES = ["pop.flac", "short.flac", "wasted_bits.flac"]


@pytest.mark.parametrize("name", MD5_FILES)
def test_decode_md5_bit_exact(testsamples, name):
    r = FlacReader.open(testsamples / name)
    si = r.streaminfo()
    blocks = decode_all_blocks(r)
    total = sum(arr.shape[1] for _, arr in blocks)
    assert total == si.samples
    assert pcm_md5(interleave(blocks), si.bits_per_sample) == si.md5sum


def test_decode_non_subset(testsamples):
    # 24-bit stereo with LPC order > 12; the file's md5 field is unset, but
    # every frame passes its CRC-16, which verifies the parse consumed the
    # exact bit layout.
    r = FlacReader.open(testsamples / "non_subset.flac")
    blocks = decode_all_blocks(r)
    assert sum(arr.shape[1] for _, arr in blocks) == 4096
    # 24-bit samples stay within range.
    inter = interleave(blocks)
    assert inter.max() < (1 << 23) and inter.min() >= -(1 << 23)


def test_samples_iterator_matches_blocks(testsamples):
    blocks = decode_all_blocks(FlacReader.open(testsamples / "pop.flac"))
    inter = interleave(blocks).flatten()
    samples = list(FlacReader.open(testsamples / "pop.flac").samples())
    assert samples == inter.tolist()


def test_samples_iterator_stereo_interleaved(testsamples):
    blocks = decode_all_blocks(FlacReader.open(testsamples / "non_subset.flac"))
    inter = interleave(blocks).flatten()
    samples = list(FlacReader.open(testsamples / "non_subset.flac").samples())
    assert samples == inter.tolist()


def test_metadata_only_panics_on_audio(testsamples):
    opts = FlacReaderOptions(metadata_only=True)
    r = FlacReader.open_ext(testsamples / "pop.flac", opts)
    assert r.streaminfo().sample_rate == 44100
    with pytest.raises(AssertionError):
        r.blocks()
    with pytest.raises(AssertionError):
        r.samples()
    with pytest.raises(AssertionError):
        r.into_samples()


def test_metadata_only_without_tags(testsamples):
    opts = FlacReaderOptions(metadata_only=True, read_vorbis_comment=False)
    r = FlacReader.open_ext(testsamples / "pop.flac", opts)
    assert r.vendor() is None
    assert list(r.tags()) == []
    assert list(r.get_tag("ARTIST")) == []


def test_read_from_bytes_and_stream(testsamples):
    data = (testsamples / "pop.flac").read_bytes()
    r1 = FlacReader(data)
    r2 = FlacReader(io.BytesIO(data))
    assert r1.streaminfo() == r2.streaminfo()


def test_invalid_header():
    with pytest.raises(FormatError) as e:
        FlacReader(b"OggS\x00\x00\x00\x00")
    assert "invalid stream header" in str(e.value)


def test_id3_header_helpful_error():
    with pytest.raises(FormatError) as e:
        FlacReader(b"ID3\x04\x00\x00\x00\x00")
    assert "ID3" in str(e.value)


def test_get_tag_case_insensitive():
    # Build a tiny in-memory stream: fLaC + streaminfo + vorbis block.
    import struct

    def streaminfo_block(is_last=False):
        val = (44100 << 44) | (0 << 41) | (15 << 36) | 0
        body = struct.pack(">HH", 4096, 4096) + b"\x00" * 6
        body += val.to_bytes(8, "big") + b"\x00" * 16
        hdr = bytes([0x80 if is_last else 0x00]) + len(body).to_bytes(3, "big")
        return hdr + body

    def vorbis_block(comments, is_last=True):
        body = struct.pack("<I", 6) + b"vendor"
        body += struct.pack("<I", len(comments))
        for c in comments:
            body += struct.pack("<I", len(c)) + c
        hdr = bytes([(0x80 if is_last else 0x00) | 4]) + len(body).to_bytes(3, "big")
        return hdr + body

    data = b"fLaC" + streaminfo_block() + vorbis_block(
        [b"ARTIST=Queen", b"artist=Bowie", b"TITLE=x"])
    r = FlacReader(data, FlacReaderOptions(metadata_only=True))
    assert list(r.get_tag("Artist")) == ["Queen", "Bowie"]
    assert list(r.get_tag("artist")) == ["Queen", "Bowie"]
    assert list(r.get_tag("ALBUM")) == []
    assert r.vendor() == "vendor"
    assert list(r.tags()) == [("ARTIST", "Queen"), ("artist", "Bowie"),
                              ("TITLE", "x")]

    # A second streaminfo or second vorbis comment block is a format error.
    bad = b"fLaC" + streaminfo_block() + vorbis_block([], is_last=False) \
        + vorbis_block([])
    with pytest.raises(FormatError) as e:
        FlacReader(bad)
    assert "second Vorbis comment" in str(e.value)

    bad2 = b"fLaC" + streaminfo_block() + streaminfo_block(is_last=True)
    with pytest.raises(FormatError) as e:
        FlacReader(bad2)
    assert "second streaminfo" in str(e.value)


def test_buffer_poisoning_determinism(testsamples):
    """Port of the reference's `diff` fuzzer idea as a deterministic test
    (`fuzz/fuzzers/diff.rs`): decoding into recycled buffers pre-poisoned
    with different bytes must give identical output -- no stale element of
    the buffer may leak into the result."""
    data = (testsamples / "wasted_bits.flac").read_bytes()

    def decode_with_poison(fill):
        r = FlacReader(data)
        fr = r.blocks()
        si = r.streaminfo()
        cap = si.max_block_size * si.channels
        buf = np.full(cap, fill, dtype=np.int32)
        out = []
        while True:
            blk = fr.read_next_or_eof(buf)
            if blk is None:
                break
            out.append(np.array([blk.channel(c) for c in range(blk.channels())]))
            buf = blk.into_buffer()
            buf[:] = fill  # re-poison between frames
        return out

    a = decode_with_poison(13)
    b = decode_with_poison(17)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_fuzz_corpus_present(testsamples):
    """The committed fuzzer crash corpus must exist; its per-file replay
    lives in tests/test_fuzz_regression.py (parametrized, so a failure
    names the exact file)."""
    assert len(sorted((testsamples / "fuzz").glob("*.flac"))) >= 20


def test_into_inner(testsamples):
    data = (testsamples / "pop.flac").read_bytes()
    stream = io.BytesIO(data)
    r = FlacReader(stream)
    assert r.into_inner() is stream
