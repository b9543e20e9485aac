"""Corpus-scale differential tests using the spec-derived encoder
(reference test tier 3 analog: `tests/testsamples.rs:471-496` walks a real
music library; here the corpus is generated with known PCM and genuine
STREAMINFO MD5s, so every file is self-verifying)."""

import numpy as np
import pytest

from claxon_tpu import FlacReader
from claxon_tpu.testing import encode_flac, synth_music
from util import decode_all_blocks, interleave, verify_md5


def roundtrip(pcm, sample_rate=44100, bps=16, **kw):
    data = encode_flac(pcm, sample_rate, bps, **kw)
    r = FlacReader(data)
    blocks = decode_all_blocks(r)
    inter = interleave(blocks)
    pcm2 = np.asarray(pcm)
    if pcm2.ndim == 1:
        pcm2 = pcm2[:, None]
    assert np.array_equal(inter, pcm2.astype(np.int32))
    assert verify_md5(blocks, r.streaminfo())
    return data


PCM = synth_music(6000, channels=2, bps=16, seed=1)

MATRIX = [
    dict(),
    dict(stereo="left_side"),
    dict(stereo="right_side"),
    dict(stereo="mid_side"),
    dict(stereo="independent"),
    dict(force_subframe="verbatim"),
    dict(force_subframe="fixed"),
    dict(max_lpc_order=12, partition_order=4),
    dict(max_lpc_order=32, lpc_precision=15, partition_order=0),
    dict(max_lpc_order=1),
    dict(rice2=True, partition_order=3),
    dict(block_size=192),
    dict(block_size=1000),   # odd block size: 8-bit tail encoding
    dict(block_size=4608),
    dict(variable_blocking=True),
    dict(allow_wasted=False),
]


@pytest.mark.parametrize("kw", MATRIX, ids=[str(sorted(k.items())) for k in MATRIX])
def test_roundtrip_matrix(kw):
    roundtrip(PCM, **kw)


@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24])
def test_roundtrip_bit_depths(bps):
    pcm = synth_music(4000, channels=2, bps=bps, seed=bps)
    roundtrip(pcm, bps=bps)


@pytest.mark.parametrize("channels", [1, 2, 3, 4, 8])
def test_roundtrip_channel_counts(channels):
    pcm = synth_music(3000, channels=channels, bps=16, seed=channels)
    roundtrip(pcm, block_size=1024)


def test_roundtrip_constant():
    pcm = np.full((5000, 2), -123, dtype=np.int64)
    roundtrip(pcm, force_subframe="constant")


def test_roundtrip_wasted_bits():
    pcm = synth_music(5000, channels=2, bps=16, seed=9) & ~np.int64(0x1F)
    roundtrip(pcm)


def test_roundtrip_nonstandard_sample_rates():
    pcm = synth_music(2000, channels=1, bps=16, seed=2)
    for sr in [44100, 11025, 655350, 12345]:
        data = encode_flac(pcm, sr, 16)
        r = FlacReader(data)
        assert r.streaminfo().sample_rate == sr
        blocks = decode_all_blocks(r)
        assert verify_md5(blocks, r.streaminfo())


def test_roundtrip_tiny_and_unaligned_tail():
    # Final short frame plus a block size that doesn't divide n.
    pcm = synth_music(4097, channels=2, bps=16, seed=4)
    roundtrip(pcm, block_size=4096)
    pcm = synth_music(33, channels=1, bps=16, seed=5)
    roundtrip(pcm, block_size=32)


def test_metadata_blocks_roundtrip():
    pcm = synth_music(1000, channels=2, bps=16, seed=6)
    data = encode_flac(
        pcm, 44100, 16,
        tags=[("ARTIST", "Claxon TPU"), ("TITLE", "Synth"), ("artist", "dup")],
        padding=256, application=(0x74657374, b"payload"), seektable_points=3)
    r = FlacReader(data)
    assert r.vendor() == "claxon_tpu flacgen 0.1"
    assert list(r.get_tag("ARTIST")) == ["Claxon TPU", "dup"]
    blocks = decode_all_blocks(r)
    assert verify_md5(blocks, r.streaminfo())


def test_large_multiframe_stream():
    pcm = synth_music(50_000, channels=2, bps=16, seed=7)
    data = roundtrip(pcm, block_size=4096, max_lpc_order=8, partition_order=3)
    # Sanity: the encoder actually compresses (so the decode paths being
    # exercised are the entropy-coded ones, not verbatim).
    assert len(data) < 50_000 * 2 * 2 * 0.9
