"""End-to-end device-pipeline parity tests: the batched TPU decode path must
be bit-exact against the scalar host path and the STREAMINFO MD5 oracle on
the committed corpus and on generated streams covering every subframe type."""

import numpy as np
import pytest

from claxon_tpu import FlacReader
from claxon_tpu.pipeline import decode_stream
from claxon_tpu.testing import encode_flac, synth_music
from util import decode_all_blocks, interleave, pcm_md5


def assert_pipeline_matches(data):
    dec = decode_stream(data, use_native=False)
    scalar = interleave(decode_all_blocks(FlacReader(bytes(data))))
    assert dec.pcm.shape == scalar.shape
    assert np.array_equal(dec.pcm, scalar)
    si = dec.streaminfo
    if si.md5sum != b"\x00" * 16:
        assert pcm_md5(dec.pcm, si.bits_per_sample) == si.md5sum
    return dec


@pytest.mark.parametrize("name", ["pop.flac", "short.flac",
                                  "wasted_bits.flac", "non_subset.flac"])
def test_pipeline_committed_corpus(testsamples, name):
    assert_pipeline_matches((testsamples / name).read_bytes())


@pytest.mark.parametrize("kw", [
    dict(),
    dict(stereo="left_side"),
    dict(stereo="right_side"),
    dict(stereo="independent"),
    dict(force_subframe="verbatim"),
    dict(force_subframe="fixed"),
    dict(max_lpc_order=12, partition_order=4),
    dict(max_lpc_order=32, lpc_precision=15),
    dict(rice2=True),
    dict(block_size=1000),
    dict(variable_blocking=True),
], ids=lambda kw: str(sorted(kw.items())))
def test_pipeline_generated(kw):
    pcm = synth_music(6000, channels=2, bps=16, seed=11)
    assert_pipeline_matches(encode_flac(pcm, 44100, 16, **kw))


@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24])
def test_pipeline_bit_depths(bps):
    pcm = synth_music(3000, channels=2, bps=bps, seed=bps)
    assert_pipeline_matches(encode_flac(pcm, 44100, bps))


def test_pipeline_multichannel():
    pcm = synth_music(2000, channels=5, bps=16, seed=3)
    assert_pipeline_matches(encode_flac(pcm, 48000, 16, block_size=512))


def test_pipeline_wasted_bits():
    pcm = synth_music(4000, channels=2, bps=16, seed=8) & ~np.int64(0x7)
    assert_pipeline_matches(encode_flac(pcm, 44100, 16))


def test_pipeline_mixed_block_sizes():
    # Final short frame lands in a different bucket than the main frames.
    pcm = synth_music(10000, channels=2, bps=16, seed=12)
    dec = assert_pipeline_matches(encode_flac(pcm, 44100, 16, block_size=4096))
    assert dec.frame_sizes == [4096, 4096, 1808]
    # Reference quirk: with fixed blocking, time = current block size *
    # frame number (`src/frame.rs:771-773`), so the short last frame gets
    # 1808 * 2, not 8192. We mirror the reference exactly.
    assert dec.frame_times == [0, 4096, 3616]


def test_raw_path_matches_object_path():
    """The native raw-array fast path must be bit-identical to the
    FrameDesc object path on every stream class."""
    from claxon_tpu import native
    if not native.available():
        pytest.skip("C++ core not built")
    from claxon_tpu.extract import extract_stream
    from claxon_tpu.pipeline import (decode_batches_device,
                                     decode_raw_batches_device)

    cases = [
        encode_flac(synth_music(9000, channels=2, bps=16, seed=61),
                    44100, 16, block_size=1024),
        encode_flac(synth_music(5000, channels=2, bps=24, seed=62),
                    96000, 24, block_size=2048),
        encode_flac(synth_music(3000, channels=5, bps=16, seed=63),
                    48000, 16, block_size=512),
        encode_flac(synth_music(7000, channels=2, bps=16, seed=64),
                    44100, 16, block_size=4096),  # short tail frame
    ]
    raws = [native.extract_stream_raw(d) for d in cases]
    via_raw = decode_raw_batches_device(raws).to_host()
    via_obj = decode_batches_device(
        [extract_stream(d) for d in cases]).to_host()
    assert len(via_raw) == len(via_obj) == len(cases)
    for a, b in zip(via_raw, via_obj):
        assert np.array_equal(a.pcm, b.pcm)
        assert a.frame_times == b.frame_times
        assert a.frame_sizes == b.frame_sizes


def test_pipeline_max_block_size_odd_bucket():
    """Block size 65535 lands in the odd-width time bucket where the int16
    pair packing is disabled on both link directions -- the unpacked path
    must stay bit-exact."""
    pcm = synth_music(70000, channels=2, bps=16, seed=71)
    data = encode_flac(pcm, 44100, 16, block_size=65535)
    dec = assert_pipeline_matches(data)
    assert dec.frame_sizes == [65535, 4465]


def test_pipeline_long_stream_multibucket():
    """A long stream spanning several buckets plus stragglers."""
    pcm = synth_music(300000, channels=2, bps=16, seed=72)
    data = encode_flac(pcm, 44100, 16, block_size=2048)
    dec = assert_pipeline_matches(data)
    assert len(dec.frame_sizes) == (300000 + 2047) // 2048


def test_decode_streams_pipelined_matches_scalar():
    """The overlapped-batch corpus API returns every stream bit-exact and
    in input order."""
    from claxon_tpu import native
    from claxon_tpu.pipeline import decode_streams_pipelined
    from claxon_tpu.testing import encode_flac, synth_music

    if not native.available():
        pytest.skip("native core unavailable")
    datas = [encode_flac(synth_music(1024 * (1 + s % 3), channels=2,
                                     bps=16, seed=60 + s), 44100, 16,
                         block_size=1024) for s in range(9)]
    res = decode_streams_pipelined(datas, batch_streams=3, depth=2)
    assert len(res) == len(datas)
    for d, dec in zip(datas, res):
        _si, pcm = native.decode_stream_scalar(d)
        assert np.array_equal(dec.pcm, pcm)


def test_default_segmentation_is_auto(monkeypatch):
    """A bare decode_streams_device(datas) must engage the auto
    calibration (VERDICT r4 item 5: the measured rule -- calibrate,
    then ride the winner -- is the library default; the env knob and
    the explicit argument pin a path)."""
    import claxon_tpu.pipeline as pl
    from claxon_tpu import native

    if not native.available():
        pytest.skip("native core unavailable")
    monkeypatch.delenv("CLAXON_TPU_SEGMENTATION", raising=False)
    monkeypatch.setitem(pl._SEG_AUTO, "choice", None)
    sentinel = object()
    calls = []

    def fake_calibrate(datas, use_native, lane_quantum):
        calls.append(len(datas))
        return "host", sentinel

    monkeypatch.setattr(pl, "_calibrate_segmentation", fake_calibrate)
    data = encode_flac(synth_music(2048, channels=2, bps=16, seed=3),
                       44100, 16, block_size=1024)
    assert pl.decode_streams_device([data]) is sentinel
    assert calls == [1]
    # The async entry point routes through the same default.
    monkeypatch.setitem(pl._SEG_AUTO, "choice", None)
    h = pl.decode_streams_device_async([data])
    assert h.finish() is sentinel
    assert calls == [1, 1]
