"""End-to-end tests of the examples (reference parity:
`examples/{decode,decode_simple,tags,decode_ogg,decode_mp4}.rs`) and the
WAV writer they share."""

import pathlib
import struct
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "examples"))

from claxon_tpu import FlacReader
from claxon_tpu.testing import (encode_flac, synth_music, mux_ogg_flac,
                                mux_mp4_flac)
from claxon_tpu.utils import write_wav
from util import decode_all_blocks, interleave


def read_wav(path):
    """Minimal WAV reader for verification; returns (pcm, rate, bps)."""
    data = pathlib.Path(path).read_bytes()
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    pos = 12
    fmt = None
    while pos + 8 <= len(data):
        ctype, size = data[pos:pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8:pos + 8 + size]
        if ctype == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif ctype == b"data":
            _, channels, rate, _, _, bits = fmt
            nbytes = bits // 8
            raw = np.frombuffer(body, np.uint8).reshape(-1, nbytes)
            if nbytes == 1:
                pcm = raw[:, 0].astype(np.int32) - 128
            else:
                full = np.zeros((len(raw), 4), np.uint8)
                full[:, :nbytes] = raw
                pcm = full.view("<i4")[:, 0] << (32 - 8 * nbytes) >> (32 - 8 * nbytes)
            return pcm.reshape(-1, channels), rate, bits
        pos += 8 + size
    raise AssertionError("no data chunk")


@pytest.fixture
def corpus(tmp_path):
    pcm = synth_music(5000, channels=2, bps=16, seed=90)
    flac = encode_flac(pcm, 44100, 16, block_size=1024,
                       tags=(("TITLE", "example"), ("ARTIST", "claxon_tpu")))
    f = tmp_path / "song.flac"
    f.write_bytes(flac)
    want = interleave(decode_all_blocks(FlacReader(flac)))
    return f, flac, want


@pytest.mark.parametrize("bps", [8, 16, 24, 32])
def test_wav_roundtrip(tmp_path, bps):
    rng = np.random.default_rng(bps)
    lim = 1 << (bps - 1)
    pcm = rng.integers(-lim, lim, (500, 2)).astype(np.int32)
    p = tmp_path / "x.wav"
    write_wav(p, pcm, 48000, bps)
    got, rate, bits = read_wav(p)
    assert rate == 48000 and bits == ((bps + 7) // 8) * 8
    assert np.array_equal(got, pcm)


def test_example_decode_scalar(corpus):
    import decode as ex
    f, flac, want = corpus
    out = ex.decode_file_scalar(str(f))
    got, rate, bits = read_wav(out)
    assert (rate, bits) == (44100, 16)
    assert np.array_equal(got, want)


def test_example_decode_pipeline(corpus):
    import decode as ex
    f, flac, want = corpus
    out = ex.decode_file_pipeline(str(f))
    got, _, _ = read_wav(out)
    assert np.array_equal(got, want)


def test_example_decode_simple(corpus, capsys):
    import decode_simple as ex
    f, flac, want = corpus
    assert ex.main([str(f)]) == 0
    got, _, _ = read_wav(f.with_suffix(".wav"))
    assert np.array_equal(got, want)
    assert ex.main([str(f.parent / "missing.flac")]) == 2  # IoError branch


def test_example_tags(corpus, capsys):
    import tags as ex
    f, flac, want = corpus
    assert ex.main([str(f)]) == 0
    out = capsys.readouterr().out
    assert "TITLE = example" in out and "ARTIST = claxon_tpu" in out


def test_example_decode_ogg(tmp_path, corpus):
    import decode_ogg as ex
    f, flac, want = corpus
    ogg = tmp_path / "song.oga"
    ogg.write_bytes(mux_ogg_flac(flac))
    ex.decode_file(str(ogg))
    got, _, _ = read_wav(ogg.with_suffix(".wav"))
    assert np.array_equal(got, want)


def test_example_decode_mp4(tmp_path, corpus):
    import decode_mp4 as ex
    f, flac, want = corpus
    mp4 = tmp_path / "song.mp4"
    mp4.write_bytes(mux_mp4_flac(flac))
    ex.decode_file(str(mp4))
    got, _, _ = read_wav(mp4.with_suffix(".wav"))
    assert np.array_equal(got, want)


def test_example_bench_decode_runs(corpus, capsys):
    import bench_decode as ex
    f, flac, want = corpus
    assert ex.main([str(f)]) == 0
    assert "ns/sample" in capsys.readouterr().out


def test_example_bench_metadata_runs(corpus, capsys):
    import bench_metadata as ex
    f, flac, want = corpus
    assert ex.main([str(f.parent)]) == 0
    assert "us/file" in capsys.readouterr().out


def test_example_device_consumer(corpus, capsys):
    import device_consumer as ex
    f, flac, want = corpus
    assert ex.main([str(f)]) == 0
    out = capsys.readouterr().out
    assert "decoded into HBM" in out and "mean RMS" in out
