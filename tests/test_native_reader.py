"""The FrameReader native fast path: bit-exact and error-identical with the
pure-Python streaming path, on both in-memory and file-backed readers."""

import io

import numpy as np
import pytest

from claxon_tpu import FlacReader, native
from claxon_tpu.error import Error, FormatError, IoError
from claxon_tpu.frame import FrameReader
from claxon_tpu.io.readers import BufferedReader, MemReader
from claxon_tpu.testing import encode_flac, synth_music
from util import decode_all_blocks, interleave

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="C++ core not built")


def frames_section(data):
    """Byte offset of the first frame."""
    from claxon_tpu.metadata import MetadataBlockReader
    from claxon_tpu.reader import read_stream_header
    r = MemReader(data)
    read_stream_header(r)
    for _ in MetadataBlockReader(r):
        pass
    return r.pos


def all_blocks(reader, use_native):
    fr = FrameReader(reader, use_native=use_native)
    out, buf = [], None
    while (b := fr.read_next_or_eof(buf)) is not None:
        out.append((b.time(), np.array([b.channel(c)
                                        for c in range(b.channels())])))
        buf = b.into_buffer()
    return out


@pytest.mark.parametrize("buffer_size", [8192, 37])
def test_native_reader_matches_python(buffer_size):
    pcm = synth_music(9000, channels=2, bps=16, seed=80)
    data = encode_flac(pcm, 44100, 16, block_size=1024)
    off = frames_section(data)

    nat = all_blocks(MemReader(data, pos=off), True)
    py = all_blocks(MemReader(data, pos=off), False)
    assert len(nat) == len(py) == 9
    for (ta, a), (tb, b) in zip(nat, py):
        assert ta == tb and np.array_equal(a, b)

    # Small buffered chunks force the window-growing path repeatedly.
    buffered = BufferedReader(io.BytesIO(data[off:]),
                              buffer_size=buffer_size)
    nat2 = all_blocks(buffered, True)
    assert len(nat2) == len(py)
    for (ta, a), (tb, b) in zip(nat2, py):
        assert ta == tb and np.array_equal(a, b)


def test_native_reader_streaming_continuation():
    """samples() then into_samples() on a file-like input must continue
    frame-aligned through the shared native window."""
    pcm = synth_music(3000, channels=2, bps=16, seed=81)
    data = encode_flac(pcm, 44100, 16, block_size=1024)
    reader = FlacReader(io.BytesIO(data))
    first = [next(reader.samples()) for _ in range(1)]  # consumes block 0
    rest = list(reader.into_samples())
    got = np.array(first + rest)
    want = interleave(decode_all_blocks(FlacReader(data))).flatten()
    # The first iterator consumed one sample but its block is dropped on
    # abandonment (reference `src/lib.rs:378-384`): the remainder restarts
    # at the next block boundary.
    assert len(got) == 1 + (len(want) - 2048)
    assert got[0] == want[0]
    assert np.array_equal(got[1:], want[2048:])


@pytest.mark.parametrize("use_native", [True, False])
def test_reader_error_parity_crc(use_native):
    pcm = synth_music(4000, channels=2, bps=16, seed=82)
    data = bytearray(encode_flac(pcm, 44100, 16, block_size=1024))
    off = frames_section(bytes(data))
    data[off + 40] ^= 0x04  # corrupt frame payload -> CRC-16 mismatch
    fr = FrameReader(MemReader(bytes(data), pos=off), use_native=use_native)
    with pytest.raises(FormatError, match="frame CRC mismatch"):
        while fr.read_next_or_eof() is not None:
            pass


@pytest.mark.parametrize("use_native", [True, False])
def test_reader_error_parity_truncation(use_native):
    pcm = synth_music(4000, channels=2, bps=16, seed=83)
    data = encode_flac(pcm, 44100, 16, block_size=1024)
    off = frames_section(data)
    cut = data[:off + 100]
    fr = FrameReader(MemReader(cut, pos=off), use_native=use_native)
    with pytest.raises(IoError):
        while fr.read_next_or_eof() is not None:
            pass
    # Same through a buffered file-like reader.
    fr = FrameReader(BufferedReader(io.BytesIO(cut[off:])),
                     use_native=use_native)
    with pytest.raises(IoError):
        while fr.read_next_or_eof() is not None:
            pass
