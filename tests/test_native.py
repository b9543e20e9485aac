"""Differential tests: the C++ demux core vs the Python reference-fidelity
extractor. Every descriptor field, every sample, every error message must
match on every stream class, plus the committed corpus and error cases."""

import numpy as np
import pytest

from claxon_tpu import FlacReader, native
from claxon_tpu.error import Error, FormatError, IoError, Unsupported
from claxon_tpu.extract import extract_stream
from claxon_tpu.pipeline import decode_stream
from claxon_tpu.testing import encode_flac, synth_music
from util import decode_all_blocks, interleave

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="C++ core not built")


def assert_batches_equal(nb, pb):
    assert len(nb.frames) == len(pb.frames)
    for i, (nf, pf) in enumerate(zip(nb.frames, pb.frames)):
        assert (nf.block_size, nf.channels, nf.mode, nf.bps, nf.time) == \
               (pf.block_size, pf.channels, pf.mode, pf.bps, pf.time), i
        assert len(nf.subframes) == len(pf.subframes)
        for ns, ps in zip(nf.subframes, pf.subframes):
            assert (ns.order, ns.shift, ns.wasted) == \
                   (ps.order, ps.shift, ps.wasted), i
            assert np.array_equal(ns.coefs, ps.coefs), i
            assert np.array_equal(ns.x, ps.x), i


GEN_CASES = [
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
]


@pytest.mark.parametrize("kw", GEN_CASES, ids=lambda kw: str(sorted(kw)))
def test_native_extract_matches_python(kw):
    pcm = synth_music(6000, channels=2, bps=16, seed=31)
    data = encode_flac(pcm, 44100, 16, **kw)
    assert_batches_equal(native.extract_stream(data), extract_stream(data))


@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24])
def test_native_bit_depths(bps):
    pcm = synth_music(3000, channels=2, bps=bps, seed=bps)
    data = encode_flac(pcm, 44100, bps)
    assert_batches_equal(native.extract_stream(data), extract_stream(data))


def test_native_constant_subframes():
    pcm = np.full((4096, 2), -1234, dtype=np.int64)
    data = encode_flac(pcm, 44100, 16, force_subframe="constant",
                       stereo="independent")
    assert_batches_equal(native.extract_stream(data), extract_stream(data))


def test_native_multichannel_and_wasted():
    pcm = synth_music(2000, channels=5, bps=16, seed=3)
    data = encode_flac(pcm, 48000, 16, block_size=512)
    assert_batches_equal(native.extract_stream(data), extract_stream(data))

    pcm = synth_music(4000, channels=2, bps=16, seed=8) & ~np.int64(0x7)
    data = encode_flac(pcm, 44100, 16)
    assert_batches_equal(native.extract_stream(data), extract_stream(data))


@pytest.mark.parametrize("name", ["pop.flac", "short.flac",
                                  "wasted_bits.flac", "non_subset.flac"])
def test_native_committed_corpus(testsamples, name):
    data = (testsamples / name).read_bytes()
    assert_batches_equal(native.extract_stream(data), extract_stream(data))


@pytest.mark.parametrize("name", ["pop.flac", "short.flac",
                                  "wasted_bits.flac", "non_subset.flac"])
def test_native_scalar_decode_bit_exact(testsamples, name):
    data = (testsamples / name).read_bytes()
    si, pcm = native.decode_stream_scalar(data)
    scalar = interleave(decode_all_blocks(FlacReader(data)))
    assert np.array_equal(pcm, scalar)


def test_native_scalar_decode_generated():
    pcm = synth_music(9000, channels=2, bps=24, seed=41)
    data = encode_flac(pcm, 96000, 24, block_size=2048)
    si, out = native.decode_stream_scalar(data)
    # Ground truth: the encoder's input PCM, shape (n, channels).
    assert np.array_equal(out, np.asarray(pcm))
    scalar = interleave(decode_all_blocks(FlacReader(data)))
    assert np.array_equal(out, scalar)


def test_pipeline_uses_native():
    pcm = synth_music(6000, channels=2, bps=16, seed=51)
    data = encode_flac(pcm, 44100, 16)
    via_native = decode_stream(data, use_native=True)
    via_python = decode_stream(data, use_native=False)
    assert np.array_equal(via_native.pcm, via_python.pcm)


def _exc_of(fn, *args):
    try:
        fn(*args)
    except Error as e:
        return type(e), str(e)
    return None, None


@pytest.mark.parametrize("mutate", [
    "truncate",         # mid-frame EOF -> IoError
    "flip_data_bit",    # CRC-16 mismatch
    "flip_header_bit",  # header CRC-8 mismatch or header parse error
    "garbage_frame",    # sync code missing
])
def test_native_error_parity(mutate):
    pcm = synth_music(4000, channels=2, bps=16, seed=61)
    data = bytearray(encode_flac(pcm, 44100, 16, block_size=1024))
    # Locate the first frame: skip fLaC + metadata via the reader.
    from claxon_tpu.io.readers import MemReader
    from claxon_tpu.metadata import MetadataBlockReader
    from claxon_tpu.reader import read_stream_header
    r = MemReader(bytes(data))
    read_stream_header(r)
    for _ in MetadataBlockReader(r):
        pass
    first_frame = r.pos

    if mutate == "truncate":
        data = data[:first_frame + 30]
    elif mutate == "flip_data_bit":
        data[first_frame + 20] ^= 0x10
    elif mutate == "flip_header_bit":
        data[first_frame + 2] ^= 0x01
    elif mutate == "garbage_frame":
        data[first_frame] = 0x00

    data = bytes(data)
    n_exc = _exc_of(native.extract_stream, data)
    p_exc = _exc_of(extract_stream, data)
    assert n_exc == p_exc and n_exc[0] is not None, (mutate, n_exc, p_exc)


def build_escape_partition_stream():
    """Hand-assemble a stream whose first partition uses the Rice escape
    code (param all-ones = unencoded binary), which the reference reports
    as Unsupported (`src/subframe.rs:317-319`)."""
    import struct
    from claxon_tpu.crc import crc8, crc16
    from claxon_tpu.testing.flacgen import BitWriter

    si = BitWriter()
    si.write(16, 16)        # min block size
    si.write(16, 16)        # max block size
    si.write(0, 24)         # min frame size unknown
    si.write(0, 24)         # max frame size unknown
    si.write(44100, 20)     # sample rate
    si.write(0, 3)          # channels - 1
    si.write(15, 5)         # bps - 1
    si.write(0, 36)         # total samples unknown
    streaminfo = (bytes([0x80]) + (34).to_bytes(3, "big") +
                  si.getvalue() + b"\x00" * 16)

    fh = bytearray([0xFF, 0xF8,       # sync, fixed blocking
                    0b0110_1001,      # 8-bit block size follows; 44.1 kHz
                    0b0000_1000])     # 1 channel, 16 bps, reserved 0
    fh += bytes([0])                  # frame number 0 (utf8-style)
    fh += bytes([16 - 1])             # 8-bit block size - 1
    fh.append(crc8(bytes(fh)))

    sub = BitWriter()
    sub.write(0, 1)                   # padding bit
    sub.write(0b001000, 6)            # FIXED order 0
    sub.write(0, 1)                   # no wasted bits
    sub.write(0, 2)                   # residual method: Rice (4-bit params)
    sub.write(0, 4)                   # partition order 0
    sub.write(0b1111, 4)              # ESCAPE: unencoded binary
    sub.align()
    frame = bytes(fh) + sub.getvalue()
    frame += struct.pack(">H", crc16(frame))
    return b"fLaC" + streaminfo + frame


def test_native_unsupported_escape_partition():
    data = build_escape_partition_stream()
    n_exc = _exc_of(native.extract_stream, data)
    p_exc = _exc_of(extract_stream, data)
    assert n_exc == p_exc
    assert n_exc[0] is Unsupported
    assert "unencoded binary" in n_exc[1]
