"""Bitstream and byte-reader unit tests (reference test tier 1,
`src/input.rs:280-777`). Vectors are re-derived from the bit semantics; the
mixed-read warm-up vector is the real-stream vector from the reference's
`verify_read_mixed` (`src/input.rs:761-777`)."""

import io

import pytest

from claxon_tpu.error import IoError
from claxon_tpu.io.bits import Bitstream
from claxon_tpu.io.readers import BufferedReader, MemReader


def bits_of(*data):
    return Bitstream(MemReader(bytes(data)))


def test_read_bit():
    b = bits_of(0b1010_0100, 0b1110_0001)
    expect = [1, 0, 1, 0, 0, 1, 0, 0, 1, 1, 1, 0, 0, 0, 0, 1]
    got = [int(b.read_bit()) for _ in range(16)]
    assert got == expect
    with pytest.raises(IoError):
        b.read_bit()


def test_read_unary():
    # 1 010 01 001 0000000 001 00000 00000000 00001 01 0
    b = bits_of(0b1010_0100, 0b1000_0000, 0b0010_0000, 0b0000_0000,
                0b0000_1010)
    assert b.read_unary() == 0
    assert b.read_unary() == 1
    assert b.read_unary() == 2
    assert b.read_unary() == 2
    assert b.read_unary() == 9
    assert b.read_unary() == 17
    assert b.read_leq_u8(3) == 0b010
    with pytest.raises(IoError):
        b.read_bit()


def test_read_leq_u8_and_bits_interleave():
    b = bits_of(0b1101_0101, 0b0010_1111)
    assert b.read_leq_u8(3) == 0b110
    assert b.read_leq_u8(5) == 0b10101
    assert b.read_leq_u8(8) == 0b0010_1111


def test_read_leq_u8_straddles_bytes():
    b = bits_of(0b1111_0000, 0b1100_0011)
    assert b.read_leq_u8(5) == 0b11110
    assert b.read_leq_u8(6) == 0b000110
    assert b.read_leq_u8(5) == 0b00011


def test_read_gt_u8_leq_u16():
    b = bits_of(0xAB, 0xCD, 0xEF, 0x12)
    assert b.read_gt_u8_leq_u16(12) == 0xABC
    assert b.read_gt_u8_leq_u16(12) == 0xDEF
    assert b.read_leq_u8(8) == 0x12


def test_read_leq_u32():
    b = bits_of(0xDE, 0xAD, 0xBE, 0xEF, 0x80)
    assert b.read_leq_u32(32) == 0xDEADBEEF
    assert b.read_bit() is True


def test_read_mixed_realstream():
    # Real warm-up samples from a FLAC stream; byte vector and expected
    # values from the reference's verify_read_mixed (`src/input.rs:761-777`).
    data = [0x03, 0xC7, 0xBF, 0xE5, 0x9B, 0x74, 0x1E, 0x3A, 0xDD, 0x7D,
            0xC5, 0x5E, 0xF6, 0xBF, 0x78, 0x1B, 0xBD]
    b = bits_of(*data)
    assert b.read_leq_u8(6) == 0
    assert b.read_leq_u8(1) == 1
    minus = 1 << 16
    for expect in [-14401, -13514, -12168, -10517, -9131, -8489, -8698]:
        assert b.read_leq_u32(17) == minus | (expect & 0xFFFF)


def test_buffered_reader_over_stream():
    stream = io.BytesIO(bytes(range(256)) * 5)
    r = BufferedReader(stream, buffer_size=7)  # tiny buffer: refill paths
    assert r.read_u8() == 0
    assert r.read_be_u16() == 0x0102
    assert r.read_be_u24() == 0x030405
    assert r.read_be_u32() == 0x06070809
    assert r.read_le_u32() == 0x0D0C0B0A
    r.skip(240)
    assert r.read_u8() == 254
    assert r.read_u8_or_eof() == 255
    assert r.read_into(3) == bytes([0, 1, 2])


def test_buffered_reader_eof():
    r = BufferedReader(io.BytesIO(b"\x01"))
    assert r.read_u8() == 1
    assert r.read_u8_or_eof() is None
    with pytest.raises(IoError):
        r.read_u8()
    r2 = BufferedReader(io.BytesIO(b"\x01"))
    with pytest.raises(IoError):
        r2.read_into(2)


def test_mem_reader_eof():
    r = MemReader(b"ab")
    assert r.read_u8() == ord("a")
    assert r.read_u8_or_eof() == ord("b")
    assert r.read_u8_or_eof() is None
    with pytest.raises(IoError):
        r.read_u8()
