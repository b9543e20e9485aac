"""Subframe numeric-core unit tests (reference test tier 1,
`src/subframe.rs:103-649`). The real-stream golden vectors (verified against
libflac by the reference project) are reused as the cheapest bit-exactness
oracle for our predictors."""

from claxon_tpu.io.bits import Bitstream
from claxon_tpu.io.readers import MemReader
from claxon_tpu.subframe import (extend_sign, rice_to_signed, predict_fixed,
                                 predict_lpc, decode_residual)
from claxon_tpu.error import FormatError, Unsupported

import pytest


def test_extend_sign():
    # Vectors from the reference `src/subframe.rs:103-140`.
    assert extend_sign(5, 4) == 5
    assert extend_sign(0x3FFE, 15) == 0x3FFE
    assert extend_sign(16 - 5, 4) == -5
    assert extend_sign(512 - 3, 9) == -3
    assert extend_sign(0xFFFF, 16) == -1
    assert extend_sign(0xFFFE, 16) == -2
    assert extend_sign(0x7FFF, 15) == -1
    assert extend_sign(0xFFFFFFFF, 32) == -1
    assert extend_sign(0xFFFFFFFE, 32) == -2
    assert extend_sign(0x7FFFFFFF, 31) == -1
    # Real-stream samples.
    assert extend_sign(124680, 17) == -6392
    assert extend_sign(124467, 17) == -6605
    assert extend_sign(124222, 17) == -6850
    assert extend_sign(124011, 17) == -7061


def test_rice_to_signed():
    assert [rice_to_signed(v) for v in range(5)] == [0, -1, 1, -2, 2]


def test_predict_fixed_realstream():
    # Real 16-bit stream data, verified against the reference decoder
    # (`src/subframe.rs:476-490`).
    buf = [-729, -722, -667, -19, -16, 17, -23, -7,
           16, -16, -5, 3, -8, -13, -15, -1]
    predict_fixed(3, buf)
    assert buf == [-729, -722, -667, -583, -486, -359, -225, -91,
                   59, 209, 354, 497, 630, 740, 812, 845]


def test_predict_fixed_wrapping_overflow():
    # This data causes i32 overflow when not handled with care.
    buf = [21877, 27482, -6513]
    predict_fixed(2, buf)
    assert buf == [21877, 27482, 26574]


def test_predict_lpc_realstream_low_order():
    coefficients = [-75, 166, 121, -269, -75, -399, 1042]
    buf = [-796, -547, -285, -32, 199, 443, 670, -2,
           -23, 14, 6, 3, -4, 12, -2, 10]
    predict_lpc(coefficients, 9, buf)
    assert buf == [-796, -547, -285, -32, 199, 443, 670, 875,
                   1046, 1208, 1343, 1454, 1541, 1616, 1663, 1701]


def test_predict_lpc_overflow():
    coefficients = [119, -255, 555, -836, 879, -1199, 1757]
    buf = [-21363, -21951, -22649, -24364, -27297, -26870, -30017, 3157]
    predict_lpc(coefficients, 10, buf)
    assert buf == [-21363, -21951, -22649, -24364, -27297, -26870, -30017, -29718]


def test_predict_lpc_high_order():
    coefficients = [
        709, -2589, 4600, -4612, 1350, 4220, -9743, 12671, -12129, 8586,
        -3775, -645, 3904, -5543, 4373, 182, -6873, 13265, -15417, 11550,
    ]
    buf = [
        213238, 210830, 234493, 209515, 235139, 201836, 208151, 186277,
        157720, 148176, 115037, 104836, 60794, 54523, 412, 17943, -6025,
        -3713, 8373, 11764, 30094,
    ]
    predict_lpc(coefficients, 12, buf)
    assert buf[-1] == 33931
    assert buf[:-1] == [
        213238, 210830, 234493, 209515, 235139, 201836, 208151, 186277,
        157720, 148176, 115037, 104836, 60794, 54523, 412, 17943, -6025,
        -3713, 8373, 11764,
    ]


def _bits(data):
    return Bitstream(MemReader(bytes(data)))


def test_rice_partition_roundtrip():
    # Hand-assembled residual: method 00, partition order 0, rice param 2,
    # then 4 rice(2) codes for the zig-zag values of [0, -1, 1, -2]:
    # unsigned 0,1,2,3 -> quotient 0 each, remainder 2 bits.
    # Bits: 00 0000 0010 | 1 00 | 1 01 | 1 10 | 1 11  (quotient unary '1')
    bitstr = "00" + "0000" + "0010" + "100" + "101" + "110" + "111"
    bitstr += "0" * (8 - len(bitstr) % 8)
    data = [int(bitstr[i:i + 8], 2) for i in range(0, len(bitstr), 8)]
    buf = [0] * 4
    decode_residual(_bits(data), 4, buf, 0, 4)
    assert buf == [0, -1, 1, -2]


def test_rice_escape_is_unsupported():
    # Rice param 0b1111 is the unencoded-binary escape -> Unsupported
    # (`src/subframe.rs:317-319`).
    bitstr = "00" + "0000" + "1111" + "0" * 6
    data = [int(bitstr[i:i + 8], 2) for i in range(0, len(bitstr), 8)]
    buf = [0] * 4
    with pytest.raises(Unsupported):
        decode_residual(_bits(data), 4, buf, 0, 4)


def test_invalid_partition_order():
    # Block size 6 with partition order 2 (4 partitions): 6 % 4 != 0.
    bitstr = "00" + "0010" + "0010" + "0" * 6
    data = [int(bitstr[i:i + 8], 2) for i in range(0, len(bitstr), 8)]
    buf = [0] * 6
    with pytest.raises(FormatError):
        decode_residual(_bits(data), 6, buf, 0, 6)


def test_reserved_residual_method():
    bitstr = "10" + "0" * 14
    data = [int(bitstr[i:i + 8], 2) for i in range(0, len(bitstr), 8)]
    with pytest.raises(FormatError):
        decode_residual(_bits(data), 4, [0] * 4, 0, 4)
