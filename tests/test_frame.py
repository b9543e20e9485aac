"""Frame-layer unit tests (reference test tier 1, `src/frame.rs:107-648`)."""

import numpy as np
import pytest

from claxon_tpu.error import FormatError
from claxon_tpu.frame import (Block, read_var_length_int, decode_left_side,
                              decode_right_side, decode_mid_side,
                              ensure_buffer_len)
from claxon_tpu.io.readers import MemReader


def test_read_var_length_int():
    # Vector from the reference (`src/frame.rs:107-129`): UTF-8-style
    # encodings of 0x24, 0xa2, 0x20ac, 0x010348, then two invalid cases.
    r = MemReader(bytes([0x24, 0xC2, 0xA2, 0xE2, 0x82, 0xAC, 0xF0, 0x90,
                         0x8D, 0x88, 0xC2, 0x00, 0x80]))
    assert read_var_length_int(r) == 0x24
    assert read_var_length_int(r) == 0xA2
    assert read_var_length_int(r) == 0x20AC
    assert read_var_length_int(r) == 0x010348
    # Two-byte integer with invalid continuation byte.
    with pytest.raises(FormatError):
        read_var_length_int(r)
    # A continuation byte can never be the first byte.
    with pytest.raises(FormatError):
        read_var_length_int(r)


def test_decode_left_side():
    buf = np.array([2, 5, 83, 113, 127, -63, -45, -15,
                    7, 38, 142, 238, 0, -152, -52, -18], dtype=np.int32)
    expect = [2, 5, 83, 113, 127, -63, -45, -15,
              -5, -33, -59, -125, 127, 89, 7, 3]
    decode_left_side(buf)
    assert buf.tolist() == expect


def test_decode_right_side():
    buf = np.array([7, 38, 142, 238, 0, -152, -52, -18,
                    -5, -33, -59, -125, 127, 89, 7, 3], dtype=np.int32)
    expect = [2, 5, 83, 113, 127, -63, -45, -15,
              -5, -33, -59, -125, 127, 89, 7, 3]
    decode_right_side(buf)
    assert buf.tolist() == expect


def test_decode_mid_side():
    buf = np.array([-2, -14, 12, -6, 127, 13, -19, -6,
                    7, 38, 142, 238, 0, -152, -52, -18], dtype=np.int32)
    expect = [2, 5, 83, 113, 127, -63, -45, -15,
              -5, -33, -59, -125, 127, 89, 7, 3]
    decode_mid_side(buf)
    assert buf.tolist() == expect


def test_block_sample_layout():
    buf = np.array([2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47],
                   dtype=np.int32)
    block = Block(0, 5, buf)
    assert block.channels() == 3
    assert block.sample(0, 2) == 5
    assert block.sample(1, 3) == 23
    assert block.sample(2, 4) == 47
    assert block.channel(1).tolist() == [13, 17, 19, 23, 29]


def test_stereo_samples_iterator():
    buf = np.array([2, 3, 5, 7, 11, 13], dtype=np.int32)
    block = Block(0, 3, buf)
    assert list(block.stereo_samples()) == [(2, 7), (3, 11), (5, 13)]


def test_stereo_samples_requires_two_channels():
    block = Block(0, 5, np.zeros(15, dtype=np.int32))
    with pytest.raises(AssertionError):
        block.stereo_samples()


def test_ensure_buffer_len_resize_matrix():
    for capacity in range(10):
        for new_len in range(10):
            buffer = np.zeros(capacity, dtype=np.int32)
            resized = ensure_buffer_len(buffer, new_len)
            assert resized.shape[0] == new_len


def test_ensure_buffer_len_reuses_storage():
    big = np.arange(16, dtype=np.int32)
    small = ensure_buffer_len(big, 4)
    regrown = ensure_buffer_len(small, 16)
    # The original storage is reused: no reallocation happened.
    assert regrown.base is big or regrown is big
