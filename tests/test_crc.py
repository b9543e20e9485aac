"""CRC-8 / CRC-16 unit tests (reference test tier 1, `src/crc.rs:197-209`)."""

import numpy as np

from claxon_tpu.crc import (CRC8_TABLE, CRC16_TABLE, crc8, crc16,
                            crc16_combine_matrices)
from claxon_tpu.io.readers import Crc8Reader, Crc16Reader, MemReader


def test_crc8_check_value():
    # Standard check value for CRC-8 poly 0x07, init 0 (CRC-8/SMBUS family):
    # crc8("123456789") == 0xF4.
    assert crc8(b"123456789") == 0xF4


def test_crc16_check_value():
    # Standard check value for CRC-16 poly 0x8005 MSB-first, init 0
    # (CRC-16/UMTS aka BUYPASS): crc16("123456789") == 0xFEE8.
    assert crc16(b"123456789") == 0xFEE8


def test_crc8_empty_and_single():
    assert crc8(b"") == 0
    assert crc8(b"\x00") == 0
    assert crc8(b"\x01") == CRC8_TABLE[1]


def test_crc_reader_streams_match_whole_buffer():
    data = bytes(range(251)) * 3
    r8 = Crc8Reader(MemReader(data))
    for _ in range(len(data)):
        r8.read_u8()
    assert r8.crc == crc8(data)

    r16 = Crc16Reader(MemReader(data))
    for _ in range(len(data)):
        r16.read_u8()
    assert r16.crc == crc16(data)


def test_crc_readers_forbid_skip():
    import pytest
    r = Crc8Reader(MemReader(b"abcdef"))
    with pytest.raises(AssertionError):
        r.skip(2)
    with pytest.raises(AssertionError):
        r.read_into(2)


def test_crc16_combine_matrices():
    # crc(a ++ zeros(2^k)) must equal applying M[k] to crc(a).
    mats = crc16_combine_matrices(max_log2_len=6)

    def apply(mat, state):
        r = 0
        for i in range(16):
            if state & (1 << i):
                r ^= int(mat[i])
        return r

    rng = np.random.default_rng(42)
    data = bytes(rng.integers(0, 256, 37, dtype=np.uint8))
    for k in range(6):
        shifted = crc16(data + b"\x00" * (1 << k))
        assert apply(mats[k], crc16(data)) == shifted


def test_crc16_device_matches_host():
    import numpy as np
    import jax.numpy as jnp
    from claxon_tpu.crc import crc16
    from claxon_tpu.ops.crc import crc16_device

    rng = np.random.default_rng(12)
    L, B = 8, 300
    data = rng.integers(0, 256, (L, B)).astype(np.int32)
    lengths = rng.integers(0, B + 1, L).astype(np.int32)
    got = np.asarray(crc16_device(jnp.asarray(data), jnp.asarray(lengths)))
    for l in range(L):
        want = crc16(bytes(data[l, :lengths[l]].astype(np.uint8)))
        assert int(got[l]) == want, l


def test_crc16_combine_matrices_compose():
    import numpy as np
    from claxon_tpu.crc import crc16, crc16_combine_matrices

    mats = crc16_combine_matrices(8)

    def shift(state, log2_nbytes):
        row = mats[log2_nbytes]
        out = 0
        for i in range(16):
            if state & (1 << i):
                out ^= int(row[i])
        return out

    rng = np.random.default_rng(13)
    a = bytes(rng.integers(0, 256, 37).astype(np.uint8))
    b = bytes(rng.integers(0, 256, 16).astype(np.uint8))
    # crc(a ++ b) = shift(crc(a), len(b)) ^ crc(b)  with len(b) = 2^4.
    assert crc16(a + b) == shift(crc16(a), 4) ^ crc16(b)


def test_crc16_frames_device_matches_scalar():
    """The parallel frame verifier (right-aligned unaligned loads +
    GF(2) reduction tree) equals the scalar CRC on arbitrary unaligned
    byte ranges, including empty and window-capacity-sized ones."""
    import jax
    import jax.numpy as jnp
    from claxon_tpu.ops.crc import crc16_frames_device

    rng = np.random.default_rng(21)
    raw = rng.integers(0, 256, 3000, dtype=np.uint8).tobytes()
    buf = np.frombuffer(raw, np.uint8)
    pad = np.zeros((-len(buf)) % 4, np.uint8)
    stream = jnp.asarray(np.concatenate([buf, pad]).view(">i4")
                         .astype(np.int32))

    cases = [(0, 0), (5, 5), (0, 1), (0, 3000), (1, 2999), (2, 2998),
             (3, 2997), (7, 512), (13, 526), (100, 101), (2999, 3000)]
    cases += [tuple(sorted(rng.integers(0, 3001, 2))) for _ in range(20)]
    starts = jnp.asarray(np.array([a for a, _ in cases], np.int32))
    ends = jnp.asarray(np.array([b for _, b in cases], np.int32))
    got = np.asarray(jax.jit(crc16_frames_device, static_argnums=3)(
        stream, starts, ends, 1024))
    want = np.array([crc16(raw[a:b]) for a, b in cases], np.int32)
    assert np.array_equal(got, want)
    # Appending a range's own CRC big-endian yields 0 (the verifier
    # checks frames this way: range includes the stored CRC).
    c = crc16(raw[10:90])
    ext = raw[:90] + bytes([c >> 8, c & 0xFF]) + raw[92:]
    stream2 = jnp.asarray(np.frombuffer(ext[:3000], np.uint8)
                          .copy().view(">i4").astype(np.int32))
    got2 = int(np.asarray(jax.jit(crc16_frames_device, static_argnums=3)(
        stream2, jnp.asarray(np.array([10], np.int32)),
        jnp.asarray(np.array([92], np.int32)), 64))[0])
    assert got2 == 0


def test_crc16_ranges_device_matches_scalar():
    """The prefix-scan range verifier (the production kernel) equals the
    scalar CRC on arbitrary unaligned byte ranges."""
    import jax
    import jax.numpy as jnp
    from claxon_tpu.ops.crc import crc16_ranges_device

    rng = np.random.default_rng(22)
    raw = rng.integers(0, 256, 5003, dtype=np.uint8).tobytes()
    buf = np.frombuffer(raw, np.uint8)
    pad = np.zeros((-len(buf)) % 4, np.uint8)
    stream = jnp.asarray(np.concatenate([buf, pad]).view(">i4")
                         .astype(np.int32))

    cases = [(0, 0), (5, 5), (0, 1), (0, 5003), (1, 5000), (2, 4998),
             (3, 4997), (7, 512), (13, 526), (100, 101), (5002, 5003),
             (4999, 5003)]
    cases += [tuple(sorted(rng.integers(0, 5004, 2))) for _ in range(25)]
    starts = jnp.asarray(np.array([a for a, _ in cases], np.int32))
    ends = jnp.asarray(np.array([b for _, b in cases], np.int32))
    got = np.asarray(jax.jit(crc16_ranges_device)(stream, starts, ends))
    want = np.array([crc16(raw[a:b]) for a, b in cases], np.int32)
    assert np.array_equal(got, want)


def test_crc16_ranges_device_end_at_padded_boundary():
    """Regression: a range ending exactly at the (granule-padded) stream
    end must include the final granule in its prefix."""
    import jax
    import jax.numpy as jnp
    from claxon_tpu.ops.crc import crc16_ranges_device

    rng = np.random.default_rng(23)
    raw = rng.integers(0, 256, 1024, dtype=np.uint8).tobytes()  # 256 words
    stream = jnp.asarray(np.frombuffer(raw, np.uint8).copy().view(">i4")
                         .astype(np.int32))  # 256 % 8 == 0: no padding
    cases = [(0, 1024), (1, 1024), (1000, 1024), (992, 1024), (0, 992)]
    starts = jnp.asarray(np.array([a for a, _ in cases], np.int32))
    ends = jnp.asarray(np.array([b for _, b in cases], np.int32))
    got = np.asarray(jax.jit(crc16_ranges_device)(stream, starts, ends))
    want = np.array([crc16(raw[a:b]) for a, b in cases], np.int32)
    assert np.array_equal(got, want)


def test_crc16_ranges_device_past_16mib():
    """Regression: the shift-matrix table must cover the full batch-size
    cap; a 24-entry table silently clamped the prefix shift for ranges
    past 16 MiB of upload (wrong CRCs on big valid batches)."""
    import jax
    import jax.numpy as jnp
    from claxon_tpu.ops.crc import crc16_ranges_device

    n = 17 * (1 << 20)
    rng = np.random.default_rng(24)
    raw = np.zeros(n, np.uint8)
    tail = rng.integers(0, 256, 8192, dtype=np.uint8)
    raw[-8192:] = tail  # nonzero content only near the far end
    stream = jnp.asarray(raw.view(">i4").astype(np.int32))
    a, b = n - 5000, n - 1000
    got = int(np.asarray(jax.jit(crc16_ranges_device)(
        stream, jnp.asarray(np.array([a], np.int32)),
        jnp.asarray(np.array([b], np.int32))))[0])
    assert got == crc16(raw[a:b].tobytes())
