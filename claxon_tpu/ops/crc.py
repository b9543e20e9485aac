"""Batched CRC-16 on device.

Two kernels with reference CRC semantics (claxon `src/crc.rs:33-57`,
polynomial 0x8005, init 0, MSB-first):

* ``crc16_device`` -- one lane per message held as explicit byte columns,
  a `lax.scan` over columns. Simple; sequential in message length.
* ``crc16_frames_device`` -- the production verifier for the stream-mode
  bits pipeline: each frame's byte range is read straight out of the
  uploaded stream words (the same upload the entropy kernel gathers
  from), CRC'd per 4-byte word with the 256-entry table, and combined in
  a log-depth GF(2) reduction tree using the zero-byte shift matrices
  from ``claxon_tpu.crc.crc16_combine_matrices``. Fully parallel in both
  frames and message length; checking a frame's bytes *including* its
  trailing stored CRC yields 0 iff the CRC matches (init-0, non-reflected
  CRC appended big-endian).
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..crc import CRC16_TABLE, crc16_combine_matrices

__all__ = ["crc16_device", "crc16_frames_device"]


@jax.jit
def crc16_device(data, lengths):
    """CRC-16 of each lane's first ``lengths[l]`` bytes.

    Args:
      data:    (L, B) int32 holding byte values 0..255 (padding arbitrary).
      lengths: (L,) int32 number of valid bytes per lane.

    Returns:
      (L,) int32 CRC-16 values (reference polynomial x^16+x^15+x^2+x^0,
      init 0, MSB-first).
    """
    table = jnp.asarray(CRC16_TABLE.astype(np.int32))

    def step(state, col):
        bytes_col, i = col
        idx = ((state >> 8) ^ bytes_col) & 0xFF
        nxt = table[idx] ^ ((state << 8) & 0xFFFF)
        state = jnp.where(i < lengths, nxt, state)
        return state, None

    B = data.shape[1]
    state0 = jnp.zeros(data.shape[0], dtype=jnp.int32)
    cols = (data.T, jnp.arange(B, dtype=jnp.int32))
    state, _ = jax.lax.scan(step, state0, cols)
    return state


@lru_cache(maxsize=1)
def _combine_rows():
    """mats[k][i]: CRC-16 state basis vector i shifted across 2^k zero
    bytes, as plain ints (baked into the program as constants)."""
    return [[int(r) for r in row] for row in crc16_combine_matrices(24)]


def _gf2_apply(rows, c):
    """Apply a GF(2) 16x16 matrix (basis-image rows, static ints) to every
    CRC-16 state in ``c``: XOR of the rows selected by the state's bits."""
    acc = jnp.zeros_like(c)
    for i in range(16):
        acc = acc ^ jnp.where((c >> i) & 1 != 0, jnp.int32(rows[i]), 0)
    return acc


def _word_crc16(table, w):
    """CRC-16 of one big-endian int32 word's 4 bytes, from state 0."""
    state = table[(w >> 24) & 0xFF]
    for shift in (16, 8, 0):
        b = (w >> shift) & 0xFF
        state = table[((state >> 8) ^ b) & 0xFF] ^ ((state << 8) & 0xFFFF)
    return state


def crc16_frames_device(stream, starts, ends, n_words):
    """CRC-16 over byte ranges [starts[f], ends[f]) of an uploaded stream.

    Args:
      stream:  (S,) int32 -- the frame-section upload, big-endian byte
               order (word w's bytes are w>>24, w>>16, w>>8, w, MSB first;
               pipeline_bits ships exactly this form).
      starts:  (F,) int32 byte offsets (first frame byte).
      ends:    (F,) int32 byte offsets one past the last byte (for frame
               verification: one past the stored CRC-16, so a result of 0
               means the frame's CRC matches).
      n_words: static int, power of two, with 4*n_words >= every range
               length. Ranges longer than that are NOT checked here
               (callers verify oversize frames on the host).

    Each range is laid out right-aligned in a 4*n_words-byte window ending
    exactly at ``ends[f]``: the window's leading bytes (before starts[f])
    are zeroed, which leaves an init-0 CRC unchanged, so no per-frame
    shift correction is needed. Window words are unaligned loads built
    from two adjacent stream words.
    """
    W = int(n_words)
    assert W & (W - 1) == 0, "n_words must be a power of two"
    table = jnp.asarray(CRC16_TABLE.astype(np.int32))
    S = stream.shape[0]

    starts = starts[:, None].astype(jnp.int32)          # (F, 1)
    ends = ends[:, None].astype(jnp.int32)
    s = jnp.arange(W, dtype=jnp.int32)[None, :]          # (1, W)
    p0 = ends - 4 * (W - s)                              # (F, W) byte pos
    q = jnp.floor_divide(p0, 4)
    r = p0 - 4 * q                                       # = ends % 4
    w0 = stream[jnp.clip(q, 0, S - 1)].astype(jnp.uint32)
    w1 = stream[jnp.clip(q + 1, 0, S - 1)].astype(jnp.uint32)
    # Unaligned big-endian load; r == 0 guards the undefined >> 32. Shift
    # amounts must be uint32: a uint32 op int32 pair promotes back to a
    # SIGNED shift under disabled x64.
    sh = (8 * r).astype(jnp.uint32)
    w = jnp.where(r == 0, w0, (w0 << sh) | (w1 >> (jnp.uint32(32) - sh)))
    w = w.astype(jnp.int32)
    # Zero bytes outside [start, end): leading window slack and (for
    # ranges not ending on the batch maximum) nothing trails by layout.
    for j in range(4):
        p = p0 + j
        keep = (p >= starts) & (p < ends)
        mask = jnp.where(keep, jnp.int32(0xFF), 0) << (8 * (3 - j))
        w = w & (mask | ~(jnp.int32(0xFF) << (8 * (3 - j))))
    crcs = _word_crc16(table, w)                         # (F, W)

    rows = _combine_rows()
    k = 2  # each word spans 4 = 2^2 bytes
    while crcs.shape[1] > 1:
        left = crcs[:, 0::2]
        right = crcs[:, 1::2]
        crcs = _gf2_apply(rows[k], left) ^ right
        k += 1
    return crcs[:, 0]
