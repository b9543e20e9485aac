"""Batched CRC-16 on device.

Two kernels with reference CRC semantics (claxon `src/crc.rs:33-57`,
polynomial 0x8005, init 0, MSB-first):

* ``crc16_device`` -- one lane per message held as explicit byte columns,
  a `lax.scan` over columns. Simple; sequential in message length.
* ``crc16_ranges_device`` -- THE PRODUCTION frame verifier for the
  stream-mode bits pipeline: a whole-upload prefix-scan CRC (granule base
  pass + Hillis-Steele combine with the zero-byte shift matrices from
  ``claxon_tpu.crc.crc16_combine_matrices``), then per-frame CRCs from
  two byte-granular prefix lookups. Checking a frame's bytes *including*
  its trailing stored CRC yields 0 iff the CRC matches (init-0,
  non-reflected CRC appended big-endian).
* ``crc16_frames_device`` -- the earlier windowed form (right-aligned
  per-frame windows over the upload); kept as an independent
  implementation for differential tests. Its ``n_words`` caps the range
  length, which the prefix form has no need of.
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..crc import CRC16_TABLE, crc16_combine_matrices

__all__ = ["crc16_device", "crc16_frames_device", "crc16_ranges_device"]


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
    bytes, as plain ints (baked into the program as constants). 28 levels
    cover granule spans up to 2^27 bytes -- the bits pipeline's whole
    batch-size cap -- with headroom (a shorter table would silently clamp
    the prefix scan's shift for streams past 16 MiB)."""
    return [[int(r) for r in row] for row in crc16_combine_matrices(28)]


def _gf2_apply(rows, c):
    """Apply a GF(2) 16x16 matrix (basis-image rows, static ints) to every
    CRC-16 state in ``c``: XOR of the rows selected by the state's bits."""
    acc = jnp.zeros_like(c)
    for i in range(16):
        acc = acc ^ jnp.where((c >> i) & 1 != 0, jnp.int32(rows[i]), 0)
    return acc


@lru_cache(maxsize=1)
def _word_bit_rows():
    """rows[i]: CRC-16 (init 0) of the 4-byte message with only bit i set
    (i = 31 is the MSB of the first byte). CRC is GF(2)-linear in the
    message bits, so a word's CRC is the XOR of the rows its bits select
    -- pure vector ops, no table gathers (gathers are the slow op on the
    TPU vector unit; the 256-entry-table form measured ~4x slower)."""
    from ..crc import crc16

    rows = []
    for i in range(32):
        w = 1 << i
        rows.append(crc16(bytes([(w >> 24) & 255, (w >> 16) & 255,
                                 (w >> 8) & 255, w & 255])))
    return rows


def _word_crc16(w):
    """CRC-16 of each big-endian int32 word's 4 bytes, from state 0."""
    rows = _word_bit_rows()
    acc = jnp.zeros_like(w)
    for i in range(32):
        acc = acc ^ jnp.where((w >> i) & 1 != 0, jnp.int32(rows[i]), 0)
    return acc


#: words per prefix-scan granule: the base CRC is computed per 8-word
#: (32-byte) element, cutting total element-ops ~6x vs per-word (the
#: row constants absorb each word's in-granule byte shift).
_G = 8


@lru_cache(maxsize=1)
def _granule_bit_rows():
    """rows[j][i]: CRC-16 of the 4*_G-byte message whose only set bit is
    bit i of word j (big-endian words, word 0 first)."""
    from ..crc import crc16

    out = []
    for j in range(_G):
        rows = []
        for i in range(32):
            w = 1 << i
            msg = (bytes(4 * j) +
                   bytes([(w >> 24) & 255, (w >> 16) & 255,
                          (w >> 8) & 255, w & 255]) +
                   bytes(4 * (_G - 1 - j)))
            rows.append(crc16(msg))
        out.append(rows)
    return out


@lru_cache(maxsize=1)
def _partial_word_rows():
    """rows[t][i]: CRC-16 of the first t bytes of the 4-byte message with
    only bit i set (t = 0..3; t = 0 rows are all zero)."""
    from ..crc import crc16

    out = []
    for t in range(4):
        rows = []
        for i in range(32):
            w = 1 << i
            msg = bytes([(w >> 24) & 255, (w >> 16) & 255,
                         (w >> 8) & 255, w & 255])[:t]
            rows.append(crc16(msg))
        out.append(rows)
    return out


@lru_cache(maxsize=1)
def _combine_mats_arr():
    """(28, 16) int32 constant of the zero-byte shift matrices, for
    loop-form kernels (a fori_loop body indexes one matrix dynamically,
    keeping the compiled graph one level deep)."""
    return np.array(_combine_rows(), dtype=np.int32)


def _gf2_apply_dyn(rows, c):
    """_gf2_apply with traced (16,) row values (scalar broadcasts)."""
    acc = jnp.zeros_like(c)
    for i in range(16):
        acc = acc ^ jnp.where((c >> i) & 1 != 0, rows[i], 0)
    return acc


def _xor_select(w, rows, nbits=32):
    """XOR of ``rows`` (a (..., nbits) or (nbits,) row table) selected by
    the low ``nbits`` bits of ``w``, vectorized over the bit axis. For
    SMALL arrays this beats the nbits-step select loop, which is
    dominated by fixed per-op overhead on the TPU."""
    bits = (w[..., None] >> jnp.arange(nbits, dtype=jnp.int32)) & 1
    prods = jnp.where(bits != 0, rows, 0)
    return jax.lax.reduce(prods, np.int32(0),
                          jax.lax.bitwise_xor, [w.ndim])


def _shift_by_bytes(c, n, max_log2=24):
    """shift(c, n): CRC state across n zero bytes, n a traced int32."""
    if max_log2 <= 4:
        mats = jnp.asarray(_combine_mats_arr())
        for j in range(max_log2):
            c = jnp.where((n >> j) & 1 != 0,
                          _xor_select(c, mats[j], 16), c)
        return c
    mats = jnp.asarray(_combine_mats_arr())

    def body(j, c):
        return jnp.where((n >> j) & 1 != 0,
                         _xor_select(c, mats[j], 16), c)

    return jax.lax.fori_loop(0, max_log2, body, c)


def crc16_ranges_device(stream, starts, ends):
    """CRC-16 over byte ranges [starts[f], ends[f]) of an uploaded stream
    -- the production frame verifier (replaces the windowed form below in
    the decode pipeline).

    Same argument convention as ``crc16_frames_device`` but the work
    scales with the stream size, not frames x window: per-word CRCs
    (GF(2)-linear bit selects, no gathers), an inclusive Hillis-Steele
    combine scan whose per-level shift is a fixed matrix (contiguous
    slices, no gathers), then each range's CRC from two byte-granular
    prefix lookups:

        crc[a:b) = PB(b) ^ shift(PB(a), b - a)
        PB(o)    = shift(P[o // 32], o % 32) ^ crc(partial granule)

    where P is the exclusive 8-word-granule prefix CRC. Only the final
    per-frame lookups gather (a few (F,)-sized elements)."""
    S = stream.shape[0]
    G = _G
    Sp = -(-S // G) * G
    st = jnp.pad(stream, (0, Sp - S)) if Sp != S else stream
    gw = st.reshape(Sp // G, G)
    NG = Sp // G

    # Granule CRCs: CRC-16 of each 4*G-byte element, GF(2)-linear in its
    # 32*G bits with per-word-position row constants (one pass, no
    # intermediate word-level array).
    acc = jnp.zeros(NG, jnp.int32)
    grows = _granule_bit_rows()
    for j in range(G):
        w = gw[:, j]
        for i in range(32):
            acc = acc ^ jnp.where((w >> i) & 1 != 0,
                                  jnp.int32(grows[j][i]), 0)

    # Inclusive granule-prefix CRC, A[g] = crc(granules[0..g]):
    # Hillis-Steele with combine(x, y) = shift(x, bytes(y)) ^ y; the
    # shift matrix for level l covers 4*G * 2^l zero bytes. Levels unroll
    # statically (shifts are zero-padded static slices): at granule
    # width the whole scan is a few hundred ops, and the unrolled form
    # avoids the while-loop's per-level serialization.
    rows = _combine_rows()
    A = acc
    span = 1
    while span < NG:
        k = 5 + span.bit_length() - 1
        left = jnp.concatenate([jnp.zeros(span, A.dtype), A[:-span]])
        A = _gf2_apply(rows[k], left) ^ A
        span *= 2
    # Exclusive prefix with NG + 1 entries: P[NG] = crc of everything, so
    # a range ending exactly at the padded stream end (g == NG, r == 0)
    # still resolves (the clipped word gathers are masked by r == 0).
    P = jnp.concatenate([jnp.zeros(1, A.dtype), A])

    wrows = _word_bit_rows()
    prows = _partial_word_rows()

    def prefix_bytes(o):
        # PB(o) = shift(P[o // 32], o % 32) ^ crc(partial granule): the
        # partial part folds the granule's words with t_j in {0..4} bytes
        # each -- all on (F,)-sized data, so the nested selects are free.
        g = jnp.clip(o >> 5, 0, NG)
        gp = jnp.clip(g, 0, NG - 1)
        r = o & (4 * G - 1)
        base = _shift_by_bytes(P[g], r, max_log2=5)
        wr = jnp.asarray(np.array(wrows, np.int32))
        pr = jnp.asarray(np.array(prows, np.int32))  # (4, 32)
        state = jnp.zeros_like(o)
        for j in range(G):
            w = gw[:, j][gp]
            t = (jnp.clip(r - 4 * j, 0, 4))[:, None]
            state = _shift_by_bytes(state, t[:, 0], max_log2=3)
            # Row table per element, selected by t (bit ops vectorized
            # over the 32-bit axis -- per-op overhead dominates (F,)-sized
            # select loops on the TPU).
            sel = jnp.where(t == 4, wr,
                            jnp.where(t == 1, pr[1],
                                      jnp.where(t == 2, pr[2], pr[3])))
            sel = jnp.where(t == 0, 0, sel)
            bits = (w[:, None] >> jnp.arange(32, dtype=jnp.int32)) & 1
            state = state ^ jax.lax.reduce(
                jnp.where(bits != 0, sel, 0), np.int32(0),
                jax.lax.bitwise_xor, [1])
        return base ^ state

    starts = starts.astype(jnp.int32)
    ends = ends.astype(jnp.int32)
    return prefix_bytes(ends) ^ _shift_by_bytes(prefix_bytes(starts),
                                                ends - starts)


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
    S = stream.shape[0]

    starts = starts[:, None].astype(jnp.int32)          # (F, 1)
    ends = ends[:, None].astype(jnp.int32)
    s = jnp.arange(W, dtype=jnp.int32)[None, :]          # (1, W)
    p0 = ends - 4 * (W - s)                              # (F, W) byte pos
    # Window word indices are consecutive per frame, so ONE (F, W+1)
    # gather serves both halves of every unaligned load.
    q0 = jnp.floor_divide(ends - 4 * W, 4)               # (F, 1)
    idx = q0 + jnp.arange(W + 1, dtype=jnp.int32)[None, :]
    g = stream[jnp.clip(idx, 0, S - 1)].astype(jnp.uint32)
    w0, w1 = g[:, :-1], g[:, 1:]
    r = ends - 4 * jnp.floor_divide(ends, 4)             # (F, 1) ends % 4
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
    crcs = _word_crc16(w)                                # (F, W)

    rows = _combine_rows()
    k = 2  # each word spans 4 = 2^2 bytes
    while crcs.shape[1] > 1:
        left = crcs[:, 0::2]
        right = crcs[:, 1::2]
        crcs = _gf2_apply(rows[k], left) ^ right
        k += 1
    return crcs[:, 0]
