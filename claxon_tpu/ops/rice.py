"""Batched Rice (unary-quotient) entropy decoding on device.

The building block for fully in-kernel residual decoding (SURVEY.md
section 7, "throughput work" step 5: drop the host's per-sample bit walk).
One lane decodes one Rice partition: a `lax.scan` over the sample index
advances a per-lane bit cursor through a shared packed bit buffer --
find-next-set-bit (emulated count-leading-zeros), quotient, k-bit
remainder with word-straddle handling, and the u32-wrapping zig-zag map,
all bit-exact with the host path (claxon `src/subframe.rs:309-351`).

Production note: superseded in round 2 by ``ops.entropy`` (the stream and
delta kernels wired into the default pipeline -- see pipeline_bits.py);
this round-1 kernel remains as the simplest per-partition formulation and
a second independent implementation for differential tests
(tests/test_ops.py).

Bit order: stream bit i lives in words[i >> 5] at bit (31 - (i & 31))
(big-endian byte packing -- ``pack_bits_be`` on the host).
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

__all__ = ["rice_decode", "pack_bits_be"]


def pack_bits_be(data):
    """Host helper: bytes -> int32 words in the kernel's bit order, plus an
    all-ones guard word: straddling reads may touch one word past the end,
    and a cursor that drifts past its partition (inactive lanes between
    scan steps) must terminate its next-set-bit search immediately."""
    import numpy as np

    pad = (-len(data)) % 4
    buf = bytes(data) + b"\x00" * pad + b"\xff" * 4
    return np.frombuffer(buf, dtype=">u4").astype(np.int64).astype(np.int32)


def _u(x):
    return x.astype(jnp.uint32)


def _i(x):
    return x.astype(jnp.int32)


def _clz32(x):
    """Count leading zeros of int32 lanes (32 for zero)."""
    v = _u(x)
    v = v | (v >> 1)
    v = v | (v >> 2)
    v = v | (v >> 4)
    v = v | (v >> 8)
    v = v | (v >> 16)
    # popcount (SWAR) of the smeared value = 32 - clz.
    v = v - ((v >> 1) & 0x55555555)
    v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
    v = (v + (v >> 4)) & 0x0F0F0F0F
    return 32 - _i((v * 0x01010101) >> 24)


@lru_cache(maxsize=None)
def _rice_prog(T):
    """Jitted decoder for a static sample-axis width T."""

    @jax.jit
    def prog(words, start_bits, params, counts):
        n_words = words.shape[0]

        def find_next_one(pos):
            """Bit index of the first 1 at or after pos (vectorized; the
            while_loop spins only while some lane's current word is all
            zeros -- rare for real Rice streams)."""
            def cond(s):
                wi, masked = s
                return jnp.any((masked == 0) & (wi < n_words))

            def body(s):
                wi, masked = s
                adv = masked == 0
                wi2 = jnp.where(adv, wi + 1, wi)
                w2 = words[jnp.clip(wi2, 0, n_words - 1)]
                return wi2, jnp.where(adv & (wi2 < n_words), w2, masked)

            wi0 = pos >> 5
            off = pos & 31
            w0 = words[jnp.clip(wi0, 0, n_words - 1)]
            masked0 = _i(_u(w0) & (_u(jnp.int32(-1)) >> _u(off)))
            wi, masked = jax.lax.while_loop(cond, body, (wi0, masked0))
            return (wi << 5) + _clz32(masked)

        def read_k_bits(pos, k):
            """k bits (0..30) starting at bit pos; straddles two words."""
            wi = pos >> 5
            off = pos & 31
            w0 = words[jnp.clip(wi, 0, n_words - 1)]
            w1 = words[jnp.clip(wi + 1, 0, n_words - 1)]
            left = _i(_u(w0) << _u(off))  # off in [0, 32)
            right = jnp.where(
                off == 0, 0,
                _i(_u(w1) >> _u(jnp.where(off == 0, 1, 32 - off))))
            window = left | right         # the 32 bits starting at pos
            return jnp.where(
                k == 0, 0,
                _i(_u(window) >> _u(jnp.where(k == 0, 1, 32 - k))))

        def step(pos, j):
            one = find_next_one(pos)
            q = _u(one - pos)
            r = _u(read_k_bits(one + 1, params))
            v = _i((q << _u(params)) | r)  # u32 wrap like the reference
            sample = jnp.where(v & 1, _i(~(_u(v) >> 1)), _i(_u(v) >> 1))
            active = j < counts
            return (jnp.where(active, one + 1 + params, pos),
                    jnp.where(active, sample, 0))

        end, out = jax.lax.scan(step, start_bits,
                                jnp.arange(T, dtype=jnp.int32))
        return out.T, end

    return prog


def rice_decode(words, start_bits, params, counts, max_count=None):
    """Decode one Rice partition per lane.

    Args:
      words:      (W,) int32 packed bits (pack_bits_be).
      start_bits: (L,) absolute bit offset of each lane's first code.
      params:     (L,) Rice parameter k per lane (0..30).
      counts:     (L,) samples per lane.
      max_count:  static sample-axis width (default: max(counts)).

    Returns:
      (residuals (L, max_count) int32, 0 past counts[l];
       end_bits (L,) int32 cursor after each lane's last code).
    """
    import numpy as np

    # Bit cursors are int32 lanes (TPU has no fast int64): the packed
    # buffer must stay under 2^31 bits. Segment larger corpora into
    # multiple buffers.
    if int(np.asarray(words).shape[0]) > (1 << 26):  # 2^31 bits / 32
        raise ValueError("packed bit buffer exceeds the int32 cursor "
                         "range (2^31 bits, 256 MiB); split the input")

    counts = np.asarray(counts, dtype=np.int32)
    T = int(max_count if max_count is not None else counts.max(initial=0))
    return _rice_prog(T)(
        jnp.asarray(words),
        jnp.asarray(np.asarray(start_bits, dtype=np.int32)),
        jnp.asarray(np.asarray(params, dtype=np.int32)),
        jnp.asarray(counts))
