"""Per-frame epilogue: wasted-bits shift + stereo decorrelation.

Pure elementwise device ops, fused by XLA into the synthesis program.
Semantics mirror the reference exactly:

* wasted bits: wrapping left shift (`src/subframe.rs:216-225`);
* left/side:  right = left - side (wrapping, `src/frame.rs:318-334`);
* right/side: left = side + right (wrapping, `src/frame.rs:344-360`);
* mid/side:   mid' = mid*2 | (side & 1); left = (mid'+side)>>1;
              right = (mid'-side)>>1 (`src/frame.rs:370-389`; the sums are
              always even so the truncating division is an arithmetic shift).

Lane layout contract: lanes are *pair-aligned* -- a stereo-decorrelated
frame's two subframes occupy lanes (2p, 2p+1), and ``pair_modes[p]`` holds
its channel-assignment code. Pairs with mode 0 (independent channels, mono
streams, >2-channel streams, padding) pass through unchanged, so their
pairing is arbitrary. This makes the whole epilogue a reshape plus
elementwise selects -- no gather/scatter -- so a lane-sharded multi-chip
decode needs zero collectives here.

Channel-assignment codes: 0 independent, 1 left/side, 2 right/side,
3 mid/side (``claxon_tpu.extract.MODE_CODES``).
"""

import jax
import jax.numpy as jnp

__all__ = ["apply_epilogue", "pack_int16_pairs", "unpack_int16_pairs",
           "MODE_INDEPENDENT", "MODE_LEFT_SIDE", "MODE_RIGHT_SIDE",
           "MODE_MID_SIDE"]

MODE_INDEPENDENT = 0
MODE_LEFT_SIDE = 1
MODE_RIGHT_SIDE = 2
MODE_MID_SIDE = 3


@jax.jit
def apply_epilogue(samples, wasted, pair_modes):
    """Undo wasted-bits shifts, then stereo decorrelation.

    Args:
      samples:    (L, T) int32 synthesized subframe outputs; L is even.
      wasted:     (L,) int32 wasted bits per lane (applied to every lane).
      pair_modes: (L//2,) int32 channel-assignment code of each lane pair
                  (2p, 2p+1); 0 passes the pair through unchanged.

    Returns:
      (L, T) int32 with wasted-bits applied everywhere and the stereo pairs
      decorrelated in place.
    """
    samples = samples << wasted[:, None]
    L, T = samples.shape
    pairs = samples.reshape(L // 2, 2, T)
    c0 = pairs[:, 0]
    c1 = pairs[:, 1]
    m = pair_modes[:, None]

    # left/side: ch1 <- ch0 - ch1
    ls0, ls1 = c0, c0 - c1
    # right/side: ch0 <- ch0 + ch1
    rs0, rs1 = c0 + c1, c1
    # mid/side
    mid2 = (c0 * jnp.int32(2)) | (c1 & jnp.int32(1))
    ms0 = (mid2 + c1) >> 1
    ms1 = (mid2 - c1) >> 1

    out0 = jnp.where(m == MODE_LEFT_SIDE, ls0,
                     jnp.where(m == MODE_RIGHT_SIDE, rs0,
                               jnp.where(m == MODE_MID_SIDE, ms0, c0)))
    out1 = jnp.where(m == MODE_LEFT_SIDE, ls1,
                     jnp.where(m == MODE_RIGHT_SIDE, rs1,
                               jnp.where(m == MODE_MID_SIDE, ms1, c1)))

    return jnp.stack([out0, out1], axis=1).reshape(L, T)


def pack_int16_pairs(out, per_lane=False):
    """Pack (L, T) int32 samples into ((L, T//2) int32, overflow flag).

    ``per_lane=True`` reduces the overflow flag only along the time axis,
    returning an (L,) vector: under lane sharding the scalar flag would
    need an all-reduce, and the decode pipeline is otherwise
    collective-free by design.

    Device-side transfer compression: 16-bit audio (the overwhelmingly
    common case) fits every decoded sample in int16, so the PCM crosses the
    host link at half width -- word w holds sample 2t in its low half and
    sample 2t+1 in its high half, which a little-endian host reinterprets
    as int16 pairs with a zero-copy ``.view``. The flag reports whether any
    sample exceeded int16 (possible only for invalid streams, whose
    garbage-not-crash contract the int32 refetch path preserves).
    """
    lo = out[:, 0::2] & jnp.int32(0xFFFF)
    hi = out[:, 1::2] << 16
    oob = (out > 32767) | (out < -32768)
    overflow = jnp.any(oob, axis=1) if per_lane else jnp.any(oob)
    return hi | lo, overflow.astype(jnp.int32)


def unpack_int16_pairs(w):
    """Inverse of the host-side int16 pair packing for *input* residuals:
    (L, T//2) int32 -> (L, T) int32 with sign extension."""
    L = w.shape[0]
    lo = (w << 16) >> 16
    hi = w >> 16
    return jnp.stack([lo, hi], axis=-1).reshape(L, -1)
