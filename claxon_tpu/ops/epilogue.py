"""Per-frame epilogue: wasted-bits shift + stereo decorrelation.

Pure elementwise device ops, fused by XLA into the synthesis program.
Semantics mirror the reference exactly:

* wasted bits: wrapping left shift (`src/subframe.rs:216-225`);
* left/side:  right = left - side (wrapping, `src/frame.rs:318-334`);
* right/side: left = side + right (wrapping, `src/frame.rs:344-360`);
* mid/side:   mid' = mid*2 | (side & 1); left = (mid'+side)>>1;
              right = (mid'-side)>>1 (`src/frame.rs:370-389`; the sums are
              always even so the truncating division is an arithmetic shift).

Channel-assignment codes: 0 independent, 1 left/side, 2 right/side,
3 mid/side.
"""

import jax
import jax.numpy as jnp

__all__ = ["apply_epilogue", "MODE_INDEPENDENT", "MODE_LEFT_SIDE",
           "MODE_RIGHT_SIDE", "MODE_MID_SIDE"]

MODE_INDEPENDENT = 0
MODE_LEFT_SIDE = 1
MODE_RIGHT_SIDE = 2
MODE_MID_SIDE = 3


@jax.jit
def apply_epilogue(samples, wasted, ch0_idx, ch1_idx, modes):
    """Undo wasted-bits shifts, then stereo decorrelation.

    Args:
      samples: (L, T) int32 synthesized subframe outputs.
      wasted:  (L,) int32 wasted bits per lane (applied to every lane).
      ch0_idx: (P,) int32 lane index of each stereo pair's first channel.
      ch1_idx: (P,) int32 lane index of each pair's second channel.
      modes:   (P,) int32 channel-assignment code per pair.

    Returns:
      (L, T) int32 with wasted-bits applied everywhere and the paired lanes
      decorrelated in place (independent lanes pass through).
    """
    samples = samples << wasted[:, None]

    c0 = samples[ch0_idx]
    c1 = samples[ch1_idx]
    m = modes[:, None]

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

    samples = samples.at[ch0_idx].set(out0)
    samples = samples.at[ch1_idx].set(out1)
    return samples
