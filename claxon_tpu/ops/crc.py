"""Batched CRC-16 on device.

The production pipeline verifies CRC-8/CRC-16 on the host while the C++
demux core is already touching every byte (bulk table-driven, reference
semantics claxon `src/crc.rs:33-57`). This kernel provides the same
check as a device op for flows where the raw frame bytes are shipped to
the TPU and the host never sees them: one lane per frame, a `lax.scan`
over byte columns, the 256-entry table resident on device.

CRC-16 composes linearly over GF(2); `claxon_tpu.crc.crc16_combine_matrices`
provides the length-shift matrices for tree-combining segment CRCs when a
frame is split across lanes.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..crc import CRC16_TABLE

__all__ = ["crc16_device"]


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
