"""Batched TPU device kernels for the numeric reconstruction.

The decode problem splits into a bit-serial demux (host, C++) and a regular,
batchable numeric reconstruction (device): prediction synthesis, wasted-bits
shifts, stereo decorrelation. These kernels process a *batch* of subframes
-- one (frame, channel) per lane -- per XLA dispatch, which is what hides
the FLAC format's serial structure from the chip (SURVEY.md section 7).

* ``i64``: exact 64-bit integer arithmetic emulated on 32-bit lanes (TPU
  has no native int64); the limb-split dot product is the core trick that
  makes bit-exact LPC synthesis vectorize.
* ``predict``: the unified synthesis kernel. CONSTANT/VERBATIM are order-0,
  FIXED is the Pascal-coefficient recurrence with shift 0, LPC is the
  general order<=32 recurrence -- one kernel, exact for all of them.
* ``epilogue``: wasted-bits shift + stereo decorrelation (pure elementwise)
  plus the int16-pair transfer packing.
* ``pallas_synth``: the hand-scheduled Pallas variant of the synthesis
  kernel (default on TPU via ``predict.synthesize_best``).
* ``crc``: batched CRC-16 for flows where raw frame bytes live on device.
* ``rice``: batched Rice entropy decoding over a shared packed bit buffer
  (the building block for fully in-kernel residual decoding).
"""

from . import i64
from .predict import synthesize, synthesize_best, synthesize_reference
from .epilogue import apply_epilogue
from .crc import crc16_device
from .rice import rice_decode

__all__ = ["i64", "synthesize", "synthesize_best", "synthesize_reference",
           "apply_epilogue", "crc16_device", "rice_decode"]
