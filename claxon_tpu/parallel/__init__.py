"""Multi-chip scaling for the batched decode pipeline.

The reference is a single-threaded streaming library (SURVEY.md section 2:
every distributed strategy is ABSENT there); the format itself, however, is
embarrassingly parallel across frames -- each frame carries its own header,
CRC and warm-up samples (reference `src/frame.rs:667-779`). This module
exploits that as pure data parallelism over a 1-D ``jax.sharding.Mesh``:

* the lane axis of a decode bucket (one (frame, channel) subframe per lane)
  is sharded across chips with ``NamedSharding``;
* the synthesis scan and the epilogue are elementwise per lane, and the
  epilogue's stereo pairs are pair-aligned within a shard (lane quantum 128,
  shards keep even lane counts), so XLA inserts **zero collectives** -- the
  program scales linearly over ICI with no communication.

``make_decode_step`` builds the jitted whole-step program with explicit
in/out shardings; ``decode_batch_sharded`` is the host-side driver mirroring
``claxon_tpu.pipeline.decode_batch``.
"""

from .mesh import (make_mesh, make_decode_step, decode_batch_sharded,
                   decode_streams_sharded, lane_quantum, LANE_AXIS)

__all__ = ["make_mesh", "make_decode_step", "decode_batch_sharded",
           "decode_streams_sharded", "lane_quantum", "LANE_AXIS"]
