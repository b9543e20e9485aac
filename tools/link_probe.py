#!/usr/bin/env python
"""Characterize the host<->device link (reproducible evidence for the
numbers quoted in docs/performance.md).

Findings on the tunneled 'axon' TPU backend (2026-08-16):

* ``jax.block_until_ready`` acknowledges transfers EARLY on this backend:
  a device_put timed with it appears to run at GB/s, but a subsequent
  dependent fetch drains for the real transfer time. Every rate below is
  therefore measured with a dependent-fetch barrier (a tiny jitted
  reduction of the transferred buffer, fetched to host) -- the only
  completion proof this transport honors.
* Sustained host-to-device: ~25-75 MB/s (phase-dependent), NOT the GB/s
  that naive block_until_ready timing suggests.
* Device-to-host: ~25 MB/s via many concurrent chunked fetches; a single
  large fetch is latency/window-limited far below that.
* Consequence: any decode path that ships data per batch is link-bound at
  ~(sustained MB/s) / (bytes per sample). The bits pipeline's stream mode
  uploads ~1.4 B/sample (the compressed stream is ~1.36 B/sample -- the
  floor), so the tunnel caps decode-to-device around 20-50 Msamples/s on
  this rig regardless of kernel speed.
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"platform: {dev.platform} ({dev.device_kind})")

    tiny_sum = jax.jit(lambda x: x.ravel()[::65536].sum())

    def h2d_rate(mb, reps=3):
        """device_put closed by a dependent reduction fetch."""
        a = np.random.default_rng(0).integers(
            -2**31, 2**31, mb * 262144, dtype=np.int64).astype(np.int32)
        d = jax.device_put(a)
        _ = np.asarray(tiny_sum(d))  # warm compile + first-fetch state
        t0 = time.perf_counter()
        for _ in range(reps):
            d = jax.device_put(a)
            _ = np.asarray(tiny_sum(d))
        dt = (time.perf_counter() - t0) / reps
        return mb / dt

    def h2d_rate_naive(mb, reps=3):
        """The misleading block_until_ready timing, for contrast."""
        a = np.random.default_rng(1).integers(
            -2**31, 2**31, mb * 262144, dtype=np.int64).astype(np.int32)
        d = jax.device_put(a)
        jax.block_until_ready(d)
        t0 = time.perf_counter()
        for _ in range(reps):
            d = jax.device_put(a)
            jax.block_until_ready(d)
        return mb / ((time.perf_counter() - t0) / reps)

    naive = h2d_rate_naive(16)
    print(f"h2d 16MB, block_until_ready barrier: {naive:7.0f} MB/s "
          "(NOT trustworthy on early-ack transports)")
    for mb in (4, 16, 32):
        print(f"h2d {mb:3d}MB, dependent-fetch barrier: "
              f"{h2d_rate(mb):7.0f} MB/s")

    # d2h: one big fetch vs concurrent chunks.
    d = jax.device_put(np.zeros(4 * 262144, dtype=np.int32))
    _ = np.asarray(tiny_sum(d))
    t0 = time.perf_counter()
    _ = np.asarray(d)
    print(f"d2h 16MB single fetch: {16 / (time.perf_counter() - t0):7.1f} "
          "MB/s")
    chunks = [d[i * 32768:(i + 1) * 32768] for i in range(32)]
    for c in chunks:
        c.copy_to_host_async()
    t0 = time.perf_counter()
    _ = [np.asarray(c) for c in chunks]
    print(f"d2h 4MB x32 concurrent: "
          f"{16 / (time.perf_counter() - t0):7.1f} MB/s")


if __name__ == "__main__":
    main()
