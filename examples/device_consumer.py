#!/usr/bin/env python
"""Feed decoded FLAC straight into a TPU consumer -- no host round trip.

The framework's native production story: ``decode_streams_device`` leaves
PCM in HBM as fixed-shape (lanes, time) buckets, and a downstream JAX
program (here: per-channel loudness + a crude spectral-flatness proxy, the
stand-in for a feature extractor or training input pipeline) consumes them
on-device. The only bytes that ever cross the host link are the compressed
FLAC input and the tiny per-stream statistics.

Usage: python examples/device_consumer.py FILE [FILE ...]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def analyze_buckets(dev):
    """Per-lane RMS level and zero-crossing rate, computed on device."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def stats(bucket):
        x = bucket.astype(jnp.float32)
        rms = jnp.sqrt(jnp.mean(x * x, axis=1))
        zc = jnp.mean((x[:, 1:] * x[:, :-1]) < 0, axis=1)
        return rms, zc

    out = []
    for frame_idx, n_ch, bucket in dev.device_buckets():
        rms, zc = stats(bucket)  # stays on device until the tiny fetch
        out.append((frame_idx, n_ch, np.asarray(rms), np.asarray(zc)))
    return out


def main(argv):
    if not argv:
        print(__doc__)
        return 1
    from claxon_tpu.pipeline import decode_streams_device

    datas = [pathlib.Path(f).read_bytes() for f in argv]
    dev = decode_streams_device(datas)
    # Device-resident consumers never fetch PCM, so they must surface the
    # on-device frame CRC-16 verdict themselves before trusting buckets.
    dev.verify_crc()
    results = analyze_buckets(dev)
    for fname, d in zip(argv, dev.results):
        print(f"{fname}: {d.pcm.shape[0]} samples x "
              f"{d.streaminfo.channels} ch decoded into HBM")
    for frame_idx, n_ch, rms, zc in results:
        lanes = int(np.count_nonzero(rms))
        mean_rms = rms[rms > 0].mean() if lanes else 0.0
        mean_zcr = zc[rms > 0].mean() if lanes else 0.0
        print(f"  bucket: {len(rms)} lanes ({lanes} active)  "
              f"mean RMS {mean_rms:8.1f}  mean ZCR {mean_zcr:6.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
