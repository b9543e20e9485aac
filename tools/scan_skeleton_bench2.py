#!/usr/bin/env python
"""Which part of the per-step slab fetch costs 400us/step?

Variants (all: scan of NC=128 steps, F lanes, dependent cursor):
  static    no gather at all -- dynamic_slice of a shared window (floor)
  take_flat elementwise take of (R, F) word indices from the flat stream
  rows_in   current production shape: pad+reshape+row-take+transpose
            INSIDE the step
  rows_pre  pad+reshape hoisted OUT of the scan; row-take+transpose in
  rows_T    stream pre-transposed to (G, W/G) once; row-take gives
            (G, nr, F) with F minor -- NO per-step transpose
"""

import pathlib
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parent.parent
                      / ".bench_cache" / "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

W = 2_228_224
F = 1024
NC = 128
R = 42
G = 8
NR = -(-(R + G - 1) // G)  # row-gather rows

rng = np.random.default_rng(0)
stream_np = rng.integers(-2**31, 2**31, W, dtype=np.int64).astype(np.int32)
pos0_np = rng.integers(0, (W - 200 * NC) * 32, F).astype(np.int32)
WB = -(-W // G)


@partial(jax.jit, static_argnames=("variant",))
def scan_variant(stream, pos0, variant):
    if variant in ("rows_pre", "rows_T"):
        padded = jnp.pad(stream, (0, (WB + NR) * G - W))
        sb = padded.reshape(-1, G)
        sbT = sb.T if variant == "rows_T" else None
    ar_nr = jnp.arange(NR, dtype=jnp.int32)[:, None]
    ar_r = jnp.arange(R, dtype=jnp.int32)[:, None]

    def step(cur, c):
        w0 = cur >> 5
        if variant == "static":
            s = jax.lax.dynamic_slice(stream, (jnp.min(w0),), (R,))
            acc = s.sum() + jnp.zeros_like(cur)
        elif variant == "take_flat":
            idx = jnp.clip(w0[None, :] + ar_r, 0, W - 1)
            slab = jnp.take(stream, idx, axis=0)
            acc = slab[0] + slab[R - 1]
        elif variant == "rows_in":
            padded = jnp.pad(stream, (0, (WB + NR) * G - W))
            sb2 = padded.reshape(-1, G)
            block = jnp.clip(w0 >> 3, 0, WB)
            idx = block[None, :] + ar_nr
            rows = jnp.take(sb2, idx, axis=0)
            slab = rows.transpose(0, 2, 1).reshape(NR * G, -1)
            acc = slab[0] + slab[R - 1]
        elif variant == "rows_pre":
            block = jnp.clip(w0 >> 3, 0, WB)
            idx = block[None, :] + ar_nr
            rows = jnp.take(sb, idx, axis=0)
            slab = rows.transpose(0, 2, 1).reshape(NR * G, -1)
            acc = slab[0] + slab[R - 1]
        else:  # rows_T
            block = jnp.clip(w0 >> 3, 0, WB)
            idx = block[None, :] + ar_nr
            rows = jnp.take(sbT, idx, axis=1)  # (G, NR, F)
            acc = rows[0, 0] + rows[(R - 1) % G, (R - 1) // G]
        cur = cur + (acc & 15) + 17
        return cur, cur[:1]

    end, ys = jax.lax.scan(step, pos0, jnp.arange(NC, dtype=jnp.int32))
    return end


def timed(fn, seconds=4.0, max_reps=40):
    out = fn()
    np.asarray(out.ravel()[:1])
    reps, t0 = 0, time.perf_counter()
    while (time.perf_counter() - t0 < seconds and reps < max_reps) \
            or reps < 3:
        out = fn()
        reps += 1
    np.asarray(out.ravel()[:1])
    return (time.perf_counter() - t0) / reps


def main():
    stream = jax.block_until_ready(jnp.asarray(stream_np))
    pos0 = jnp.asarray(pos0_np)
    for v in ("static", "take_flat", "rows_pre", "rows_T", "rows_in"):
        dt = timed(lambda vv=v: scan_variant(stream, pos0, vv))
        print(f"{v:10s} {dt*1e3:8.2f} ms ({dt/NC*1e6:6.1f} us/step)",
              flush=True)


if __name__ == "__main__":
    main()
