#!/usr/bin/env python
"""Microbenchmark: slab-gather styles for the on-device demux walk.

The round-3 walk (`ops/demux.py`) issued 3 whole-stream element gathers
per Rice code inside a T-step scan; the round-4 restructure fetches one
contiguous per-lane slab per 32-code chunk instead. This tool measures,
on the real chip, the gather mechanisms available for that slab fetch:

  A  scan(NC) steps, elementwise jnp.take of an (RW, F) index grid
  B  scan(NC) steps, vmap(dynamic_slice) -> gather with slice_sizes=(RW,)
  C  the round-3 shape: scan(T) steps, 3 elementwise takes of (F,)
  D  one up-front elementwise take of (RW, NC, F) (entropy-kernel style)

Timing closes with a dependent fetch (CLAUDE.md: block_until_ready acks
early on this backend).
"""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(__import__("pathlib").Path(__file__).resolve()
                      .parent.parent / ".bench_cache" / "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

W = 2_500_000   # ~10 MB stream, bench-corpus scale
F = 2048        # candidate lanes
NC = 128        # chunks per lane (T = 4096)
RW = 68         # slab words per chunk
T = NC * 32

rng = np.random.default_rng(0)
stream_np = rng.integers(-2**31, 2**31, W, dtype=np.int64).astype(np.int32)
word0_np = rng.integers(0, W - 3 * RW, F).astype(np.int32)


def timed(fn, *args, reps=10):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[:1]  # warm-up
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[:1]
    return (time.perf_counter() - t0) / reps


def main():
    stream = jnp.asarray(stream_np)
    word0 = jnp.asarray(word0_np)

    @jax.jit
    def scan_take(w0):
        def step(w, _):
            idx = w[None, :] + jnp.arange(RW, dtype=jnp.int32)[:, None]
            slab = jnp.take(stream, jnp.clip(idx, 0, W - 1), axis=0)
            acc = slab.sum(axis=0)
            return w + (acc & 15) + 8, acc
        _, ys = jax.lax.scan(step, w0, jnp.arange(NC, dtype=jnp.int32))
        return ys.sum()

    @jax.jit
    def scan_slice(w0):
        def step(w, _):
            slab = jax.vmap(
                lambda i: jax.lax.dynamic_slice(stream, (i,), (RW,)))(
                    jnp.clip(w, 0, W - RW))
            acc = slab.sum(axis=1)
            return w + (acc & 15) + 8, acc
        _, ys = jax.lax.scan(step, w0, jnp.arange(NC, dtype=jnp.int32))
        return ys.sum()

    @jax.jit
    def scan_r3(c0):
        def step(cur, _):
            wi = jnp.clip(cur >> 5, 0, W - 1)
            w0 = jnp.take(stream, wi)
            w1 = jnp.take(stream, jnp.minimum(wi + 1, W - 1))
            w2 = jnp.take(stream, jnp.minimum(wi + 2, W - 1))
            acc = w0 ^ w1 ^ w2
            return cur + (acc & 31) + 1, acc
        _, ys = jax.lax.scan(step, c0, jnp.arange(T, dtype=jnp.int32))
        return ys.sum()

    @jax.jit
    def big_take(w0):
        idx = (w0[None, None, :]
               + (jnp.arange(NC, dtype=jnp.int32) * 40)[None, :, None]
               + jnp.arange(RW, dtype=jnp.int32)[:, None, None])
        slab = jnp.take(stream, jnp.clip(idx, 0, W - 1), axis=0)
        return slab.sum()

    @jax.jit
    def big_slice(w0):
        idx = jnp.clip(w0[None, :]
                       + (jnp.arange(NC, dtype=jnp.int32) * 40)[:, None],
                       0, W - RW)
        return jax.vmap(jax.vmap(
            lambda i: jax.lax.dynamic_slice(stream, (i,), (RW,))))(
                idx).sum()

    def make_rowtake(G):
        WB = W // G
        sb = jnp.reshape(stream[:WB * G], (WB, G))
        nrows = RW // G + 2

        @jax.jit
        def row_take(w0):
            # (F, NC) chunk starts -> block-row indices; each index moves
            # G contiguous words.
            base = (w0[None, :]
                    + (jnp.arange(NC, dtype=jnp.int32) * 40)[:, None]) // G
            idx = jnp.clip(base[None, :, :]
                           + jnp.arange(nrows, dtype=jnp.int32)[:, None,
                                                                None],
                           0, WB - 1)
            return jnp.take(sb, idx, axis=0).sum()

        return row_take, NC * nrows * F * G

    row8, vol8 = make_rowtake(8)
    row16, vol16 = make_rowtake(16)
    row32, vol32 = make_rowtake(32)

    variants = {
        "G8": ("G row-take 8  ", row8, word0, vol8),
        "G16": ("G row-take 16 ", row16, word0, vol16),
        "G32": ("G row-take 32 ", row32, word0, vol32),
        "D": ("D big take    ", big_take, word0, NC * RW * F),
        "E": ("E big dslice  ", big_slice, word0, NC * RW * F),
        "B": ("B scan+dslice ", scan_slice, word0, NC * RW * F),
        "A": ("A scan+take   ", scan_take, word0, NC * RW * F),
        "C": ("C r3 per-code ", scan_r3, word0 * 32, T * 3 * F),
    }
    print("platform:", jax.devices()[0].platform, file=sys.stderr)
    for key in (sys.argv[1:] or list(variants)):
        name, fn, arg, vol = variants[key]
        t0 = time.perf_counter()
        dt = timed(fn, arg)
        print(f"{name} {dt*1e3:8.2f} ms   "
              f"{vol/dt/1e6:9.1f} Melem/s   ({vol/1e6:.1f}M elems)   "
              f"[compile+total {time.perf_counter()-t0:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
