#!/usr/bin/env python
"""Isolate the demux walk's fixed per-scan-step cost on the real chip.

The walk profile shows t = a + b*F with a ~ 77 ms independent of lane
count -- this tool times stripped-down variants of the chunk scan to
find which structural piece (the scan itself, the slab row-gather, the
window init, the 32-code unrolled body) owns that fixed cost.
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

rng = np.random.default_rng(0)
stream_np = rng.integers(-2**31, 2**31, W, dtype=np.int64).astype(np.int32)
pos0_np = rng.integers(0, (W - 200 * NC) * 32, F).astype(np.int32)


def _slab(stream, word0, n):
    nr = -(-(n + G - 1) // G)
    wb0 = -(-W // G)
    padded = jnp.pad(stream, (0, (wb0 + nr) * G - W))
    sb = padded.reshape(-1, G)
    block = jnp.clip(word0 >> 3, 0, wb0)
    idx = block[None, :] + jnp.arange(nr, dtype=jnp.int32)[:, None]
    rows = jnp.take(sb, idx, axis=0)
    slab = rows.transpose(0, 2, 1).reshape(nr * G, -1)
    return slab, block << 3


@partial(jax.jit, static_argnames=("body",))
def scan_variant(stream, pos0, body):
    def step(cur, c):
        slab, sbw = _slab(stream, cur >> 5, R)
        if body == "none":
            cur = cur + slab[0] % 7 + 25  # consume slab, no unroll
        elif body in ("unroll", "unroll_nosel"):
            rel = cur - (sbw << 5)
            wi = rel >> 5
            off = rel & 31
            rows = jnp.arange(0, 8, dtype=jnp.int32)
            m = wi[None, :] == rows[:, None]
            w0 = jnp.where(m, slab[0:8], 0).sum(0)
            m = (wi + 1)[None, :] == rows[:, None]
            w1 = jnp.where(m, slab[0:8], 0).sum(0)
            for j in range(32):
                hi = jnp.int32(
                    (w0.astype(jnp.uint32) << off.astype(jnp.uint32)))
                z = jnp.clip(hi & 31, 0, 31)
                adv = z % 13 + 1
                off2 = off + adv
                d = off2 >> 5
                off = off2 & 31
                if body == "unroll":
                    lo2, hi2 = 2, 10 + j
                    rr = jnp.arange(lo2, hi2, dtype=jnp.int32)
                    mm = (wi + 2)[None, :] == rr[:, None]
                    nxt = jnp.where(mm, slab[lo2:hi2], 0).sum(0)
                else:
                    nxt = slab[(2 + j) % R]  # static row: no one-hot
                w0 = jnp.where(d != 0, w1, w0)
                w1 = jnp.where(d != 0, nxt, w1)
                wi = wi + d
                cur = cur + adv
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
    for body in ("none", "unroll_nosel", "unroll"):
        dt = timed(lambda b=body: scan_variant(stream, pos0, b))
        print(f"{body:14s} {dt*1e3:8.2f} ms  (x2 ch = "
              f"{2*dt*1e3:6.1f})", flush=True)


if __name__ == "__main__":
    main()
