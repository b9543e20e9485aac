"""Time the two synthesis backends (XLA ``lax.scan`` vs the Pallas
kernel) on the bench bucket shapes, on whatever device is default.

Settles which backend ``synthesize_best`` should pick on TPU with a
committed measurement instead of a docstring claim. Timing methodology
per docs/performance.md: back-to-back dispatch of all reps, closed by
ONE tiny dependent fetch (block_until_ready acks early on the tunneled
backend, so it cannot be trusted as a barrier).

Usage: python tools/synth_backend_bench.py [seconds_per_cell]
Prints one table row per (L, T) bucket shape plus a JSON summary line.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


#: (L, T) shapes the corpus decode actually dispatches (bench.py buckets:
#: lane counts quantized to 128, T buckets 4096/1024; plus a small shape
#: where per-step overhead dominates).
SHAPES = [(128, 1024), (128, 4096), (512, 4096), (1024, 4096)]


def _bucket(L, T, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(-(1 << 14), 1 << 14, (L, T)).astype(np.int32)
    orders = rng.integers(1, 13, L).astype(np.int32)
    shifts = rng.integers(1, 15, L).astype(np.int32)
    coefs = np.zeros((L, 32), dtype=np.int32)
    for l in range(L):
        o = int(orders[l])
        coefs[l, 32 - o:] = rng.integers(-(1 << 14), 1 << 14, o)
    lengths = np.full(L, T, dtype=np.int32)
    return x, coefs, shifts, orders, lengths


def _time(fn, args, seconds, max_reps=200):
    import jax

    out = jax.block_until_ready(fn(*args))  # compile warm-up
    np.asarray(out[:1, :1])                 # ... and force completion
    reps = 0
    t0 = time.perf_counter()
    while (time.perf_counter() - t0 < seconds and reps < max_reps) \
            or reps < 3:
        out = fn(*args)
        reps += 1
    np.asarray(out[:1, :1])                 # dependent-fetch barrier
    return (time.perf_counter() - t0) / reps


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parent.parent / ".bench_cache"
            / "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from claxon_tpu.ops.predict import synthesize
    platform = jax.devices()[0].platform
    backends = {"xla": jax.jit(synthesize)}
    if platform == "tpu":
        from claxon_tpu.ops.pallas_synth import synthesize_pallas
        backends["pallas"] = jax.jit(synthesize_pallas)

    rows = {}
    for L, T in SHAPES:
        args = tuple(jnp.asarray(a) for a in _bucket(L, T))
        cell = {}
        for name, fn in backends.items():
            dt = _time(fn, args, seconds)
            cell[name] = dt
            print(f"L={L:5d} T={T:5d} {name:6s} {dt * 1e3:8.3f} ms "
                  f"{L * T / dt / 1e6:8.1f} Msamples/s", flush=True)
        if len(cell) == 2:
            print(f"L={L:5d} T={T:5d} pallas/xla speedup: "
                  f"{cell['xla'] / cell['pallas']:.2f}x", flush=True)
        rows[f"{L}x{T}"] = {k: round(v * 1e6, 1) for k, v in cell.items()}
    print(json.dumps({"platform": platform, "us_per_call": rows}))


if __name__ == "__main__":
    main()
