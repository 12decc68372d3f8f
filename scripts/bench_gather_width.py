"""Probe: are big row-gathers latency-bound (per-row) or bandwidth-bound?

PERF.md pins jnp.take at ~15 ns/row for 64 B rows (4 GB/s). If that's a
per-row latency floor, bf16 sample tables win nothing; if it's bandwidth,
halving the row width halves the gather time (the triplane fwd is ~3 such
gathers/step). Sweep row widths at fixed row count and fixed total bytes.

Run: nohup python -u -m scripts.bench_gather_width > /tmp/bgwidth.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N, R = 655360, 1024 * 1024
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, R, N), jnp.int32)


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32).reshape(-1)[:1]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32).reshape(-1)[:1]))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s}: {dt * 1e3:8.2f} ms  {N / dt / 1e6:8.1f} Mrows/s",
          flush=True)


take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))

for cols, dt_ in [(4, jnp.float32), (8, jnp.float32), (16, jnp.float32),
                  (32, jnp.float32), (64, jnp.float32),
                  (16, jnp.bfloat16), (32, jnp.bfloat16), (64, jnp.bfloat16)]:
    table = jnp.asarray(rng.standard_normal((R, cols)), dt_)
    nb = cols * (2 if dt_ == jnp.bfloat16 else 4)
    timeit(f"take {cols:3d}x{dt_.__name__:9s} ({nb:3d} B/row)", take, table, idx)

# fewer, wider rows at constant total bytes (is it row count or bytes?)
for n_rows, cols in [(N, 16), (N // 2, 32), (N // 4, 64)]:
    table = jnp.asarray(rng.standard_normal((R, cols)), jnp.float32)
    sub = idx[:n_rows]
    out = take(table, sub)
    float(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(20):
        out = take(table, sub)
    float(out[0, 0])
    dt = (time.perf_counter() - t0) / 20
    print(f"const-bytes {n_rows:7d} rows x {cols:3d} f32: {dt * 1e3:8.2f} ms",
          flush=True)
