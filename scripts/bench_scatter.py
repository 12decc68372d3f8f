"""TPU microbench: XLA scatter-add vs blocked one-hot-matmul scatter
(ops/scatter.py) at the round-1 bench scale (655k quad rows, D=64, 1024^2
plane). Run: nohup python -u -m scripts.bench_scatter > /tmp/bscatter.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from trinerflet_tpu.ops.scatter import blocked_scatter_add, xla_scatter_add

N = 655_360
D = 64
ROWS = 1024 * 1024

rng = np.random.default_rng(0)
# ray-structured indices: clustered runs like real marching samples
base = rng.integers(0, ROWS - 2048, N // 32)
idx = (base[:, None] + rng.integers(0, 2048, (N // 32, 32))).reshape(-1).astype(np.int32)
idx = jnp.asarray(np.clip(idx, 0, ROWS - 1))
pay = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))


def timeit(fn, *args, reps=8):
    out = fn(*args)
    _ = float(out.reshape(-1)[0])  # force
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(out.reshape(-1)[0])
    return (time.perf_counter() - t0) / reps * 1e3, out


ms_x, out_x = timeit(jax.jit(lambda i, p: xla_scatter_add(i, p, ROWS)), idx, pay)
print(f"xla scatter      : {ms_x:8.2f} ms", flush=True)

for tile, block in [(2048, 512), (2048, 1024), (4096, 1024), (8192, 1024), (4096, 2048), (8192, 2048)]:
    f = jax.jit(lambda i, p, t=tile, b=block: blocked_scatter_add(i, p, ROWS, tile=t, block=b))
    ms, out_b = timeit(f, idx, pay)
    err = float(jnp.abs(out_b - out_x).max())
    print(f"blocked t={tile:5d} b={block:3d}: {ms:8.2f} ms  (max err {err:.2e}, "
          f"speedup {ms_x / ms:.2f}x)", flush=True)
