"""2048^2/32ch sampler probes WITHOUT trainer state (memory-lean).

  1. forward gather forms at M=655k, C=32, table 2048^2 rows:
     corner 4x(64B rows) [live] vs quad 1x(256B rows, 1.07GB bf16 table)
     vs quad split 2x(128B) — is re-enabling the quad table worth it at 32ch?
  2. outer-scatter (tile, block) sweep at the 2048 output shape
     (4.19M rows x 4C=128) — rows/touched-tile is ~4x sparser than at 1024^2.
  3. brick-march cost at 2048-config shapes (sanity: same as bench).

Run: nohup python -u -m scripts.bench_2048_sampler > /tmp/b2048s.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def force(x):
    return float(jnp.asarray(jax.tree.leaves(x)[0]).astype(jnp.float32).reshape(-1)[0])


def timeit(label, fn, *args, reps=8):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:58s}: {ms:9.2f} ms", flush=True)
    return ms


M, C, RES = 655360, 32, 2048
HW = RES * RES
rng = np.random.default_rng(0)

print("=== 1. forward gather forms (one plane) ===", flush=True)
plane = jnp.asarray(rng.normal(size=(HW, C)), jnp.bfloat16)
idx = jnp.asarray(rng.integers(int(0.3 * HW), int(0.65 * HW), M, dtype=np.int64)
                  .astype(np.int32))

def corner4(p, i):
    s = jnp.zeros((M, C), jnp.float32)
    for off in (0, 1, RES, RES + 1):
        s = s + jnp.take(p, i + off, axis=0).astype(jnp.float32)
    return s.sum()

# tables passed as ARGUMENTS: a closed-over 268MB+ constant exceeds the
# remote-compile relay's payload limit (HTTP 413)
timeit("corner: 4 takes of (M, 32ch bf16=64B)", jax.jit(corner4), plane, idx)

quad = jnp.concatenate([plane, plane, plane, plane], axis=1)  # stand-in (HW, 128)
f_quad = jax.jit(lambda q, i: jnp.take(q, i, axis=0).astype(jnp.float32).sum())
timeit("quad: 1 take of (M, 128ch bf16=256B) from 1.07GB", f_quad, quad, idx)

quad2 = quad.reshape(HW * 2, 2 * C)
def quadsplit(q2, i):
    a = jnp.take(q2, 2 * i, axis=0).astype(jnp.float32)
    b = jnp.take(q2, 2 * i + 1, axis=0).astype(jnp.float32)
    return (a.sum() + b.sum())
timeit("quad split: 2 takes of (M, 64ch bf16=128B)", jax.jit(quadsplit), quad2, idx)

# quad table BUILD cost (once per plane per step if tables are rebuilt)
from trinerflet_tpu.ops.grid_sample import _quad_pack
p3 = jnp.asarray(rng.normal(size=(RES, RES, C)), jnp.bfloat16)
fb = jax.jit(lambda p: _quad_pack(p).reshape(HW, 4 * C))
timeit("quad table build (H,W,C)->(HW,4C) bf16", fb, p3)

print("=== 2. outer scatter (tile, block) sweep, 2048 shape ===", flush=True)
from trinerflet_tpu.ops.scatter import blocked_scatter_add_outer
sidx = rng.integers(int(0.3 * HW), int(0.65 * HW), M).astype(np.int32)
sidx[rng.random(M) > 0.55] = HW
sidx = jnp.asarray(sidx)
w = jnp.asarray(rng.random((M, 4)).astype(np.float32))
g = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
for tile, block in ((2048, 2048), (2048, 1024), (1024, 1024), (1024, 512),
                    (512, 512), (4096, 2048), (2048, 512)):
    fo = jax.jit(lambda i, wl, gl, t=tile, b=block: blocked_scatter_add_outer(
        i, wl, gl, HW, tile=t, block=b, precision="default"))
    timeit(f"outer w4 x g32 tile={tile} block={block}", fo, sidx, w, g)
