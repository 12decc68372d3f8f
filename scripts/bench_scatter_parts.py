"""Decompose blocked_scatter_add_outer at the live driver shape and probe
two candidate improvements, with a REALISTIC index model (clustered
footprint, 45% dead rows):

  a. lax.sort (idx, iota) alone
  b. + packed [w|g] bf16 take
  c. full outer scatter (tile/block sweep)
  d. 3-plane COMBINED call (one sort of 3N rows with plane-offset indices,
     one block loop over a (3*H*W)-row output) vs 3 separate calls
  e. same-row gather trick: take of 655k rows all hitting ONE row vs random
     (is the serialized gather row-cache-friendly? decides whether routing
     dead fwd slots to texel 0 is worth anything)

Run: nohup python -u -m scripts.bench_scatter_parts > /tmp/bscat.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N, C, K = 655360, 16, 4
HW = 1024 * 1024
rng = np.random.default_rng(0)


def force(x):
    return float(jnp.asarray(jax.tree.leaves(x)[0]).astype(jnp.float32).reshape(-1)[0])


def timeit(label, fn, *args, reps=10):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:58s}: {ms:9.2f} ms", flush=True)
    return ms


def mkidx(seed):
    r = np.random.default_rng(seed)
    idx = r.integers(int(0.3 * HW), int(0.65 * HW), N).astype(np.int32)
    idx[r.random(N) > 0.55] = HW  # dead rows -> sentinel
    return jnp.asarray(idx)


idx = mkidx(1)
w = jnp.asarray(rng.random((N, K)).astype(np.float32))
g = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))

iota = jnp.arange(N, dtype=jnp.int32)
sort_fn = jax.jit(lambda i: jax.lax.sort((i, iota), num_keys=1))
timeit("a. lax.sort (idx, iota) 655k", sort_fn, idx)

packed = jnp.concatenate([w.astype(jnp.bfloat16), g.astype(jnp.bfloat16)], axis=1)
st_fn = jax.jit(lambda i, p: jnp.take(p, jax.lax.sort((i, iota), num_keys=1)[1], axis=0))
timeit("b. sort + packed (N,20) bf16 take", st_fn, idx, packed)

from trinerflet_tpu.ops.scatter import blocked_scatter_add_outer

for tile, block in ((2048, 2048), (2048, 1024), (4096, 2048), (1024, 1024),
                    (2048, 4096), (4096, 4096)):
    fn = jax.jit(lambda i, wl, gl, t=tile, b=block: blocked_scatter_add_outer(
        i, wl, gl, HW, tile=t, block=b, precision="default"))
    timeit(f"c. outer full tile={tile} block={block}", fn, idx, w, g)

# d. combined 3-plane call
idx3 = jnp.concatenate([mkidx(2) + 0, mkidx(3) + HW, mkidx(4) + 2 * HW])
idx3 = jnp.where(idx3 >= 3 * HW, 3 * HW, idx3)  # re-route per-plane sentinels
w3 = jnp.concatenate([w, w, w])
g3 = jnp.concatenate([g, g, g])
f3 = jax.jit(lambda i, wl, gl: blocked_scatter_add_outer(
    i, wl, gl, 3 * HW, tile=2048, block=2048, precision="default"))
timeit("d. combined 3-plane (1.97M rows, 3M-row out)", f3, idx3, w3, g3)

f1 = jax.jit(lambda i, wl, gl: blocked_scatter_add_outer(
    i, wl, gl, HW, tile=2048, block=2048, precision="default"))


def three(i3, wl, gl):
    return (f1(i3[:N] , wl, gl), f1(jnp.minimum(i3[N:2*N] - HW, HW), wl, gl),
            f1(jnp.minimum(i3[2*N:] - 2*HW, HW), wl, gl))


timeit("d'. three separate calls", jax.jit(three), idx3, w3[:N], g3[:N])

# e. gather locality probe
table = jnp.asarray(rng.normal(size=(HW, 32)).astype(np.bfloat16))
ridx = jnp.asarray(rng.integers(0, HW, N, dtype=np.int32))
zidx = jnp.zeros((N,), jnp.int32)
cidx = jnp.asarray(rng.integers(int(0.49 * HW), int(0.51 * HW), N, dtype=np.int32))
gfn = jax.jit(lambda i: jnp.take(table, i, axis=0).sum())
timeit("e. take 655k x 64B rows, uniform-random idx", gfn, ridx)
timeit("e. take 655k x 64B rows, ALL same row", gfn, zidx)
timeit("e. take 655k x 64B rows, 2%-window clustered", gfn, cidx)
