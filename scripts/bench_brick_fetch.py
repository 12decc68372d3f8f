"""Probe: the brick-fetch coarse-march pattern's gather rate.

The coarse occupancy phase costs 8.8 ns x NC gathers/ray of single BOOLS
from a ~4 MB grid. A brick redesign fetches (16 x uint32) = 64 B rows of
packed 8^3-cell occupancy from a ~0.5 MB table, needing ~1.8x fewer rows
(h = 1.78 seg). Probe whether 64 B-row takes from a SMALL table run at the
single-bool rate (~8 ns, win) or the big-table rate (28 ns, dead end), plus
the per-probe word-select/bit-extract vector cost.

Run: nohup python -u -m scripts.bench_brick_fetch > /tmp/bbrick.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


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


N_RAYS = 32768
rng = np.random.default_rng(0)

# current pattern: (N, 112) single-bool takes from (2*128^3,) grid
grid = jnp.asarray(rng.random(2 * 128**3) < 0.3)
idx_flat = jnp.asarray(rng.integers(0, 2 * 128**3, (N_RAYS, 112), dtype=np.int64)
                       .astype(np.int32))
f_bool = jax.jit(lambda i: jnp.take(grid, i.reshape(-1)).reshape(i.shape).sum())
timeit("bool takes (N,112) from 4MB grid [current phase A]", f_bool, idx_flat)

# brick pattern: (N, nf) 64B-row takes from (2*16^3, 16) uint32
for nf in (63, 46):
    bricks = jnp.asarray(
        rng.integers(0, 2**32, (2 * 16**3, 16), dtype=np.uint64).astype(np.uint32))
    bidx = jnp.asarray(rng.integers(0, 2 * 16**3, (N_RAYS, nf), dtype=np.int64)
                       .astype(np.int32))
    f_brick = jax.jit(lambda i, b=bricks: jnp.take(b, i.reshape(-1), axis=0).sum())
    timeit(f"brick takes (N,{nf}) 64B rows from 0.5MB table", f_brick, bidx)

# full extraction chain at nf=63: fetch + 16-way word one-hot + shift + map
nf = 63
bricks = jnp.asarray(
    rng.integers(0, 2**32, (2 * 16**3, 16), dtype=np.uint64).astype(np.uint32))
bidx = jnp.asarray(rng.integers(0, 2 * 16**3, (N_RAYS, nf), dtype=np.int64)
                   .astype(np.int32))
word_idx = jnp.asarray(rng.integers(0, 16, (N_RAYS, nf), dtype=np.int64)
                       .astype(np.int32))
shift = jnp.asarray(rng.integers(0, 32, (N_RAYS, nf), dtype=np.int64)
                    .astype(np.uint32))
# static nearest-fetch map 112 segments -> 63 fetches
seg_to_fetch = jnp.asarray((np.arange(112) * 63 // 112).astype(np.int32))


def chain(bi, wi, sh):
    rows = jnp.take(bricks, bi.reshape(-1), axis=0).reshape(N_RAYS, nf, 16)
    sel = jnp.zeros((N_RAYS, nf), jnp.uint32)
    for w in range(16):
        sel = jnp.where(wi == w, rows[:, :, w], sel)
    bit = (sel >> sh) & jnp.uint32(1)
    occ = jnp.take(bit, seg_to_fetch, axis=1)  # (N, 112) static-index map
    return occ.astype(jnp.int32).sum()


timeit("full brick chain (fetch+select+shift+map to 112)", jax.jit(chain),
       bidx, word_idx, shift)

# gather-rate control: same take from a BIG 64B-row table (67MB)
big = jnp.asarray(rng.integers(0, 2**32, (1024 * 1024, 16), dtype=np.uint64)
                  .astype(np.uint32))
ibig = jnp.asarray(rng.integers(0, 1024 * 1024, N_RAYS * nf, dtype=np.int64)
                   .astype(np.int32))
timeit("control: same count 64B rows from 67MB table",
       jax.jit(lambda i: jnp.take(big, i, axis=0).sum()), ibig)

# flat scalar-word variant (the shipped layout: no lane padding)
flatb = jnp.asarray(rng.integers(0, 2**32, 2 * 16**3 * 16, dtype=np.uint64)
                    .astype(np.uint32))
widx = jnp.asarray(rng.integers(0, flatb.shape[0], (N_RAYS, 112), dtype=np.int64)
                   .astype(np.int32))
shift2 = jnp.asarray(rng.integers(0, 32, (N_RAYS, 112), dtype=np.int64)
                     .astype(np.uint32))
f_flat = jax.jit(lambda i, sh: (((jnp.take(flatb, i.reshape(-1))
                                  .reshape(i.shape)) >> sh)
                                & jnp.uint32(1)).astype(jnp.int32).sum())
timeit("flat word takes (N,112) from 0.5MB uint32 table", f_flat, widx, shift2)

# v2 chain: per-probe 64B row fetch + lanes-full (M/8,128) extraction
# (no column slices, no (..,16) padded elementwise) + group-sum matmul
M = N_RAYS * 112
b2d = jnp.asarray(rng.integers(0, 2**32, (2 * 16**3, 16), dtype=np.uint64)
                  .astype(np.uint32))
bidx2 = jnp.asarray(rng.integers(0, 2 * 16**3, M, dtype=np.int64).astype(np.int32))
inbrick = jnp.asarray(rng.integers(0, 512, M, dtype=np.int64).astype(np.int32))
GROUPSUM = jnp.asarray(np.kron(np.eye(8), np.ones((16, 1))), jnp.float32)  # (128, 8)


def chain2(bi, ib):
    word = ib // 32                       # (M,) in [0,16)
    shift = (ib % 32).astype(jnp.uint32)  # (M,)
    rows = jnp.take(b2d, bi, axis=0)      # (M, 16) u32 (padded 8x, write-only)
    packed = rows.reshape(M // 8, 128)    # lanes full
    sh128 = jnp.broadcast_to(shift.reshape(M // 8, 8, 1), (M // 8, 8, 16)).reshape(M // 8, 128)
    w128 = jnp.broadcast_to(word.reshape(M // 8, 8, 1), (M // 8, 8, 16)).reshape(M // 8, 128)
    lane16 = jnp.broadcast_to(jnp.arange(16, dtype=jnp.int32)[None, None, :], (M // 8, 8, 16)).reshape(M // 8, 128)
    bits = ((packed >> sh128) & jnp.uint32(1)).astype(jnp.float32)
    bits = bits * (w128 == lane16).astype(jnp.float32)
    occ8 = jax.lax.dot_general(bits, GROUPSUM, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (M/8, 8)
    return (occ8.reshape(-1) > 0.5).astype(jnp.int32).sum()


timeit("v2 chain (M=3.67M probes, lanes-full extraction)", jax.jit(chain2),
       bidx2, inbrick)
