"""Stage timing inside blocked_scatter_add at bench scale."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N, D, ROWS, TILE, BLOCK = 655_360, 64, 1024 * 1024, 2048, 512

rng = np.random.default_rng(0)
base = rng.integers(0, ROWS - 2048, N // 32)
idx = jnp.asarray(np.clip((base[:, None] + rng.integers(0, 2048, (N // 32, 32))).reshape(-1), 0, ROWS - 1).astype(np.int32))
pay = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))


def timeit(fn, *args, reps=10):
    out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / reps * 1e3


num_tiles = ROWS // TILE
num_blocks = N // BLOCK + num_tiles


@jax.jit
def stage_sort(idx):
    order = jnp.argsort(idx)
    return order, jnp.take(idx, order)


@jax.jit
def stage_blocktable(idx):
    order = jnp.argsort(idx)
    sidx = jnp.take(idx, order)
    tile_of = sidx // TILE
    starts = jnp.searchsorted(tile_of, jnp.arange(num_tiles + 1, dtype=tile_of.dtype))
    counts = (starts[1:] - starts[:-1]).astype(jnp.int32)
    bpt = -(-counts // BLOCK)
    cum = jnp.cumsum(bpt)
    blk_tile = jnp.repeat(jnp.arange(num_tiles, dtype=jnp.int32), bpt,
                          total_repeat_length=num_blocks)
    blk_rank = jnp.arange(num_blocks, dtype=jnp.int32) - jnp.take(
        jnp.concatenate([jnp.zeros((1,), cum.dtype), cum]), blk_tile).astype(jnp.int32)
    blk_start = jnp.take(starts, blk_tile).astype(jnp.int32) + blk_rank * BLOCK
    return blk_tile, blk_start


@jax.jit
def stage_gathers(idx, pay):
    order = jnp.argsort(idx)
    sidx = jnp.take(idx, order)
    tile_of = sidx // TILE
    starts = jnp.searchsorted(tile_of, jnp.arange(num_tiles + 1, dtype=tile_of.dtype))
    counts = (starts[1:] - starts[:-1]).astype(jnp.int32)
    bpt = -(-counts // BLOCK)
    cum = jnp.cumsum(bpt)
    blk_tile = jnp.repeat(jnp.arange(num_tiles, dtype=jnp.int32), bpt,
                          total_repeat_length=num_blocks)
    blk_rank = jnp.arange(num_blocks, dtype=jnp.int32) - jnp.take(
        jnp.concatenate([jnp.zeros((1,), cum.dtype), cum]), blk_tile).astype(jnp.int32)
    blk_start = jnp.take(starts, blk_tile).astype(jnp.int32) + blk_rank * BLOCK
    blk_end = jnp.take(starts, blk_tile + 1).astype(jnp.int32)
    pos = blk_start[:, None] + jnp.arange(BLOCK, dtype=jnp.int32)[None, :]
    ok = pos < blk_end[:, None]
    pos = jnp.minimum(pos, N - 1)
    sample = jnp.take(order, pos.reshape(-1))
    local = jnp.take(sidx, pos.reshape(-1)).reshape(num_blocks, BLOCK)
    local = jnp.where(ok, local - blk_tile[:, None] * TILE, -1)
    payb = jnp.take(pay, sample, axis=0).reshape(num_blocks, BLOCK, D)
    return blk_tile, local, payb


from trinerflet_tpu.ops.scatter import blocked_scatter_add

print(f"sort only        : {timeit(stage_sort, idx):7.2f} ms", flush=True)
print(f"+ block table    : {timeit(stage_blocktable, idx):7.2f} ms", flush=True)
print(f"+ gathers        : {timeit(stage_gathers, idx, pay):7.2f} ms", flush=True)
full = jax.jit(lambda i, p: blocked_scatter_add(i, p, ROWS, tile=TILE, block=BLOCK))
print(f"full (incl scan) : {timeit(full, idx, pay):7.2f} ms", flush=True)
