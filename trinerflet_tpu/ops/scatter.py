"""Scatter-add without XLA scatters: sort + blocked one-hot matmul.

XLA lowers ``zeros.at[idx].add(rows)`` on TPU to a serialized per-element
update stream (~5-6 ns per float32 lane, PERF.md) — 670 ms/step of the round-1
bench lives in exactly three such scatters (the triplane gradient). This
module reformulates unordered scatter-add as MXU work:

1. sort the row indices (``lax.sort``; ~28 ms/M keys, the only serial-ish op),
2. carve the sorted stream into fixed ``block``-row chunks that each target a
   single ``tile``-row span of the output (a tile never splits a block, so a
   block's contribution is a dense (tile, D) panel),
3. ``lax.scan`` over blocks: build the block's one-hot matrix with a
   broadcasted-iota compare (no memory traffic) and accumulate
   ``onehot.T @ payload`` into the donated output with a dynamic-slice
   read-modify-write.

Everything is gathers, cumsums, one matmul per block, and in-place dense
updates — the exact op mix this backend executes at full speed. This is the
TPU replacement for the CUDA ``atomicAdd`` accumulation in the reference's
grid/triplane backward kernels (aux_libs/gridencoder/src/gridencoder.cu:249,
and the grad path of F.grid_sample).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["scatter_add_rows", "blocked_scatter_add", "xla_scatter_add"]


def xla_scatter_add(idx: jnp.ndarray, payload: jnp.ndarray, num_rows: int) -> jnp.ndarray:
    """Reference path: plain XLA scatter-add (serialized on TPU)."""
    out = jnp.zeros((num_rows, payload.shape[1]), jnp.float32)
    return out.at[idx].add(payload.astype(jnp.float32))


@partial(jax.jit, static_argnames=("num_rows", "tile", "block", "precision",
                                   "reorder"))
def blocked_scatter_add(
    idx: jnp.ndarray,        # (N,) int32 row indices in [0, num_rows)
    payload: jnp.ndarray,    # (N, D)
    num_rows: int,
    tile: int = 2048,
    block: int = 1024,
    precision: str = "highest",
    reorder: str = "gather",
) -> jnp.ndarray:
    """out[i] = sum of payload rows with idx == i, as sort + one-hot matmuls.

    Exact in fp32 (one-hot products are exact; only the add order differs from
    the scatter path). Returns (num_rows, D) float32.

    ``precision`` sets the one-hot matmul pass count: ``"highest"`` (6-pass,
    exact f32 terms) or ``"default"`` (1-pass: each payload term is rounded to
    bf16 before the exact-f32 accumulation — the right trade when the gradient
    target is itself bf16, e.g. bf16 triplanes; the matmul passes are the bulk
    of the scan stage, so this is ~6x less MXU work).

    ``reorder`` picks how payload rows reach sorted order: ``"gather"`` =
    argsort + ONE serialized row-gather (~14 ms at bench scale);
    ``"sortops"`` = the payload columns ride ``lax.sort`` as extra operands
    (multi-operand sort payloads are ~free on this stack, PERF.md), skipping
    the row-gather entirely. Block extraction inside the scan is a contiguous
    dynamic slice either way (DMA bandwidth, not the per-row gather rate).
    """
    N, D = payload.shape
    assert num_rows < (1 << 24), "row index must stay exact in fp32"
    num_tiles = -(-num_rows // tile)
    padded_rows = num_tiles * tile
    # worst-case block count: every tile wastes at most one partial block
    num_blocks = N // block + num_tiles

    if reorder == "sortops":
        pf = payload.astype(jnp.float32)
        ops = (idx,) + tuple(pf[:, i] for i in range(D))
        sorted_ops = jax.lax.sort(ops, num_keys=1)
        sext = jnp.concatenate(
            [sorted_ops[0].astype(jnp.float32)[:, None]]
            + [c[:, None] for c in sorted_ops[1:]],
            axis=1,
        )
    else:
        order = jnp.argsort(idx)
        # sorted [index | payload] rows: one gather total
        ext = jnp.concatenate(
            [idx.astype(jnp.float32)[:, None], payload.astype(jnp.float32)], axis=1
        )
        sext = jnp.take(ext, order, axis=0)
    sext = jnp.concatenate([sext, jnp.zeros((block, D + 1), jnp.float32)])
    sidx = sext[:N, 0].astype(jnp.int32)
    tile_of = sidx // tile

    # per-tile extent in the sorted stream
    starts = jnp.searchsorted(tile_of, jnp.arange(num_tiles + 1, dtype=tile_of.dtype))
    counts = (starts[1:] - starts[:-1]).astype(jnp.int32)
    blocks_per_tile = -(-counts // block)  # ceil

    # block table: tile id, rank within tile, start position in sorted stream
    cum_blocks = jnp.cumsum(blocks_per_tile)
    blk_tile = jnp.repeat(
        jnp.arange(num_tiles, dtype=jnp.int32), blocks_per_tile,
        total_repeat_length=num_blocks,
    )
    # blocks beyond the true total alias tile (num_tiles - 1) with rank past
    # its count -> fully masked below
    blk_rank = (
        jnp.arange(num_blocks, dtype=jnp.int32)
        - jnp.take(jnp.concatenate([jnp.zeros((1,), cum_blocks.dtype), cum_blocks]),
                   blk_tile).astype(jnp.int32)
    )
    blk_start = jnp.take(starts, blk_tile).astype(jnp.int32) + blk_rank * block
    blk_end = jnp.take(starts, blk_tile + 1).astype(jnp.int32)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (block, tile), 1)
    iota_b = jnp.arange(block, dtype=jnp.int32)
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)

    def body(out, xs):
        t, start, end = xs
        blk = jax.lax.dynamic_slice(sext, (start, 0), (block, D + 1))
        lidx = blk[:, 0].astype(jnp.int32) - t * tile
        lidx = jnp.where(start + iota_b < end, lidx, -1)  # -1 -> zero one-hot
        onehot = (lidx[:, None] == lanes).astype(jnp.float32)  # (block, tile)
        # "highest": exact f32 terms (6-pass). "default": one bf16 pass — the
        # one-hot factor is exact in bf16 (0/1), so only payload terms round.
        contrib = jax.lax.dot_general(
            onehot, blk[:, 1:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (tile, D)
        base = t * tile
        cur = jax.lax.dynamic_slice(out, (base, 0), (tile, D))
        out = jax.lax.dynamic_update_slice(out, cur + contrib, (base, 0))
        return out, None

    out = jnp.zeros((padded_rows, D), jnp.float32)
    out, _ = jax.lax.scan(body, out, (blk_tile, blk_start, blk_end))
    return out[:num_rows]


def _sharded_blocked_scatter_add(
    idx: jnp.ndarray, payload: jnp.ndarray, num_rows: int, tile: int,
    precision: str, mesh,
) -> jnp.ndarray:
    """Per-data-shard blocked scatter + psum, via shard_map.

    The blocked scatter is a GLOBAL sort followed by a sequential scan over
    blocks of the sorted stream — a structure the SPMD partitioner cannot
    split across data shards (at data=8 it emitted collectives inside the
    scan body: 13x backward blowup, scripts/bisect_d8_cliff2.py). But
    scatter-add is order-independent: each shard sorts and scans only ITS
    rows into a full-size partial output, and a single psum over the data
    axis reduces the partials — the same one all-reduce the gradient needs
    anyway, just taken before the (cheap, then-replicated) IDWT transpose
    instead of after. Only the f32 accumulation ORDER differs from the
    single-device path.
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.sharding import DATA_AXIS, MODEL_AXIS

    model = mesh.shape.get(MODEL_AXIS, 1)
    split_ch = model > 1 and payload.shape[1] % model == 0
    in_pay = P(DATA_AXIS, MODEL_AXIS) if split_ch else P(DATA_AXIS)
    out_spec = P(None, MODEL_AXIS) if split_ch else P(None, None)

    def local(i, p):
        out = blocked_scatter_add(i, p, num_rows, tile=tile,
                                  precision=precision)
        return jax.lax.psum(out, DATA_AXIS)

    # check_vma off: the scan carry starts from an (unvarying) zeros buffer
    # that becomes shard-varying through the per-shard xs — intended here
    return jax.shard_map(local, mesh=mesh, in_specs=(P(DATA_AXIS), in_pay),
                         out_specs=out_spec, check_vma=False)(idx, payload)


def scatter_add_rows(
    idx: jnp.ndarray,
    payload: jnp.ndarray,
    num_rows: int,
    strategy: str = "auto",
    precision: str = "highest",
) -> jnp.ndarray:
    """Dispatch: 'xla' | 'blocked' | 'auto'.

    'auto' is backend-aware: the blocked one-hot-matmul form exists because
    TPU serializes scatter (~100 ns/row); CPU executes scatter natively at
    full speed while emulating the matmul scan ~3 orders slower (measured:
    98k x 32 f32 rows into 16k: xla 5 ms, blocked 3.2 s on this host). So on
    a CPU backend 'auto' always takes the plain scatter, and the virtual-mesh
    tests exercise the same GSPMD pattern (local scatter + grad all-reduce)
    real multi-chip DP uses. On TPU, big problems take the blocked path;
    under an ambient data mesh it runs per-shard + psum via shard_map
    (_sharded_blocked_scatter_add) because its global sort+scan cannot be
    SPMD-partitioned. Keys off jax.default_backend() at trace time (same
    trade as ops/wavelets.py — documented there)."""
    from ..parallel.sharding import DATA_AXIS, current_data_mesh

    if strategy == "xla":
        return xla_scatter_add(idx, payload, num_rows)
    mesh = current_data_mesh()
    n_data = mesh.shape[DATA_AXIS] if mesh is not None else 1
    sharded_ok = (mesh is not None and idx.shape[0] % n_data == 0)
    if strategy == "blocked":
        if sharded_ok:
            return _sharded_blocked_scatter_add(
                idx, payload, num_rows, 2048, precision, mesh)
        return blocked_scatter_add(idx, payload, num_rows, precision=precision)
    if jax.default_backend() == "cpu":
        return xla_scatter_add(idx, payload, num_rows)
    N = idx.shape[0]
    if N >= 65536 and num_rows >= 16384:
        tile = min(2048, 1 << max(8, (num_rows - 1).bit_length() - 7))
        if sharded_ok:
            return _sharded_blocked_scatter_add(
                idx, payload, num_rows, tile, precision, mesh)
        return blocked_scatter_add(idx, payload, num_rows, tile=tile,
                                   precision=precision)
    return xla_scatter_add(idx, payload, num_rows)
