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

__all__ = ["scatter_add_rows", "scatter_add_outer", "blocked_scatter_add",
           "blocked_scatter_add_outer", "xla_scatter_add"]


def xla_scatter_add(idx: jnp.ndarray, payload: jnp.ndarray, num_rows: int) -> jnp.ndarray:
    """Reference path: plain XLA scatter-add (serialized on TPU)."""
    out = jnp.zeros((num_rows, payload.shape[1]), jnp.float32)
    return out.at[idx].add(payload.astype(jnp.float32))


def _block_table(sidx: jnp.ndarray, tile: int, block: int, num_tiles: int,
                 num_blocks: int):
    """Per-block (tile, start, end) table from SORTED row indices.

    Rows with ``sidx >= num_tiles * tile`` (the sentinel used for
    zero-gradient / padding rows) sort past every real tile and generate no
    blocks. Returns the table padded to the static ``num_blocks`` (trailing
    entries are fully masked: their ``end <= start``) plus the REAL block
    count ``nb`` for dynamic-trip execution.
    """
    tile_of = sidx // tile
    starts = jnp.searchsorted(tile_of, jnp.arange(num_tiles + 1, dtype=tile_of.dtype))
    counts = (starts[1:] - starts[:-1]).astype(jnp.int32)
    blocks_per_tile = -(-counts // block)  # ceil

    cum_blocks = jnp.cumsum(blocks_per_tile)
    blk_tile = jnp.repeat(
        jnp.arange(num_tiles, dtype=jnp.int32), blocks_per_tile,
        total_repeat_length=num_blocks,
    )
    blk_rank = (
        jnp.arange(num_blocks, dtype=jnp.int32)
        - jnp.take(jnp.concatenate([jnp.zeros((1,), cum_blocks.dtype), cum_blocks]),
                   blk_tile).astype(jnp.int32)
    )
    blk_start = jnp.take(starts, blk_tile).astype(jnp.int32) + blk_rank * block
    blk_end = jnp.take(starts, blk_tile + 1).astype(jnp.int32)
    return blk_tile, blk_start, blk_end, cum_blocks[-1].astype(jnp.int32)


def _run_blocks(out, body, tables, nb, trip: str):
    """Execute ``body(out, (tile, start, end)) -> out`` over the block table.

    ``trip="static"`` is a lax.scan over all table entries (masked tail does
    zero-contribution matmuls); ``"dynamic"`` is a fori_loop with the TRACED
    real block count — blocks of untouched tiles and sentinel rows are never
    executed. The block table is tile-ordered, so real blocks are a prefix.
    """
    if trip == "static":
        def sbody(o, xs):
            return body(o, xs), None
        out, _ = jax.lax.scan(sbody, out, tables)
        return out

    blk_tile, blk_start, blk_end = tables

    def lbody(i, o):
        xs = (jax.lax.dynamic_index_in_dim(blk_tile, i, keepdims=False),
              jax.lax.dynamic_index_in_dim(blk_start, i, keepdims=False),
              jax.lax.dynamic_index_in_dim(blk_end, i, keepdims=False))
        return body(o, xs)

    return jax.lax.fori_loop(0, nb, lbody, out)


@partial(jax.jit, static_argnames=("num_rows", "tile", "block", "precision",
                                   "reorder", "trip"))
def blocked_scatter_add(
    idx: jnp.ndarray,        # (N,) int32 row indices in [0, num_rows)
    payload: jnp.ndarray,    # (N, D)
    num_rows: int,
    tile: int = 2048,
    block: int = 1024,
    precision: str = "highest",
    reorder: str = "gather",
    trip: str = "static",
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
    argsort + ONE serialized row-gather; ``"sortops"`` = the payload columns
    ride ``lax.sort`` as extra operands. ``trip`` picks static-scan vs
    dynamic-count execution of the block loop (see :func:`_run_blocks`).

    Rows may carry ``idx == num_rows`` (rounded up to the tile grid) as an
    explicit drop-this-row sentinel; combined with ``trip="dynamic"`` they
    cost only sort slots, no matmul blocks.
    """
    N, D = payload.shape
    assert num_rows < (1 << 24), "row index must stay exact in fp32"
    num_tiles = -(-num_rows // tile)
    padded_rows = num_tiles * tile
    # worst-case block count: every tile wastes at most one partial block
    num_blocks = N // block + num_tiles
    sentinel = num_tiles * tile
    idx = jnp.where(idx >= num_rows, sentinel, idx)

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
    blk_tile, blk_start, blk_end, nb = _block_table(
        sidx, tile, block, num_tiles, num_blocks)

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
        return out

    out = jnp.zeros((padded_rows, D), jnp.float32)
    out = _run_blocks(out, body, (blk_tile, blk_start, blk_end), nb, trip)
    return out[:num_rows]


@partial(jax.jit, static_argnames=("num_rows", "tile", "block", "precision",
                                   "trip", "drop_zero_rows"))
def blocked_scatter_add_outer(
    idx: jnp.ndarray,   # (N,) int32 row indices in [0, num_rows)
    w: jnp.ndarray,     # (N, K) per-row weights (K small, e.g. 4 corners)
    g: jnp.ndarray,     # (N, C) per-row gradient
    num_rows: int,
    tile: int = 2048,
    block: int = 2048,
    precision: str = "default",
    trip: str = "dynamic",
    drop_zero_rows: bool = True,
) -> jnp.ndarray:
    """Blocked scatter-add of FACTORED payload rows ``outer(w[n], g[n])``.

    out[i, k*C + c] = sum over rows n with idx[n] == i of w[n, k] * g[n, c].
    This is the bilinear plane-gradient shape: the quad sampler's backward
    scatters (N, 4C) rows that are rank-1 products of 4 corner weights and a
    C-channel cotangent. Materializing that product makes the sort reorder
    move 4C wide f32 rows (~260 B at C=16 — the gather-rate collapse zone,
    PERF.md row-width curve); this variant reorders the narrow packed
    ``[w | g]`` factors (K+C columns) and forms the outer product per block
    inside the loop (VPU, free next to the matmul).

    ``precision="default"`` packs the factors in bf16 (40 B rows at K=4,
    C=16 — the fast-gather zone) and runs one bf16 matmul pass;
    ``"highest"`` keeps f32 factors and 6-pass matmuls (exact: the in-body
    product equals the precomputed payload bitwise).

    ``drop_zero_rows`` routes rows whose ``g`` is all-zero (ray padding,
    early-terminated samples, masked losses) to the sentinel tile — exact,
    and with ``trip="dynamic"`` they cost no matmul work at all.
    """
    N, K = w.shape
    C = g.shape[1]
    D = K * C
    assert num_rows < (1 << 24)
    num_tiles = -(-num_rows // tile)
    padded_rows = num_tiles * tile
    num_blocks = N // block + num_tiles
    sentinel = num_tiles * tile

    idx = jnp.where(idx >= num_rows, sentinel, idx)
    if drop_zero_rows:
        live = jnp.any(g != 0, axis=1)
        idx = jnp.where(live, idx, sentinel)

    fdt = jnp.float32 if precision == "highest" else jnp.bfloat16
    packed = jnp.concatenate([w.astype(fdt), g.astype(fdt)], axis=1)  # (N, K+C)
    # ONE lax.sort yields both the sorted keys and the gather order
    sidx, order = jax.lax.sort(
        (idx, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
    spacked = jnp.take(packed, order, axis=0)
    spacked = jnp.concatenate([spacked, jnp.zeros((block, K + C), fdt)])
    sidx_ext = jnp.concatenate([sidx, jnp.full((block,), sentinel, sidx.dtype)])

    blk_tile, blk_start, blk_end, nb = _block_table(
        sidx, tile, block, num_tiles, num_blocks)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (block, tile), 1)
    iota_b = jnp.arange(block, dtype=jnp.int32)
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)

    def body(out, xs):
        t, start, end = xs
        fac = jax.lax.dynamic_slice(spacked, (start, 0), (block, K + C))
        bidx = jax.lax.dynamic_slice(sidx_ext, (start,), (block,))
        lidx = bidx - t * tile
        lidx = jnp.where(start + iota_b < end, lidx, -1)
        onehot = (lidx[:, None] == lanes).astype(fdt)  # (block, tile)
        pay = (fac[:, :K, None] * fac[:, None, K:]).reshape(block, D)
        contrib = jax.lax.dot_general(
            onehot, pay, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (tile, D)
        base = t * tile
        cur = jax.lax.dynamic_slice(out, (base, 0), (tile, D))
        return jax.lax.dynamic_update_slice(out, cur + contrib, (base, 0))

    out = jnp.zeros((padded_rows, D), jnp.float32)
    out = _run_blocks(out, body, (blk_tile, blk_start, blk_end), nb, trip)
    return out[:num_rows]


def _sharded_scatter(local_fn, mesh, idx, *payloads, split_ch_dim=None):
    """Per-data-shard blocked scatter + psum, via shard_map.

    The blocked scatter is a GLOBAL sort followed by a sequential loop over
    blocks of the sorted stream — a structure the SPMD partitioner cannot
    split across data shards (at data=8 it emitted collectives inside the
    scan body: 13x backward blowup, scripts/bisect_d8_cliff2.py). But
    scatter-add is order-independent: each shard sorts and scans only ITS
    rows into a full-size partial output, and a single psum over the data
    axis reduces the partials — the same one all-reduce the gradient needs
    anyway, just taken before the (cheap, then-replicated) IDWT transpose
    instead of after. Only the f32 accumulation ORDER differs from the
    single-device path.

    ``split_ch_dim`` names which payload operand may additionally split its
    channel axis over the model mesh axis (the quad payload / the outer
    ``g`` factor).
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.sharding import DATA_AXIS, MODEL_AXIS

    model = mesh.shape.get(MODEL_AXIS, 1)
    in_specs = [P(DATA_AXIS)]
    split_ch = False
    for k, p in enumerate(payloads):
        if (split_ch_dim == k and model > 1 and p.ndim == 2
                and p.shape[1] % model == 0):
            in_specs.append(P(DATA_AXIS, MODEL_AXIS))
            split_ch = True
        else:
            in_specs.append(P(DATA_AXIS))
    out_spec = P(None, MODEL_AXIS) if split_ch else P(None, None)

    def local(i, *ps):
        return jax.lax.psum(local_fn(i, *ps), DATA_AXIS)

    # check_vma off: the loop carry starts from an (unvarying) zeros buffer
    # that becomes shard-varying through the per-shard xs — intended here
    return jax.shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                         out_specs=out_spec, check_vma=False)(idx, *payloads)


def _auto_tile(num_rows: int) -> int:
    # big outputs spread the live rows over more tiles (fewer rows per
    # touched tile), where wider tiles amortize the per-block overhead:
    # measured at 655k rows into 4.19M (2048^2): tile 4096/block 2048 =
    # 27.6 ms vs 2048/2048 = 31.3 (scripts/bench_2048_sampler.py); at 1M
    # rows (1024^2) tile 2048 stays best (12.8 vs 13.8).
    if num_rows > (1 << 21):
        return 4096
    return min(2048, 1 << max(8, (num_rows - 1).bit_length() - 7))


def scatter_add_rows(
    idx: jnp.ndarray,
    payload: jnp.ndarray,
    num_rows: int,
    strategy: str = "auto",
    precision: str = "highest",
    trip: str = "static",
) -> jnp.ndarray:
    """Dispatch: 'xla' | 'blocked' | 'auto'.

    ``trip="static"`` (default) keeps the block loop a lax.scan so the result
    is reverse-differentiable; gradient-accumulation call sites (already
    inside a custom_vjp backward, never differentiated again) pass
    ``"dynamic"`` to skip empty/sentinel blocks entirely.

    'auto' is backend-aware: the blocked one-hot-matmul form exists because
    TPU serializes scatter (~100 ns/row); CPU executes scatter natively at
    full speed while emulating the matmul scan ~3 orders slower (measured:
    98k x 32 f32 rows into 16k: xla 5 ms, blocked 3.2 s on this host). So on
    a CPU backend 'auto' always takes the plain scatter, and the virtual-mesh
    tests exercise the same GSPMD pattern (local scatter + grad all-reduce)
    real multi-chip DP uses. On TPU, big problems take the blocked path;
    under an ambient data mesh it runs per-shard + psum via shard_map
    (_sharded_scatter) because its global sort+scan cannot be
    SPMD-partitioned. Keys off jax.default_backend() at trace time (same
    trade as ops/wavelets.py — documented there)."""
    from ..parallel.sharding import DATA_AXIS, current_data_mesh

    if strategy == "xla":
        return xla_scatter_add(idx, payload, num_rows)
    mesh = current_data_mesh()
    n_data = mesh.shape[DATA_AXIS] if mesh is not None else 1
    sharded_ok = (mesh is not None and idx.shape[0] % n_data == 0)
    N = idx.shape[0]
    if strategy != "blocked":
        if jax.default_backend() == "cpu":
            return xla_scatter_add(idx, payload, num_rows)
        if not (N >= 65536 and num_rows >= 16384):
            return xla_scatter_add(idx, payload, num_rows)
    tile = 2048 if strategy == "blocked" else _auto_tile(num_rows)
    if sharded_ok:
        def local(i, p):
            return blocked_scatter_add(i, p, num_rows, tile=tile,
                                       precision=precision, trip=trip)
        return _sharded_scatter(local, mesh, idx, payload, split_ch_dim=0)
    return blocked_scatter_add(idx, payload, num_rows, tile=tile,
                               precision=precision, trip=trip)


def scatter_add_outer(
    idx: jnp.ndarray,
    w: jnp.ndarray,
    g: jnp.ndarray,
    num_rows: int,
    strategy: str = "auto",
    precision: str = "default",
) -> jnp.ndarray:
    """Factored-payload dispatch: out rows accumulate ``outer(w[n], g[n])``.

    Same backend policy as :func:`scatter_add_rows`. On CPU (native scatter
    is fast; reorder width is irrelevant) the payload is materialized and
    scattered directly. Under a data mesh the model-axis split is over the
    ``w`` columns (the K corners) — the output's column order is k-major, so
    splitting K keeps each shard's columns contiguous.
    """
    from ..parallel.sharding import DATA_AXIS, current_data_mesh

    N, K = w.shape
    C = g.shape[1]

    def materialized():
        return (w[:, :, None].astype(jnp.float32)
                * g[:, None, :].astype(jnp.float32)).reshape(N, K * C)

    if strategy == "xla" or jax.default_backend() == "cpu":
        return xla_scatter_add(idx, materialized(), num_rows)
    if strategy != "blocked" and not (N >= 65536 and num_rows >= 16384):
        return xla_scatter_add(idx, materialized(), num_rows)
    mesh = current_data_mesh()
    n_data = mesh.shape[DATA_AXIS] if mesh is not None else 1
    sharded_ok = (mesh is not None and N % n_data == 0)
    tile = 2048 if strategy == "blocked" else _auto_tile(num_rows)
    if sharded_ok:
        def local(i, wl, gl):
            return blocked_scatter_add_outer(i, wl, gl, num_rows, tile=tile,
                                             precision=precision)
        return _sharded_scatter(local, mesh, idx, w, g, split_ch_dim=0)
    return blocked_scatter_add_outer(idx, w, g, num_rows, tile=tile,
                                     precision=precision)
