"""Bilinear 2D plane sampling (torch ``F.grid_sample`` semantics).

The reference samples triplanes with ``F.grid_sample(..., mode='bilinear',
padding_mode='border', align_corners=True)``
(``reconstruction/triplaneencoder/triplane_encoder.py:329``). This module
provides the same math as a pure-JAX gather, differentiable in both the plane
features and the sample coordinates (the coordinate gradient is what the SR
fork's custom double-backward op ``grid_backward.py`` exists for — JAX autodiff
gives it for free).

Layout note: planes are stored **channel-last** ``(H, W, C)`` so each bilinear
corner is one contiguous row gather — the layout TPUs prefer for gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["grid_sample_2d", "sample_planes"]


def grid_sample_2d(plane: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample with align_corners=True and border padding.

    Args:
      plane: (H, W, C) feature plane.
      coords: (N, 2) sample locations in [-1, 1]; ``coords[:, 0]`` indexes the
        W (x) axis and ``coords[:, 1]`` the H (y) axis, matching torch.
    Returns:
      (N, C) sampled features.
    """
    H, W, C = plane.shape
    x = (coords[:, 0] + 1.0) * 0.5 * (W - 1)
    y = (coords[:, 1] + 1.0) * 0.5 * (H - 1)
    # border padding: clamp continuous coords into the valid square
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32) if W > 1 else jnp.zeros_like(x, jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32) if H > 1 else jnp.zeros_like(y, jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = x - x0.astype(x.dtype)
    wy = y - y0.astype(y.dtype)

    flat = plane.reshape(H * W, C)
    f00 = jnp.take(flat, y0 * W + x0, axis=0)
    f01 = jnp.take(flat, y0 * W + x1, axis=0)
    f10 = jnp.take(flat, y1 * W + x0, axis=0)
    f11 = jnp.take(flat, y1 * W + x1, axis=0)
    wx = wx[:, None]
    wy = wy[:, None]
    return (
        f00 * (1 - wx) * (1 - wy)
        + f01 * wx * (1 - wy)
        + f10 * (1 - wx) * wy
        + f11 * wx * wy
    )


def sample_planes(planes: jnp.ndarray, coords2d: jnp.ndarray) -> jnp.ndarray:
    """Sample a stack of planes at per-plane 2D coordinates.

    Args:
      planes: (P, H, W, C).
      coords2d: (P, N, 2) in [-1, 1].
    Returns:
      (N, P, C) features (concat over P gives the triplane feature vector).
    """
    # unrolled over the (small, static) plane axis: vmap would lower to a
    # batched gather, which XLA TPU handles far worse than P flat gathers
    out = jnp.stack(
        [grid_sample_2d(planes[p], coords2d[p]) for p in range(planes.shape[0])]
    )  # (P, N, C)
    return jnp.transpose(out, (1, 0, 2))


# ---------------------------------------------------------------------------
# Quad-packed fast sampler
# ---------------------------------------------------------------------------
# TPU gathers/scatters cost ~15-100 ns per ROW regardless of row width
# (PERF.md), so bilinear's 4 corner lookups are 4x too many. Packing each
# texel's 2x2 neighborhood into one (4C) row makes bilinear ONE gather per
# (sample, plane) forward and ONE scatter-add backward; the overlapping-quad
# gradient is folded back to texels with dense shifted adds. Coordinates get
# zero gradients on this path (ray geometry is never learnable in training;
# use `grid_sample_2d` where coordinate gradients are required, e.g. SR
# analytic normals).


def _quad_pack(plane: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> (H, W, 4C) rows holding [P(y,x), P(y,x+1), P(y+1,x),
    P(y+1,x+1)] with edge clamping (rows at x=W-1 / y=H-1 are never read)."""
    p01 = jnp.concatenate([plane[:, 1:], plane[:, -1:]], axis=1)
    p10 = jnp.concatenate([plane[1:], plane[-1:]], axis=0)
    p11 = jnp.concatenate([p01[1:], p01[-1:]], axis=0)
    return jnp.concatenate([plane, p01, p10, p11], axis=-1)


def _quad_unpack_grad(gq: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of _quad_pack: (H, W, 4C) quad-grads -> (H, W, C) texel grads."""
    C = gq.shape[-1] // 4
    g00, g01, g10, g11 = (gq[..., i * C : (i + 1) * C] for i in range(4))

    def shx(a):  # adjoint of x-shift with edge clamp
        out = jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=1)
        return out.at[:, -1].add(a[:, -1])

    def shy(a):
        out = jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)
        return out.at[-1].add(a[-1])

    return g00 + shx(g01) + shy(g10) + shy(shx(g11))


def _corner_weights(plane_shape, coords):
    H, W = plane_shape[:2]
    x = jnp.clip((coords[:, 0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
    y = jnp.clip((coords[:, 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]
    w = jnp.concatenate(
        [(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy], axis=-1
    )  # (N, 4)
    return y0 * W + x0, w


@jax.custom_vjp
def grid_sample_2d_quad(plane: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample identical to :func:`grid_sample_2d` (border padding,
    align_corners=True) with one gather per sample. plane (H, W, C),
    coords (N, 2) -> (N, C). No coordinate gradients (see module note)."""
    return _quad_fwd(plane, coords)[0]


def _quad_fwd(plane, coords):
    H, W, C = plane.shape
    quad = _quad_pack(plane).reshape(H * W, 4 * C)
    idx, w = _corner_weights(plane.shape, coords)
    rows = jnp.take(quad, idx, axis=0)  # (N, 4C) - the one gather
    vals = rows.reshape(-1, 4, C)
    out = (vals * w[..., None]).sum(axis=1)
    # zero-size markers carry the primal SHAPES/dtypes into the bwd statically
    marker = jnp.zeros((0,) + plane.shape, plane.dtype)
    cmarker = jnp.zeros((0,), coords.dtype)
    return out, (idx, w, marker, cmarker)


def _quad_bwd(res, g):
    from .scatter import scatter_add_outer

    idx, w, marker, cmarker = res
    H, W, C = marker.shape[1:]
    # plane-gradient accumulation WITHOUT an XLA scatter: sort + blocked
    # one-hot matmuls (ops/scatter.py). The (N, 4C) payload is a rank-1
    # product of the 4 corner weights and the C-channel cotangent, so the
    # FACTORED path reorders only the narrow [w | g] rows and forms the
    # product per block; zero-cotangent rows (ray padding, early-terminated
    # samples) are dropped exactly, costing no matmul blocks.
    # bf16 planes: factors round to bf16 in the 1-pass matmul (the result is
    # cast to bf16 below anyway); f32 planes keep exact 6-pass f32.
    prec = "default" if marker.dtype == jnp.bfloat16 else "highest"
    gq = scatter_add_outer(idx, w, g, H * W, precision=prec)
    g_plane = _quad_unpack_grad(gq.reshape(H, W, 4 * C)).astype(marker.dtype)
    return g_plane, jnp.zeros((g.shape[0], 2), cmarker.dtype)


grid_sample_2d_quad.defvjp(lambda p, c: _quad_fwd(p, c), _quad_bwd)


def sample_planes_quad(planes: jnp.ndarray, coords2d: jnp.ndarray) -> jnp.ndarray:
    """Quad-packed variant of :func:`sample_planes` (1 gather/scatter per
    plane). Same output; zero coordinate gradients."""
    out = jnp.stack(
        [grid_sample_2d_quad(planes[p], coords2d[p]) for p in range(planes.shape[0])]
    )
    return jnp.transpose(out, (1, 0, 2))


# ---------------------------------------------------------------------------
# Corner sampler (memory-lean fast path for huge planes)
# ---------------------------------------------------------------------------
# The quad table materializes (H, W, 4C) — over 1 GB per plane at 2048^2/32ch,
# which is what broke the base-light 2048 stage into HBM OOM on one v5e. This
# variant keeps the plain 4-corner gathers forward (no packed table) and runs
# the backward through the blocked one-hot-matmul scatter on (4N, C) rows, so
# the gradient buffer is (H*W, C) fp32 — 4x smaller than the quad path's.
# Like the quad path it drops coordinate gradients.


@jax.custom_vjp
def grid_sample_2d_corner(plane: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    return _corner_fwd(plane, coords)[0]


def _corner_fwd(plane, coords):
    H, W, C = plane.shape
    idx00, w = _corner_weights(plane.shape, coords)
    flat = plane.reshape(H * W, C)
    idx = jnp.stack([idx00, idx00 + 1, idx00 + W, idx00 + W + 1], axis=1)  # (N, 4)
    rows = jnp.take(flat, idx.reshape(-1), axis=0).reshape(-1, 4, C)
    out = (rows * w[..., None]).sum(axis=1)
    marker = jnp.zeros((0,) + plane.shape, plane.dtype)
    cmarker = jnp.zeros((0,), coords.dtype)
    return out, (idx, w, marker, cmarker)


def _corner_bwd(res, g):
    from .scatter import scatter_add_outer

    idx, w, marker, cmarker = res
    H, W, C = marker.shape[1:]
    # Factored QUAD-shaped backward: the 4 corner contributions of sample n
    # are outer(w[n], g[n]) rows landing at the quad-structured offsets
    # (idx00, +1, +W, +W+1) — exactly the quad table's gradient. ONE outer
    # scatter keyed on idx00 accumulates (H*W, 4C) and the dense shifted-add
    # unpack folds it to texels. vs the previous (4N, C) row scatter this
    # sorts N keys instead of 4N and reorders (K+C)-narrow bf16 factors
    # instead of 4N full f32 rows: measured 101 vs 167 ms at 2048^2/32ch
    # (scripts/bench_r4_probes2 probe 4). Transient cost: the (H*W, 4C) f32
    # gradient buffer (2.1 GB at 2048^2/32ch, vs the old path's (H*W, C) —
    # verified to fit beside the stage-3 state on one v5e).
    idx00 = idx[:, 0]  # _corner_fwd stacked (idx00, +1, +W, +W+1)
    prec = "default" if marker.dtype == jnp.bfloat16 else "highest"
    gq = scatter_add_outer(idx00, w, g.astype(jnp.float32), H * W,
                           precision=prec)
    g_plane = _quad_unpack_grad(gq.reshape(H, W, 4 * C)).astype(marker.dtype)
    return g_plane, jnp.zeros((g.shape[0], 2), cmarker.dtype)


grid_sample_2d_corner.defvjp(lambda p, c: _corner_fwd(p, c), _corner_bwd)


def sample_planes_corner(planes: jnp.ndarray, coords2d: jnp.ndarray) -> jnp.ndarray:
    out = jnp.stack(
        [grid_sample_2d_corner(planes[p], coords2d[p]) for p in range(planes.shape[0])]
    )
    return jnp.transpose(out, (1, 0, 2))
