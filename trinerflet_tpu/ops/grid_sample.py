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
