"""Ray generation.

Mirrors the reference ``get_rays`` (reconstruction/nerf/utils.py:64-149):
pixel centers at +0.5, pinhole directions ((i-cx)/fx, (j-cy)/fy, 1) normalized,
rotated by the cam2world rotation; origins are the camera centers.

TPU design: instead of materializing a host-side pool of every training ray
(the reference preloads and globally shuffles all rays, utils.py:786-789,
1126), rays are generated *inside the jitted train step* from device-resident
poses + pixel indices — uniform sampling with replacement over all
view/pixel pairs, which removes the host dataloader from the hot path
entirely.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rays_for_pixels", "rays_full_image", "sample_ray_batch"]


def rays_for_pixels(
    poses: jnp.ndarray,        # (V, 4, 4) cam2world
    intrinsics,                # (fx, fy, cx, cy)
    W: int,
    img_idx: jnp.ndarray,      # (B,) int32
    pix_idx: jnp.ndarray,      # (B,) int32 flat pixel index j*W + i
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rays for selected (view, pixel) pairs. Returns (rays_o, rays_d), (B, 3)."""
    fx, fy, cx, cy = intrinsics
    i = (pix_idx % W).astype(jnp.float32) + 0.5
    j = (pix_idx // W).astype(jnp.float32) + 0.5
    dirs = jnp.stack([(i - cx) / fx, (j - cy) / fy, jnp.ones_like(i)], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rot = poses[img_idx, :3, :3]          # (B, 3, 3)
    rays_d = jnp.einsum("bc,brc->br", dirs, rot)
    rays_o = poses[img_idx, :3, 3]
    return rays_o, rays_d


def rays_full_image(pose: np.ndarray, intrinsics, H: int, W: int):
    """All rays of one view, row-major. Returns numpy (H*W, 3) x2."""
    fx, fy, cx, cy = intrinsics
    i, j = np.meshgrid(np.arange(W, dtype=np.float32) + 0.5,
                       np.arange(H, dtype=np.float32) + 0.5, indexing="xy")
    dirs = np.stack([(i - cx) / fx, (j - cy) / fy, np.ones_like(i)], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = dirs.reshape(-1, 3) @ pose[:3, :3].T
    rays_o = np.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o.astype(np.float32), rays_d.astype(np.float32)


def sample_ray_batch(
    rng: jax.Array,
    images: jnp.ndarray,       # (V, H, W, C) float32 in [0, 1]
    poses: jnp.ndarray,        # (V, 4, 4)
    intrinsics,
    num_rays: int,
):
    """Uniformly sample a training batch of rays + target pixels on device."""
    V, H, W = images.shape[:3]
    k1, k2 = jax.random.split(rng)
    img_idx = jax.random.randint(k1, (num_rays,), 0, V)
    pix_idx = jax.random.randint(k2, (num_rays,), 0, H * W)
    rays_o, rays_d = rays_for_pixels(poses, intrinsics, W, img_idx, pix_idx)
    pixels = images.reshape(V, H * W, -1)[img_idx, pix_idx]
    return rays_o, rays_d, pixels
