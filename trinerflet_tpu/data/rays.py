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

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rays_for_pixels", "rays_full_image", "sample_ray_batch", "rand_poses"]


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
    # ONE flat row-take of whole (16,) pose rows, then static slicing.
    # `poses[idx, :3, :3]` is a gather with slice_sizes (1, 3, 3), which this
    # TPU stack serializes (~µs/row); whole-row take is the fast ~15 ns/row
    # gather path (PERF.md primitive table). Static slices of the gathered
    # rows are free.
    rows = jnp.take(poses.reshape(-1, 16), img_idx, axis=0)   # (B, 16)
    rot = rows[:, :12].reshape(-1, 3, 4)[:, :, :3]            # (B, 3, 3)
    # broadcast-multiply-sum, NOT einsum: a (B,3,3)x(B,3) batched matvec
    # lowers to B tiny MXU dot_generals on TPU (~90 ms for B=32k, measured —
    # scripts/bench_sampling_bisect.py); the elementwise form is free
    rays_d = (rot * dirs[:, None, :]).sum(-1)
    rays_o = rows[:, 3:12:4]                                  # (B, 3) col 3
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
    pixels = _take_pixels(images, img_idx, pix_idx)
    return rays_o, rays_d, pixels


def _take_pixels(images: jnp.ndarray, img_idx: jnp.ndarray, pix_idx: jnp.ndarray):
    """Gather (B, C) pixel rows as ONE flat row-take. Two-array advanced
    indexing (``images[v, p]``) lowers to a 2-operand gather this stack
    serializes; a single fused index keeps it on the fast whole-row take path
    (PERF.md primitive table)."""
    V, H, W = images.shape[:3]
    flat = img_idx * (H * W) + pix_idx
    return jnp.take(images.reshape(V * H * W, -1), flat, axis=0)


def sample_ray_batch_error_map(
    rng: jax.Array,
    images: jnp.ndarray,       # (V, H, W, C)
    poses: jnp.ndarray,
    intrinsics,
    num_rays: int,
    error_map: jnp.ndarray,    # (V, G*G) nonnegative sampling weights
):
    """Error-weighted ray sampling (reference get_rays error_map branch,
    utils.py:110-125): draw coarse GxG cells proportional to the running
    per-cell training error, jitter to a full-res pixel, and return the coarse
    cell ids so the caller can EMA-update the map. The grid size G is derived
    from the map's (static) shape — the reference hardcodes 128 even for tiny
    images; the trainer passes min(128, H, W).
    """
    V, H, W = images.shape[:3]
    G = int(round(math.isqrt(error_map.shape[1])))
    assert G * G == error_map.shape[1], error_map.shape
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    img_idx = jax.random.randint(k1, (num_rays,), 0, V)
    # inverse-CDF draw per ray on its view's error map (flat binary search;
    # batched searchsorted lowers poorly on TPU)
    cdf = jnp.cumsum(error_map, axis=1)
    total = cdf[:, -1]
    u = jax.random.uniform(k2, (num_rays,)) * jnp.take(total, img_idx)
    flat_cdf = cdf.reshape(-1)
    base = img_idx * (G * G)
    lo = jnp.zeros((num_rays,), jnp.int32)
    hi = jnp.full((num_rays,), G * G, jnp.int32)
    for _ in range(max(1, (G * G - 1).bit_length())):
        mid = (lo + hi) // 2
        val = jnp.take(flat_cdf, base + jnp.minimum(mid, G * G - 1))
        go_right = val < u
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    cell = jnp.minimum(lo, G * G - 1)
    cx = cell // G
    cy = cell % G
    sx, sy = H / G, W / G
    jx = jax.random.uniform(k3, (num_rays,))
    jy = jax.random.uniform(k4, (num_rays,))
    ix = jnp.clip((cx * sx + jx * sx).astype(jnp.int32), 0, H - 1)
    iy = jnp.clip((cy * sy + jy * sy).astype(jnp.int32), 0, W - 1)
    pix_idx = ix * W + iy
    rays_o, rays_d = rays_for_pixels(poses, intrinsics, W, img_idx, pix_idx)
    pixels = _take_pixels(images, img_idx, pix_idx)
    return rays_o, rays_d, pixels, (img_idx, cell)


def sample_ray_batch_pregen(
    rng: jax.Array,
    images: jnp.ndarray,       # (V, H, W, C)
    rays_o: jnp.ndarray,       # (V, H, W, 3) precomputed (e.g. LLFF NDC rays)
    rays_d: jnp.ndarray,       # (V, H, W, 3)
    num_rays: int,
):
    """Sample a batch from precomputed per-view ray grids (LLFF/NDC path)."""
    V, H, W = images.shape[:3]
    k1, k2 = jax.random.split(rng)
    img_idx = jax.random.randint(k1, (num_rays,), 0, V)
    pix_idx = jax.random.randint(k2, (num_rays,), 0, H * W)
    take = lambda a: _take_pixels(a, img_idx, pix_idx)
    return take(rays_o), take(rays_d), take(images)


def rand_poses(rng: np.random.Generator, size: int, radius: float = 1.0,
               theta_range=(np.pi / 3, 2 * np.pi / 3),
               phi_range=(0, 2 * np.pi)) -> np.ndarray:
    """Random orbit-camera poses looking at the origin (B, 4, 4).

    Reference: provider.rand_poses (provider.py:61-96) — spherical centers,
    forward = -normalize(center), up = (0, -1, 0) before orthogonalization.
    Host-side numpy: pose generation is trivially small next to rendering.
    """
    thetas = rng.uniform(theta_range[0], theta_range[1], size)
    phis = rng.uniform(phi_range[0], phi_range[1], size)
    centers = radius * np.stack([
        np.sin(thetas) * np.sin(phis),
        np.cos(thetas),
        np.sin(thetas) * np.cos(phis),
    ], axis=-1)

    def _norm(v):
        return v / (np.linalg.norm(v, axis=-1, keepdims=True) + 1e-10)

    fwd = -_norm(centers)
    up = np.broadcast_to(np.array([0.0, -1.0, 0.0]), fwd.shape)
    right = _norm(np.cross(fwd, up))
    up = _norm(np.cross(right, fwd))
    poses = np.tile(np.eye(4, dtype=np.float32), (size, 1, 1))
    poses[:, :3, :3] = np.stack([right, up, fwd], axis=-1)
    poses[:, :3, 3] = centers
    return poses
