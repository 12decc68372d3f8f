"""Synthetic volumetric test scene.

Generates ground-truth renders of an analytic density field (soft colored
spheres) with a brute-force numpy ray marcher. Serves the role the reference
delegates to the nerf-synthetic Blender scenes: an end-to-end fit target for
tests and benchmarks, with no dataset download. Can also write the scene to
disk in ``transforms_{split}.json`` Blender format so the CLI/data loader path
is exercised.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import numpy as np

from .blender import SceneData, nerf_matrix_to_ngp
from .rays import rays_full_image

__all__ = ["make_synthetic_scene", "write_synthetic_scene", "orbit_pose"]

# analytic scene: (center, radius, rgb, density)
_SPHERES = [
    ((-0.25, 0.0, 0.05), 0.28, (0.9, 0.25, 0.2), 40.0),
    ((0.28, 0.05, -0.05), 0.22, (0.2, 0.4, 0.9), 40.0),
    ((0.0, -0.3, 0.1), 0.18, (0.3, 0.85, 0.3), 40.0),
]


def field(pts: np.ndarray, xp=np) -> Tuple[np.ndarray, np.ndarray]:
    """Analytic (sigma, rgb) at (..., 3) points. ``xp``: numpy or jax.numpy
    (the latter lets GT rendering run jitted on the TPU — this host has one
    CPU core, so numpy GT generation is the bottleneck otherwise)."""
    sigma = xp.zeros(pts.shape[:-1], np.float32)
    rgb = xp.zeros(pts.shape[:-1] + (3,), np.float32)
    for (c, r, col, dens) in _SPHERES:
        d = xp.linalg.norm(pts - np.asarray(c, np.float32), axis=-1)
        s = dens * (1.0 / (1.0 + xp.exp(xp.clip((d - r) / 0.01, -60, 60))))
        sigma = sigma + s
        rgb = rgb + s[..., None] * np.asarray(col, np.float32)
    rgb = rgb / xp.maximum(sigma[..., None], 1e-8)
    return sigma, rgb


def _smoothstep_inside(signed_dist, density: float, width: float, xp=np):
    """Density `density` inside (signed_dist < 0), sharp sigmoid edge."""
    return density / (1.0 + xp.exp(xp.clip(signed_dist / width, -60, 60)))


def field_hf(pts, xp=np) -> Tuple[np.ndarray, np.ndarray]:
    """High-frequency analytic (sigma, rgb): checkerboard-textured cube, a
    lattice of thin rods (~2 occupancy voxels thick at H=128), and a striped
    sphere. Stresses exactly what the smooth-spheres scene cannot: sharp
    texture edges, thin geometry, occlusion — the failure modes of lossy
    marching/sampling approximations (stand-in for nerf_synthetic lego, which
    cannot be downloaded in this environment)."""
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    sigma = xp.zeros(pts.shape[:-1], np.float32)
    rgb = xp.zeros(pts.shape[:-1] + (3,), np.float32)

    def add(s, col):
        nonlocal sigma, rgb
        sigma = sigma + s
        rgb = rgb + s[..., None] * col.astype(np.float32)

    # 1. striped sphere (high-frequency albedo on smooth geometry)
    d = xp.linalg.norm(pts - np.array([-0.05, -0.12, 0.0], np.float32), axis=-1) - 0.34
    s = _smoothstep_inside(d, 70.0, 0.005, xp)
    stripe = (xp.sin(x * 46.0) > 0).astype(np.float32)[..., None]
    col = stripe * np.array([0.95, 0.8, 0.12]) + (1 - stripe) * np.array([0.12, 0.22, 0.78])
    add(s, col)

    # 2. 5x5 lattice of thin vertical rods (thin-structure stress)
    pitch = 0.3
    xm = xp.clip(xp.round(x / pitch), -2, 2) * pitch
    zm = xp.clip(xp.round(z / pitch), -2, 2) * pitch
    d_rod = xp.hypot(x - xm, z - zm) - 0.016
    in_y = xp.maximum(xp.abs(y) - 0.55, 0.0)
    d_rod = xp.maximum(d_rod, in_y)
    s = _smoothstep_inside(d_rod, 90.0, 0.004, xp)
    ix = (xm / pitch + 2).astype(np.int32)
    iz = (zm / pitch + 2).astype(np.int32)
    hue = ((ix * 5 + iz) % 6).astype(np.float32)[..., None] / 6.0
    col = xp.concatenate(
        [0.25 + 0.7 * xp.abs(xp.sin(np.pi * (hue + o))) for o in (0.0, 1 / 3, 2 / 3)],
        axis=-1,
    ).reshape(hue.shape[:-1] + (3,))
    add(s, col)

    # 3. checker-textured cube (sharp texture + sharp silhouette)
    q = xp.abs(pts - np.array([0.48, 0.28, -0.42], np.float32)) - 0.17
    d_box = xp.max(q, axis=-1)
    s = _smoothstep_inside(d_box, 80.0, 0.005, xp)
    cells = xp.floor(pts * 9.0).astype(np.int32)
    checker = ((cells[..., 0] + cells[..., 1] + cells[..., 2]) % 2).astype(np.float32)[..., None]
    col = checker * np.array([0.92, 0.92, 0.9]) + (1 - checker) * np.array([0.65, 0.15, 0.12])
    add(s, col)

    rgb = rgb / xp.maximum(sigma[..., None], 1e-8)
    return sigma, rgb


def field_srtex(pts, xp=np) -> Tuple[np.ndarray, np.ndarray]:
    """Super-resolution texture benchmark: smooth, easily-fittable geometry
    (four large thin-shell spheres) carrying band-limited sinusoidal textures
    with ~0.03 world-unit period. At the SR recipe's cameras (radius 2.0,
    fx=0.9*W) that is ~5.3 px/period in the 400^2 HR renders (well resolved)
    but ~1.3 px/period at 100^2 LR — below the LR Nyquist rate, so the
    antialiased LR downscale plus bilinear upsampling destroys it (bilinear
    x4 baseline ~32 dB) while a x4 multiview SR model can recover it. This is
    the regime the reference's SR benchmark (lego 100->400,
    super_resolution/configs/triplane-sr100_400_2.yaml) actually measures;
    ``field_hf`` is unsuitable for that purpose because its discontinuous
    checkers and thin rods cap any volumetric fit near ~23 dB, below the
    bilinear baseline itself."""
    sigma = xp.zeros(pts.shape[:-1], np.float32)
    rgb = xp.zeros(pts.shape[:-1] + (3,), np.float32)
    k = 212.0  # 2*pi / 0.0296 world-units

    def add_sphere(center, r, m, col_a, col_b):
        nonlocal sigma, rgb
        d = xp.linalg.norm(pts - np.asarray(center, np.float32), axis=-1) - r
        # density 100 keeps the visible shell (~1/density deep) thin relative
        # to the texture period, so the volume render preserves texture
        # contrast; width 0.006 stays smooth enough for a high-PSNR fit
        s = _smoothstep_inside(d, 100.0, 0.006, xp)
        col = (m[..., None] * np.asarray(col_a, np.float32)
               + (1.0 - m[..., None]) * np.asarray(col_b, np.float32))
        sigma = sigma + s
        rgb = rgb + s[..., None] * col

    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    # plaid texture in two orientations + radial rings (all smooth/band-limited)
    m1 = 0.5 + 0.5 * xp.sin(k * x) * xp.sin(k * y)
    add_sphere((-0.30, 0.0, 0.05), 0.44, m1, (0.92, 0.86, 0.18), (0.12, 0.20, 0.75))
    m2 = 0.5 + 0.5 * xp.sin(k * y) * xp.sin(k * z)
    add_sphere((0.36, 0.05, -0.14), 0.36, m2, (0.85, 0.20, 0.15), (0.15, 0.80, 0.50))
    r3 = xp.linalg.norm(pts - np.array([0.0, -0.40, 0.16], np.float32), axis=-1)
    m3 = 0.5 + 0.5 * xp.sin(k * r3)
    add_sphere((0.0, -0.40, 0.16), 0.31, m3, (0.90, 0.55, 0.10), (0.20, 0.25, 0.35))
    m4 = 0.5 + 0.5 * xp.sin(k * x) * xp.sin(k * z)
    add_sphere((0.05, 0.44, 0.34), 0.28, m4, (0.25, 0.85, 0.85), (0.55, 0.15, 0.60))

    rgb = rgb / xp.maximum(sigma[..., None], 1e-8)
    return sigma, rgb


def orbit_pose(theta: float, phi: float, radius: float) -> np.ndarray:
    """cam2world in the framework's (ngp-style) convention: camera looks along
    +z of its rotation toward the origin."""
    cx = radius * np.sin(theta) * np.cos(phi)
    cy = radius * np.cos(theta)
    cz = radius * np.sin(theta) * np.sin(phi)
    center = np.array([cx, cy, cz], np.float32)
    forward = -center / np.linalg.norm(center)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    right = np.cross(up, forward)
    right /= np.linalg.norm(right) + 1e-9
    up2 = np.cross(forward, right)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 0] = right
    pose[:3, 1] = up2
    pose[:3, 2] = forward
    pose[:3, 3] = center
    return pose


_FIELDS = {"spheres": field, "hf": field_hf, "srtex": field_srtex}


def _render_views_jax(poses, intrinsics, H, W, num_steps, field_fn,
                      near=0.8, far=3.2, chunk=65536):
    """GT render on the accelerator: jitted lax.scan over depth steps, fixed
    pixel chunks (one compile). ~100x faster than the numpy marcher on this
    one-CPU-core host; bit-for-bit parity with it is not required (both are
    exact quadrature of the same analytic field at the same t samples)."""
    import jax
    import jax.numpy as jnp

    t = np.linspace(near, far, num_steps, dtype=np.float32)
    dt = float(t[1] - t[0])

    @jax.jit
    def render(rays_o, rays_d):
        def body(carry, tk):
            img, acc, T = carry
            pts = rays_o + rays_d * tk
            sigma, rgb = field_fn(pts, xp=jnp)
            alpha = 1.0 - jnp.exp(-sigma * dt)
            w = alpha * T
            return (img + w[:, None] * rgb, acc + w, T * (1.0 - alpha)), None

        n = rays_o.shape[0]
        init = (jnp.zeros((n, 3)), jnp.zeros((n,)), jnp.ones((n,)))
        (img, acc, _), _ = jax.lax.scan(body, init, jnp.asarray(t))
        return img, acc

    n_px = H * W
    chunk = min(chunk, n_px)
    out = []
    for pose in poses:
        rays_o, rays_d = rays_full_image(pose, intrinsics, H, W)
        imgs, accs = [], []
        for s in range(0, n_px, chunk):
            ro, rd = rays_o[s:s + chunk], rays_d[s:s + chunk]
            pad = chunk - ro.shape[0]  # pad the tail chunk: one jit shape
            if pad:
                ro = np.concatenate([ro, np.repeat(ro[-1:], pad, 0)])
                rd = np.concatenate([rd, np.repeat(rd[-1:], pad, 0)])
            im, ac = render(jnp.asarray(ro), jnp.asarray(rd))
            im, ac = np.asarray(im), np.asarray(ac)
            if pad:
                im, ac = im[:-pad], ac[:-pad]
            imgs.append(im)
            accs.append(ac)
        rgba = np.concatenate(
            [np.concatenate(imgs), np.concatenate(accs)[:, None]], axis=-1)
        out.append(rgba.reshape(H, W, 4).astype(np.float32))
    return out


def _render_view(pose, intrinsics, H, W, num_steps=192, near=0.8, far=3.2,
                 field_fn=field):
    rays_o, rays_d = rays_full_image(pose, intrinsics, H, W)
    t = np.linspace(near, far, num_steps, dtype=np.float32)
    dt = t[1] - t[0]
    img = np.zeros((H * W, 3), np.float32)
    acc = np.zeros((H * W,), np.float32)
    T = np.ones((H * W,), np.float32)
    for k in range(num_steps):  # chunk over steps to bound memory
        pts = rays_o + rays_d * t[k]
        sigma, rgb = field_fn(pts)
        alpha = 1.0 - np.exp(-sigma * dt)
        w = alpha * T
        img += w[:, None] * rgb
        acc += w
        T *= 1.0 - alpha
    rgba = np.concatenate([img, acc[:, None]], axis=-1)
    return rgba.reshape(H, W, 4)


def make_synthetic_scene(
    num_views: int = 20,
    H: int = 100,
    W: int = 100,
    radius: float = 2.0,
    seed: int = 0,
    num_steps: int = 192,
    variant: str = "spheres",
    backend: str = "numpy",
) -> SceneData:
    """variant: "spheres" (smooth, easy) or "hf" (checker textures, thin rods
    — the hard quality benchmark; use num_steps >= 384 so the ground-truth
    marcher resolves the thin structures)."""
    field_fn = _FIELDS[variant]
    if variant in ("hf", "srtex"):
        num_steps = max(num_steps, 384)
    rng = np.random.default_rng(seed)
    fx = fy = 0.9 * W
    intr = (fx, fy, W / 2.0, H / 2.0)
    poses = []
    for v in range(num_views):
        theta = np.arccos(1 - 1.6 * (v + 0.5) / num_views)  # avoid poles
        phi = (v * 2.399963) % (2 * np.pi) + rng.uniform(0, 0.1)
        poses.append(orbit_pose(theta, phi, radius))
    if backend == "jax":
        images = _render_views_jax(poses, intr, H, W, num_steps, field_fn)
    else:
        images = [_render_view(pose, intr, H, W, num_steps, field_fn=field_fn)
                  for pose in poses]
    return SceneData(
        images=np.stack(images), poses=np.stack(poses), intrinsics=intr, H=H, W=W
    )


def _ngp_to_blender(pose: np.ndarray) -> np.ndarray:
    """Inverse of nerf_matrix_to_ngp with scale=1, offset=0."""
    b = np.eye(4, dtype=np.float32)
    b[1] = [pose[0, 0], -pose[0, 1], -pose[0, 2], pose[0, 3]]
    b[2] = [pose[1, 0], -pose[1, 1], -pose[1, 2], pose[1, 3]]
    b[0] = [pose[2, 0], -pose[2, 1], -pose[2, 2], pose[2, 3]]
    return b


def write_synthetic_scene(
    root: str,
    num_views: int = 20,
    num_test_views: int = 4,
    H: int = 100,
    W: int = 100,
    seed: int = 0,
    variant: str = "spheres",
) -> str:
    """Write the synthetic scene to disk in Blender transforms format
    (loadable by ``load_blender(root, scale=1.0)``)."""
    import cv2

    os.makedirs(root, exist_ok=True)
    splits = [("train", num_views, seed), ("val", num_test_views, seed + 1),
              ("test", num_test_views, seed + 1)]
    fx = 0.9 * W
    cam_angle_x = 2 * np.arctan(0.5 * W / fx)
    for split, n, s in splits:
        scene = make_synthetic_scene(n, H, W, seed=s, variant=variant)
        frames = []
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for v in range(n):
            name = f"./{split}/r_{v}"
            img = (np.clip(scene.images[v], 0, 1) * 255).astype(np.uint8)
            bgra = img.copy()
            bgra[..., :3] = img[..., 2::-1]
            cv2.imwrite(os.path.join(root, f"{split}/r_{v}.png"), bgra)
            frames.append(
                {
                    "file_path": name,
                    "transform_matrix": _ngp_to_blender(scene.poses[v]).tolist(),
                }
            )
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": float(cam_angle_x), "frames": frames}, f)
    return root
