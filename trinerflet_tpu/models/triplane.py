"""Multiscale wavelet triplane encoder — the paper's core primitive.

TPU-native redesign of the reference ``TriPlaneVolume``
(reconstruction/triplaneencoder/triplane_encoder.py:26-530 and the SR variant
super_resolution/threestudio/models/triplaneencoder/triplane_encoder.py):

* learnable parameters = a low-resolution base plane + per-level wavelet
  detail coefficients (+ optional nested "upscale" detail levels),
* the full-resolution triplane is reconstructed by repeated single-level
  inverse DWTs with ``yl = 2*x`` scaling and the pad-to-double trick
  (triplane_encoder.py:364-405),
* 3D points are projected onto the three axis-aligned planes and bilinearly
  sampled with border clamping (triplane_encoder.py:314-332).

Design differences from the reference (deliberate, TPU-first):
* parameters are a plain pytree (dict) — cross-stage "checkpoint surgery"
  (growing the pyramid between multiscale stages) is a dict merge instead of
  ``load_state_dict(strict=False)``,
* planes are built once per jitted step (pure function of params) — the
  reference's ``last_used_planes`` cache becomes ordinary common-subexpression
  reuse inside the compiled step,
* planes are stored channel-last ``(3, H, W, C)`` for TPU-friendly gathers.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import wavelets as W
from ..ops.grid_sample import (sample_planes, sample_planes_corner,
                               sample_planes_quad)

__all__ = ["TriplaneConfig", "init_triplane_params", "build_planes", "sample_triplane", "wavelet_l1"]


def get_levels(scale: int) -> int:
    """scale -> number of doublings (reference triplaneencoder/utils.py:274)."""
    lv = int(round(math.log2(scale)))
    assert 2**lv == scale, f"scale must be a power of two, got {scale}"
    return lv


@dataclasses.dataclass(frozen=True)
class TriplaneConfig:
    channels: int = 16                  # C per plane (--triplane_channels)
    resolution: int = 512               # full-res plane size (--triplane_resolution)
    wavelet_scale: int = 8              # 'levels' flag == upscale factor (--triplane_wavelet_levels)
    wavelet_type: str = "bior6.8"
    lbound: float = 1.0                 # coordinate half-extent mapped onto the plane
    init_sigma: float = 0.1
    wavelet_base_resolution: int = 0    # gate for the pad/crop (--wavelet_base_resolution)
    current_scale: int = 1              # inner_multi_res_scale_current: top levels frozen at 0
    # recon-only zoom-in upscale mode (--upscale_ratio_bound/--upscale_levels)
    upscale_ratio_bound: float = -1.0
    upscale_levels: int = 2
    # SR dual-resolution snapshots (threestudio triplane_encoder.py:268-348)
    low_res_scale: int = 1              # snapshot planes at resolution/low_res_scale
    high_res_scale: int = 1
    # quad-packed sampler: 1 gather/scatter per plane instead of 4 (PERF.md);
    # identical values, but NO coordinate gradients — disable where the
    # encoder must be differentiated w.r.t. positions (SR analytic normals)
    fast_sampler: bool = True
    # resolution cap for the quad-packed table, paired with a ~1.3 GB/plane
    # byte cap on the (H, W, 4C) buffer (sample_features.pick_sampler).
    # bf16 planes at 2048^2/32ch fit (1.07 GB transient) and the one
    # 256 B-row take is 6.7x faster than the corner sampler's four 64 B
    # takes (69.9 -> 10.5 ms/plane fwd + 14.9 ms table build, measured
    # scripts/bench_2048_sampler.py; full step 612 -> 451 ms); f32 planes
    # at that size exceed the byte cap and keep the 4-corner sampler.
    quad_max_resolution: int = 2048
    # experimental reference variants (triplane_encoder.py:335-362, :304-312):
    # a learnable global rotation of the sample coords (quaternion) and a
    # learnable zoom of the plane extent. Both need coordinate gradients, so
    # enabling either switches off the quad sampler automatically.
    learned_rotation: bool = False
    lbound_auto_scale: bool = False

    @property
    def levels(self) -> int:
        return get_levels(self.wavelet_scale)

    @property
    def feature_dim(self) -> int:
        return 3 * self.channels

    @property
    def base_resolution(self) -> int:
        base, _ = W.wavelet_pyramid_shapes(
            self.resolution, self.levels, self.wavelet_type, self.wavelet_base_resolution
        )
        return base

    @property
    def yh_sizes(self) -> Tuple[int, ...]:
        _, sizes = W.wavelet_pyramid_shapes(
            self.resolution, self.levels, self.wavelet_type, self.wavelet_base_resolution
        )
        return tuple(sizes)

    @property
    def num_learnable_levels(self) -> int:
        # levels with index < levels - get_levels(current_scale) are learnable
        # (triplane_encoder.py:218-221)
        return self.levels - get_levels(self.current_scale)

    @property
    def upscale_enabled(self) -> bool:
        return 0.0 < self.upscale_ratio_bound < 1.0


def _upscale_geometry(cfg: TriplaneConfig) -> Tuple[List[int], List[int], List[float]]:
    """Nested crop geometry (triplane_encoder.py:96-128): per level, crop the
    center ratio_bound of the plane and refine it by one extra wavelet level."""
    res = cfg.resolution
    sizes, corners, bounds = [], [], []
    for level in range(cfg.upscale_levels):
        base = round(res * cfg.upscale_ratio_bound)
        assert res % base == 0, "upscale_ratio_bound must evenly divide the plane"
        corners.append(round(res / 2 - base / 2))
        sizes.append(base)
        bounds.append(cfg.upscale_ratio_bound ** (level + 1))
        res = 2 * base
    return sizes, corners, bounds


def init_triplane_params(rng: jax.Array, cfg: TriplaneConfig) -> Dict:
    """Base plane ~ N(0, init_sigma); wavelet detail levels zero-init
    (triplane_encoder.py:210-223)."""
    params: Dict = {}
    base = cfg.base_resolution
    params["base"] = cfg.init_sigma * jax.random.normal(
        rng, (3, cfg.channels, base, base), jnp.float32
    )
    wl = {}
    for i in range(cfg.num_learnable_levels):
        s = cfg.yh_sizes[i]
        wl[f"level_{i}"] = jnp.zeros((3, cfg.channels, 3, s, s), jnp.float32)
    params["wavelets"] = wl
    if cfg.upscale_enabled:
        sizes, _, _ = _upscale_geometry(cfg)
        params["upscale"] = {
            f"level_{i}": jnp.zeros((3, cfg.channels, 3, s, s), jnp.float32)
            for i, s in enumerate(sizes)
        }
    if cfg.learned_rotation:
        params["rotation"] = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)  # quat
    if cfg.lbound_auto_scale:
        params["lbound_scale"] = jnp.ones((), jnp.float32)
    return params


def _quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    q = q / jnp.linalg.norm(q)
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)]),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)]),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]),
    ])


def _idwt_ladder(
    x: jnp.ndarray,
    yh_list: List[Optional[jnp.ndarray]],
    yh_sizes: Tuple[int, ...],
    cfg: TriplaneConfig,
    snapshots: Tuple[int, ...] = (),
) -> Tuple[jnp.ndarray, Dict[int, jnp.ndarray]]:
    """Run the inverse pyramid (triplane_encoder.py:371-396): per level,
    yl = 2*x, yh = learned coefs or zeros, pad both when gated, IDWT.
    ``snapshots`` lists resolutions at which to also return the intermediate."""
    pad = W.idwt_pad(cfg.wavelet_type)
    snaps: Dict[int, jnp.ndarray] = {}
    for i in range(len(yh_sizes)):
        if x.shape[-1] in snapshots:
            snaps[x.shape[-1]] = x
        yl = 2.0 * x
        yh = yh_list[i]
        if yh is None:
            s = yh_sizes[i]
            yh = jnp.zeros((3, cfg.channels, 3, s, s), x.dtype)
        if yl.shape[-1] >= cfg.wavelet_base_resolution and pad > 0:
            yl = jnp.pad(yl, [(0, 0), (0, 0), (pad, pad), (pad, pad)])
            yh = jnp.pad(yh, [(0, 0), (0, 0), (0, 0), (pad, pad), (pad, pad)])
        x = W.idwt2d(yl, yh, cfg.wavelet_type)
    if x.shape[-1] in snapshots:
        snaps[x.shape[-1]] = x
    return x, snaps


def build_planes(
    params: Dict,
    cfg: TriplaneConfig,
    max_resolution: int = -1,
) -> Dict[str, jnp.ndarray]:
    """Reconstruct sampling-ready planes from wavelet parameters.

    Returns a dict with key ``"full"`` of shape (3, H, W, C) (channel-last),
    plus ``"low_res"``/``"high_res"`` snapshots when the SR dual-resolution
    scales are configured, plus ``"upscale_0..k"`` nested zoom planes when
    upscale mode is enabled.

    ``max_resolution`` truncates the ladder early (reference get_planes
    max_res; used e.g. by the density-grid refresh which only needs 2*grid
    resolution, triplane_encoder.py:500).
    """
    yh_sizes = cfg.yh_sizes
    n_learn = cfg.num_learnable_levels
    yh_list: List[Optional[jnp.ndarray]] = [
        params["wavelets"][f"level_{i}"] if i < n_learn else None
        for i in range(cfg.levels)
    ]
    # early stop at max_resolution (build only as many levels as needed)
    sizes_after = list(yh_sizes[1:]) + [cfg.resolution]
    n_levels = cfg.levels
    if max_resolution > 0:
        n_levels = next(
            (i + 1 for i, s in enumerate(sizes_after) if s >= max_resolution),
            cfg.levels,
        )
    snapshots = []
    if cfg.low_res_scale > 1:
        snapshots.append(cfg.resolution // cfg.low_res_scale)
    if cfg.high_res_scale > 1:
        snapshots.append(cfg.resolution // cfg.high_res_scale)

    x, snaps = _idwt_ladder(
        params["base"], yh_list[:n_levels], yh_sizes[:n_levels], cfg, tuple(snapshots)
    )

    def to_sample_layout(p):  # (3, C, H, W) -> (3, H, W, C)
        return jnp.transpose(p, (0, 2, 3, 1))

    out = {"full": to_sample_layout(x)}
    if cfg.low_res_scale > 1:
        out["low_res"] = to_sample_layout(snaps[cfg.resolution // cfg.low_res_scale])
    if cfg.high_res_scale > 1:
        key = cfg.resolution // cfg.high_res_scale
        out["high_res"] = to_sample_layout(snaps[key]) if key in snaps else out["full"]
    if cfg.upscale_enabled and max_resolution <= 0:
        sizes, corners, _ = _upscale_geometry(cfg)
        cur = x
        for level in range(cfg.upscale_levels):
            c, s = corners[level], sizes[level]
            crop = cur[:, :, c : c + s, c : c + s]
            cur, _ = _idwt_ladder(
                crop, [params["upscale"][f"level_{level}"]], (s,), cfg
            )
            out[f"upscale_{level}"] = to_sample_layout(cur)
    return out


# Plane projection bases (create_subplanes_trivial_base,
# triplane_encoder.py:250-289): plane 0 spans (x, z), plane 1 (x, y),
# plane 2 (y, z); grid u-axis = first basis vector, v-axis = second.
_PLANE_AXES = np.array(
    [
        [[1.0, 0.0], [0.0, 0.0], [0.0, 1.0]],  # up:    u=x, v=z
        [[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]],  # front: u=x, v=y
        [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]],  # right: u=y, v=z
    ],
    dtype=np.float32,
)  # (3 planes, 3 coords, 2 plane dims)


def project_to_planes(coords: jnp.ndarray, lbound: float) -> jnp.ndarray:
    """(N, 3) world coords -> (3, N, 2) per-plane grid coords in [-1, 1]
    (up to border clamping done by the sampler)."""
    # _PLANE_AXES is a 0/1 axis-selection basis, so the projection is pure
    # coordinate slicing — keep it off the MXU (a (N,3)x(3,6) dot per field
    # eval for no reason); slicing is exact and differentiable
    c = coords / lbound
    return jnp.stack(
        [
            jnp.stack([c[:, 0], c[:, 2]], axis=-1),  # up:    u=x, v=z
            jnp.stack([c[:, 0], c[:, 1]], axis=-1),  # front: u=x, v=y
            jnp.stack([c[:, 1], c[:, 2]], axis=-1),  # right: u=y, v=z
        ],
        axis=0,
    )


def sample_triplane(
    planes: Dict[str, jnp.ndarray],
    coords: jnp.ndarray,
    cfg: TriplaneConfig,
    lbound: Optional[float] = None,
    resolution_mode: str = "full",
    enc_params: Optional[Dict] = None,
) -> jnp.ndarray:
    """Sample features for (N, 3) coords in [-lbound, lbound]^3 -> (N, 3C).

    In upscale mode, points are routed by their inf-norm into the nested
    zoom planes (triplane_encoder.py:453-483) — implemented with masked
    blending instead of boolean gather/scatter (static shapes).

    ``enc_params`` supplies the learned-rotation quaternion / lbound zoom
    when those variants are enabled (they differentiate through the sample
    coordinates, so the gradient-exact sampler is used).
    """
    lb = cfg.lbound if lbound is None else lbound
    N = coords.shape[0]

    transform_learned = False
    if enc_params is not None:
        if cfg.learned_rotation and "rotation" in enc_params:
            coords = coords @ _quat_to_matrix(enc_params["rotation"]).T
            transform_learned = True
        if cfg.lbound_auto_scale and "lbound_scale" in enc_params:
            lb = lb * enc_params["lbound_scale"]
            transform_learned = True

    def pick_sampler(plane_stack):
        if transform_learned or not cfg.fast_sampler:
            return sample_planes
        _, H, W, C = plane_stack.shape
        table_bytes = H * W * 4 * C * plane_stack.dtype.itemsize
        if H > cfg.quad_max_resolution or table_bytes > 1.3e9:
            return sample_planes_corner
        return sample_planes_quad

    def flat_sample(plane_stack, bound):
        pc = project_to_planes(coords, bound)
        feats = pick_sampler(plane_stack)(plane_stack, pc)  # (N, 3, C)
        return feats.reshape(N, -1)

    if not cfg.upscale_enabled or "upscale_0" not in planes:
        return flat_sample(planes[resolution_mode], lb)

    _, _, ratio_bounds = _upscale_geometry(cfg)
    coords_max = jnp.max(jnp.abs(coords), axis=-1)
    out = flat_sample(planes["full"], lb)
    taken = jnp.zeros((N,), bool)
    for level in range(cfg.upscale_levels):
        lb_up = ratio_bounds[level] * lb
        if level < cfg.upscale_levels - 1:
            lb_next = ratio_bounds[level + 1] * lb
            in_level = (coords_max <= lb_up) & (coords_max > lb_next)
        else:
            in_level = coords_max <= lb_up
        vals = flat_sample(planes[f"upscale_{level}"], lb_up)
        use = in_level & ~taken
        out = jnp.where(use[:, None], vals, out)
        taken = taken | in_level
    return out


def wavelet_l1(params: Dict, cfg: TriplaneConfig, weighted: bool = False) -> jnp.ndarray:
    """Wavelet sparsity regularizer with element-count weighting
    (reference nerf/utils.py:640-663): sum over levels of
    mean|coefs| * (numel / total) [/ n_levels], finest-first 1/4^i weights in
    weighted mode; plus 1/4^(i+1)-weighted terms for upscale levels."""
    levels = [params["wavelets"][f"level_{i}"] for i in range(cfg.num_learnable_levels)]
    if not levels:
        return jnp.asarray(0.0, jnp.float32)
    total = sum(v.size for v in levels)
    if weighted:
        terms = [
            (1.0 / 4**i) * jnp.abs(v).mean() * (v.size / total)
            for i, v in enumerate(reversed(levels))
        ]
        reg = sum(terms)
    else:
        reg = sum(jnp.abs(v).mean() * (v.size / total) for v in levels) / len(levels)
    if cfg.upscale_enabled and "upscale" in params:
        ups = [params["upscale"][f"level_{i}"] for i in range(cfg.upscale_levels)]
        reg = reg + sum(
            jnp.abs(v).mean() * (1.0 / 4 ** (i + 1)) * (v.size / total)
            for i, v in enumerate(ups)
        )
    return reg


def grow_params(old_params: Dict, old_cfg: TriplaneConfig, new_cfg: TriplaneConfig, rng: jax.Array) -> Dict:
    """Cross-stage parameter surgery: the multiscale schedule's
    ``load_state_dict(strict=False)`` equivalent (nerf/utils.py:1482-1487).
    Copies the base plane and all shape-matching wavelet levels into a freshly
    initialized pyramid for the new stage."""
    new_params = init_triplane_params(rng, new_cfg)
    if old_params["base"].shape == new_params["base"].shape:
        new_params["base"] = old_params["base"]
    for k, v in old_params["wavelets"].items():
        if k in new_params["wavelets"] and new_params["wavelets"][k].shape == v.shape:
            new_params["wavelets"][k] = v
    if "upscale" in old_params and "upscale" in new_params:
        for k, v in old_params["upscale"].items():
            if k in new_params["upscale"] and new_params["upscale"][k].shape == v.shape:
                new_params["upscale"][k] = v
    for k in ("rotation", "lbound_scale"):
        if k in old_params and k in new_params:
            new_params[k] = old_params[k]
    return new_params
