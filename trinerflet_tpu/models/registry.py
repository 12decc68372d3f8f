"""threestudio-style named registries: geometry / material / background.

The reference's SR app resolves model components by registered name
(``threestudio.register``): geometry from
``super_resolution/threestudio/models/geometry/`` (implicit_volume.py,
volume_grid.py, implicit_sdf.py, ...), materials from ``models/materials/``
(neural_radiance_material.py, no_material.py, ...), backgrounds from
``models/background/`` (solid_color_background.py,
neural_environment_map_background.py, textured_background.py).

TriNeRFLet's own configs use exactly the triple
(implicit-volume, neural-radiance-material, solid-color-background) — that
combination IS :class:`~trinerflet_tpu.models.nerf.NeRFField`, fused for the
TPU hot path. This module provides the named factory plus TPU-native
rewrites of the zoo entries a custom system may swap in:

* geometry ``volume-grid``: dense (R, R, R, 1+F) voxel grid, trilinear
  sampling as ONE flat row-take of packed corner rows (volume_grid.py:31-72).
* material ``no-material``: features -> sigmoid RGB, no view dependence
  (no_material.py:14-49).
* background ``neural-environment-map-background``: SH(view dir) -> MLP ->
  sigmoid (neural_environment_map_background.py:13-49).
* background ``textured-background``: learnable equirectangular texture
  sampled bilinearly by view direction (textured_background.py:12-45).
* background ``solid-color-background``: constant color
  (solid_color_background.py:12-39).

Everything is a pure ``(init, apply)`` pair over plain dict pytrees, so any
combination drops into :func:`render_occgrid`/``render_dense`` via
:class:`RegistryField`, which duck-types the NeRFField interface
(build_planes / density / color / __call__ / background).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.activation import trunc_exp
from ..ops.encoders import sh_encode, sh_dim
from .nerf import NeRFConfig, NeRFField, init_nerf_params, _init_mlp, _mlp

__all__ = [
    "GEOMETRY_REGISTRY", "MATERIAL_REGISTRY", "BACKGROUND_REGISTRY",
    "VolumeGridConfig", "RegistryField", "make_field",
]


# ---------------------------------------------------------------- geometry

@dataclasses.dataclass(frozen=True)
class VolumeGridConfig:
    """Dense voxel-grid geometry (reference volume_grid.py): a learnable
    (R, R, R, 1 + F) grid; channel 0 is raw density, the rest are features."""
    resolution: int = 64
    feature_dim: int = 15
    init_scale: float = 0.1


def init_volume_grid(rng: jax.Array, cfg: VolumeGridConfig) -> Dict:
    R, F = cfg.resolution, cfg.feature_dim
    return {"grid": cfg.init_scale * jax.random.normal(rng, (R, R, R, 1 + F))}


def sample_volume_grid(params: Dict, x: jnp.ndarray, cfg: VolumeGridConfig,
                       bound: float) -> jnp.ndarray:
    """Trilinear sample at x in [-bound, bound]^3 -> (N, 1+F).

    The 8 corner lookups are packed into ONE flat row-take: corners of cell
    (i, j, k) are the rows {i, i+1}x{j, j+1}x{k, k+1} of the flattened grid —
    8 gathers of whole feature rows (the fast ~15 ns/row path, PERF.md), then
    a dense weighted sum. No advanced multi-index anywhere.
    """
    R = cfg.resolution
    g = params["grid"].reshape(R * R * R, -1)
    q = (x / bound * 0.5 + 0.5) * (R - 1)
    q = jnp.clip(q, 0.0, R - 1 - 1e-6)
    q0 = jnp.floor(q).astype(jnp.int32)
    f = q - q0
    out = 0.0
    for dx in (0, 1):
        wx = (1 - f[:, 0]) if dx == 0 else f[:, 0]
        for dy in (0, 1):
            wy = (1 - f[:, 1]) if dy == 0 else f[:, 1]
            for dz in (0, 1):
                wz = (1 - f[:, 2]) if dz == 0 else f[:, 2]
                idx = ((jnp.minimum(q0[:, 0] + dx, R - 1) * R
                        + jnp.minimum(q0[:, 1] + dy, R - 1)) * R
                       + jnp.minimum(q0[:, 2] + dz, R - 1))
                out = out + jnp.take(g, idx, axis=0) * (wx * wy * wz)[:, None]
    return out


# ---------------------------------------------------------------- SDF geometry

@dataclasses.dataclass(frozen=True)
class SDFConfig:
    """Implicit SDF geometry (reference implicit_sdf.py): a signed-distance
    head + feature head on the shared spatial encoding, with a geometric
    bias (``sdf_bias``) so the zero level set starts as a sphere/ellipsoid
    (implicit_sdf.py:224-245; the TPU-native stand-in for the reference's
    shape-init pretraining loop). ``beta`` parameterizes the VolSDF Laplace
    density bridge sigma = (1/beta) * Psi_beta(-sdf) so the SDF field renders
    through the density renderer (the reference pairs ImplicitSDF with a
    NeuS-style renderer; the Laplace CDF is the standard density equivalent
    and keeps every occgrid/compositing path unchanged)."""
    sdf_bias: str = "sphere"       # 'sphere' | 'ellipsoid' | 'none'
    sdf_bias_params: Tuple[float, ...] = (0.5,)
    init_beta: float = 0.1


def shifted_sdf(raw: jnp.ndarray, x: jnp.ndarray, cfg: SDFConfig) -> jnp.ndarray:
    """Apply the geometric bias (implicit_sdf.py get_shifted_sdf)."""
    if cfg.sdf_bias == "sphere":
        r = cfg.sdf_bias_params[0]
        bias = jnp.linalg.norm(x, axis=-1) - r
    elif cfg.sdf_bias == "ellipsoid":
        size = jnp.asarray(cfg.sdf_bias_params, jnp.float32)
        k = jnp.linalg.norm(x / size, axis=-1)
        bias = k * (k - 1.0) / jnp.maximum(
            jnp.linalg.norm(x / (size * size), axis=-1), 1e-8)
    elif cfg.sdf_bias == "none":
        bias = 0.0
    else:
        raise ValueError(f"unknown sdf_bias {cfg.sdf_bias!r}")
    return raw + bias


def laplace_density(sdf: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """VolSDF density: sigma = (1/beta) * Laplace_CDF(-sdf; 0, beta).
    Smooth, positive, ~1/beta deep inside the surface, ->0 outside."""
    beta = jnp.maximum(beta, 1e-4)
    s = -sdf / beta
    # CDF of Laplace(0,1) at s: 0.5 e^s for s<=0, 1 - 0.5 e^-s for s>0
    cdf = jnp.where(s <= 0, 0.5 * jnp.exp(jnp.minimum(s, 0.0)),
                    1.0 - 0.5 * jnp.exp(-jnp.maximum(s, 0.0)))
    return cdf / beta


# ---------------------------------------------------------------- materials

def material_no_material(params: Dict, d: jnp.ndarray, geo_feat: jnp.ndarray,
                         dtype) -> jnp.ndarray:
    """RGB directly from the first 3 feature channels (no_material.py):
    view-independent sigmoid color; needs geo_feat_dim >= 3."""
    del params, d, dtype
    return jax.nn.sigmoid(geo_feat[..., :3].astype(jnp.float32))


def material_diffuse_point_light(
    geo_feat: jnp.ndarray,        # (N, F) features; albedo = sigmoid(first 3)
    positions: jnp.ndarray,       # (N, 3) world sample positions
    shading_normal: jnp.ndarray,  # (N, 3) unit normals
    light_positions: jnp.ndarray, # (N, 3) or (3,) point-light position(s)
    ambient_light_color=(0.1, 0.1, 0.1),
    diffuse_light_color=(0.9, 0.9, 0.9),
    shading: str = "diffuse",
) -> jnp.ndarray:
    """Lambertian point-light shading
    (diffuse_with_point_light_material.py:43-110): albedo = sigmoid(feat[:3]);
    diffuse = max(0, n . normalize(light - x)) * diffuse_color;
    'albedo' | 'textureless' | 'diffuse' select the training augmentations."""
    albedo = jax.nn.sigmoid(geo_feat[..., :3].astype(jnp.float32))
    if shading == "albedo":
        return albedo
    amb = jnp.asarray(ambient_light_color, jnp.float32)
    dif = jnp.asarray(diffuse_light_color, jnp.float32)
    lp = jnp.broadcast_to(jnp.asarray(light_positions, jnp.float32),
                          positions.shape)
    ldir = lp - positions
    ldir = ldir / jnp.maximum(jnp.linalg.norm(ldir, axis=-1, keepdims=True), 1e-8)
    lambert = jnp.clip((shading_normal * ldir).sum(-1, keepdims=True), 0.0, None)
    textureless = lambert * dif + amb
    if shading == "textureless":
        return jnp.broadcast_to(textureless, albedo.shape)
    if shading == "diffuse":
        return jnp.clip(albedo, 0.0, 1.0) * textureless
    raise ValueError(f"unknown shading {shading!r}")


# -------------------------------------------------------------- backgrounds

def init_env_map_bg(rng: jax.Array, cfg: NeRFConfig) -> Dict:
    dims = ([sh_dim(cfg.sh_degree)]
            + [cfg.hidden_dim_bg] * (cfg.num_layers_bg - 1) + [3])
    return {"env_net": _init_mlp(rng, dims)}


def background_env_map(params: Dict, d: jnp.ndarray, cfg: NeRFConfig,
                       dtype) -> jnp.ndarray:
    """Direction-conditioned MLP background
    (neural_environment_map_background.py: dir encoding -> MLP -> sigmoid)."""
    sh = sh_encode(d, cfg.sh_degree).astype(dtype)
    return jax.nn.sigmoid(_mlp(params["env_net"], sh, dtype).astype(jnp.float32))


def init_textured_bg(rng: jax.Array, height: int = 64, width: int = 128) -> Dict:
    return {"bg_texture": 0.1 * jax.random.normal(rng, (height, width, 3))}


def background_textured(params: Dict, d: jnp.ndarray) -> jnp.ndarray:
    """Equirectangular learnable texture (textured_background.py): direction
    -> (theta, phi) -> bilinear texel blend, sigmoid color. The 4 texel
    lookups ride flat row-takes of the (H*W, 3) texture."""
    tex = params["bg_texture"]
    H, W = tex.shape[:2]
    flat = tex.reshape(H * W, 3)
    dn = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    theta = jnp.arccos(jnp.clip(dn[:, 1], -1.0, 1.0))          # [0, pi]
    phi = jnp.arctan2(dn[:, 0], dn[:, 2]) + jnp.pi             # [0, 2pi]
    v = jnp.clip(theta / jnp.pi * (H - 1), 0.0, H - 1 - 1e-6)
    u = jnp.clip(phi / (2 * jnp.pi) * (W - 1), 0.0, W - 1 - 1e-6)
    v0, u0 = jnp.floor(v).astype(jnp.int32), jnp.floor(u).astype(jnp.int32)
    fv, fu = v - v0, u - u0
    out = 0.0
    for dv in (0, 1):
        wv = (1 - fv) if dv == 0 else fv
        for du in (0, 1):
            wu = (1 - fu) if du == 0 else fu
            idx = jnp.minimum(v0 + dv, H - 1) * W + jnp.minimum(u0 + du, W - 1)
            out = out + jnp.take(flat, idx, axis=0) * (wv * wu)[:, None]
    return jax.nn.sigmoid(out)


def background_solid(params: Dict, d: jnp.ndarray, color: float) -> jnp.ndarray:
    del params
    return jnp.full((d.shape[0], 3), color, jnp.float32)


GEOMETRY_REGISTRY = ("implicit-volume", "volume-grid", "implicit-sdf")
MATERIAL_REGISTRY = ("neural-radiance-material", "no-material",
                     "diffuse-with-point-light-material")
BACKGROUND_REGISTRY = ("solid-color-background",
                       "neural-environment-map-background",
                       "textured-background")
NORMAL_TYPES = ("none", "finite_difference", "finite_difference_laplacian",
                "analytic", "pred")


# ------------------------------------------------------------------- field

class RegistryField:
    """NeRFField-compatible field assembled from registry names.

    Defaults reproduce NeRFField exactly (same param tree); non-default
    geometry swaps the spatial encoding, non-default material/background swap
    the shading/background heads. Renderers only see the duck-typed
    interface, so any combination runs through render_occgrid/render_dense
    and the Trainer unchanged.
    """

    def __init__(self, cfg: NeRFConfig,
                 geometry: str = "implicit-volume",
                 material: str = "neural-radiance-material",
                 background: str = "solid-color-background",
                 grid_cfg: Optional[VolumeGridConfig] = None,
                 sdf_cfg: Optional[SDFConfig] = None,
                 background_color: float = 0.0,
                 normal_type: str = "none",
                 fd_normal_eps: float = 0.01,
                 light_position=(2.0, 2.0, 2.0),
                 ambient_light_color=(0.1, 0.1, 0.1),
                 diffuse_light_color=(0.9, 0.9, 0.9)):
        if geometry not in GEOMETRY_REGISTRY:
            raise ValueError(f"unknown geometry {geometry!r}; have {GEOMETRY_REGISTRY}")
        if material not in MATERIAL_REGISTRY:
            raise ValueError(f"unknown material {material!r}; have {MATERIAL_REGISTRY}")
        if background not in BACKGROUND_REGISTRY:
            raise ValueError(f"unknown background {background!r}; have {BACKGROUND_REGISTRY}")
        if normal_type not in NORMAL_TYPES:
            raise ValueError(f"unknown normal_type {normal_type!r}; have {NORMAL_TYPES}")
        self.cfg = cfg
        self.geometry = geometry
        self.material = material
        self.bg_kind = background
        self.background_color = background_color
        self.grid_cfg = grid_cfg or VolumeGridConfig(feature_dim=cfg.geo_feat_dim)
        self.sdf_cfg = sdf_cfg or SDFConfig()
        self._inner = NeRFField(cfg)
        self.dtype = self._inner.dtype
        # normals (reference implicit_volume.py:48-51 normal_type and
        # :141-186 implementations); the diffuse material requires them
        self.requires_normal = material == "diffuse-with-point-light-material"
        if self.requires_normal and normal_type == "none":
            normal_type = "finite_difference"
        self.normal_type = normal_type
        self.fd_normal_eps = fd_normal_eps
        self.light_position = tuple(light_position)
        self.ambient_light_color = tuple(ambient_light_color)
        self.diffuse_light_color = tuple(diffuse_light_color)
        # analytic normals differentiate density w.r.t. POSITIONS, which the
        # quad-packed fast sampler deliberately drops (ops/grid_sample.py);
        # a sibling field with the gradient-exact sampler serves that path
        # (same params/planes — fast_sampler only changes the sampling op)
        if normal_type == "analytic" and cfg.encoding == "triplane_wavelet":
            exact_cfg = dataclasses.replace(
                cfg, triplane=dataclasses.replace(cfg.triplane,
                                                  fast_sampler=False))
            self._exact_inner = NeRFField(exact_cfg)
        else:
            self._exact_inner = self._inner

    # -- params
    def init_params(self, rng: jax.Array) -> Dict:
        k_nerf, k_geo, k_bg, k_nrm = jax.random.split(rng, 4)
        params = init_nerf_params(k_nerf, self.cfg)
        if self.geometry == "volume-grid":
            params["encoder"] = init_volume_grid(k_geo, self.grid_cfg)
            # sigma net consumes the grid's features directly: channel 0 is
            # raw density, so the MLP stack is bypassed (volume_grid.py has
            # no decoder net either)
            params.pop("sigma_net")
        elif self.geometry == "implicit-sdf":
            # sdf + feature heads on the shared encoding
            # (implicit_sdf.py:61-90 sdf_network/feature_network); the
            # triplane/hash encoder params stay as-is
            k_sdf, k_feat = jax.random.split(k_geo)
            params.pop("sigma_net")
            params["sdf_net"] = _init_mlp(
                k_sdf, [self.cfg.in_dim, self.cfg.hidden_dim, 1])
            params["feature_net"] = _init_mlp(
                k_feat, [self.cfg.in_dim, self.cfg.hidden_dim,
                         self.cfg.geo_feat_dim])
            params["log_beta"] = jnp.log(
                jnp.asarray(self.sdf_cfg.init_beta, jnp.float32))
        if self.bg_kind == "neural-environment-map-background":
            params.update(init_env_map_bg(k_bg, self.cfg))
        elif self.bg_kind == "textured-background":
            params.update(init_textured_bg(k_bg))
        if self.normal_type == "pred":
            # normal head on the spatial ENCODING (implicit_volume.py:216-218
            # normal_network(enc)), mirrored MLP shape
            enc_dim = (1 + self.grid_cfg.feature_dim
                       if self.geometry == "volume-grid" else self.cfg.in_dim)
            params["normal_net"] = _init_mlp(
                k_nrm, [enc_dim, self.cfg.hidden_dim, 3])
        return params

    # -- NeRFField interface
    def build_planes(self, params: Dict, max_resolution: int = -1) -> Dict:
        if self.geometry == "volume-grid":
            return {}
        return self._inner.build_planes(params, max_resolution)

    def density(self, params: Dict, planes: Dict, x: jnp.ndarray,
                resolution_mode: str = "full") -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.geometry == "volume-grid":
            feats = sample_volume_grid(params["encoder"], x, self.grid_cfg,
                                       self.cfg.bound)
            sigma = trunc_exp(self._inner._density_blob(x, feats[..., 0]))
            return sigma, feats[..., 1:]
        if self.geometry == "implicit-sdf":
            enc = self._encode(params, planes, x).astype(self.dtype)
            sdf = self.sdf(params, planes, x, enc=enc)
            feats = _mlp(params["feature_net"], enc, self.dtype)
            sigma = laplace_density(sdf, jnp.exp(params["log_beta"]))
            return sigma, feats.astype(jnp.float32)
        return self._inner.density(params, planes, x, resolution_mode)

    def sdf(self, params: Dict, planes: Dict, x: jnp.ndarray,
            enc: Optional[jnp.ndarray] = None,
            exact: bool = False) -> jnp.ndarray:
        """Shifted signed distance (implicit_sdf.py forward_sdf +
        get_shifted_sdf). Only for geometry='implicit-sdf'."""
        if enc is None:
            enc = self._encode(params, planes, x,
                               exact=exact).astype(self.dtype)
        raw = _mlp(params["sdf_net"], enc, self.dtype)[..., 0]
        return shifted_sdf(raw.astype(jnp.float32), x, self.sdf_cfg)

    def _encode(self, params: Dict, planes: Dict, x: jnp.ndarray,
                exact: bool = False) -> jnp.ndarray:
        """Raw spatial encoding (the 'enc' the reference's pred-normal head
        consumes, implicit_volume.py:216). ``exact`` switches off the
        quad-packed sampler so the encoding carries coordinate gradients
        (needed for analytic SDF normals)."""
        if self.geometry == "volume-grid":
            return sample_volume_grid(params["encoder"], x, self.grid_cfg,
                                      self.cfg.bound)
        from .triplane import sample_triplane

        tri = self.cfg.triplane
        if exact and tri.fast_sampler:
            tri = dataclasses.replace(tri, fast_sampler=False)
        return sample_triplane(planes, x, tri, lbound=self.cfg.bound,
                               enc_params=params["encoder"])

    def _density_only(self, params: Dict, planes: Dict, x: jnp.ndarray,
                      exact: bool = False) -> jnp.ndarray:
        if self.geometry == "volume-grid":
            feats = sample_volume_grid(params["encoder"], x, self.grid_cfg,
                                       self.cfg.bound)
            return trunc_exp(self._inner._density_blob(x, feats[..., 0]))
        inner = self._exact_inner if exact else self._inner
        return inner.density(params, planes, x)[0]

    def normal(self, params: Dict, planes: Dict, x: jnp.ndarray) -> jnp.ndarray:
        """Unit shading normals per ``normal_type``
        (implicit_volume.py:141-218):

        * ``finite_difference``: forward difference of density over +eps
          offsets, ``n = -normalize(d(x + eps e_i) - d(x))``.
        * ``finite_difference_laplacian``: central difference over the 6-point
          stencil (the reference's misnomer for the symmetric stencil).
        * ``analytic``: ``-normalize(grad_x density)`` via jax.grad through the
          gradient-exact sampler (the quad sampler drops coordinate grads).
        * ``pred``: a small MLP head on the spatial encoding.

        For ``implicit-sdf`` geometry the differenced scalar is the SDF with
        a POSITIVE gradient sign (outward; implicit_sdf.py:275-335) instead
        of the density's negative.
        """
        b = self.cfg.bound
        if self.geometry == "implicit-sdf":
            scalar = lambda p, exact=False: self.sdf(params, planes, p,
                                                     exact=exact)
            sign = 1.0
        else:
            scalar = lambda p, exact=False: self._density_only(
                params, planes, p, exact=exact)
            sign = -1.0
        if self.normal_type in ("finite_difference",
                                "finite_difference_laplacian"):
            eps = self.fd_normal_eps
            if self.normal_type == "finite_difference_laplacian":
                offs = jnp.asarray(
                    [[eps, 0, 0], [-eps, 0, 0], [0, eps, 0],
                     [0, -eps, 0], [0, 0, eps], [0, 0, -eps]], jnp.float32)
                pts = jnp.clip(x[:, None, :] + offs[None], -b, b)
                dd = scalar(pts.reshape(-1, 3))
                dd = dd.reshape(-1, 6)
                g = sign * 0.5 * (dd[:, 0::2] - dd[:, 1::2]) / eps
            else:
                offs = eps * jnp.eye(3, dtype=jnp.float32)
                pts = jnp.clip(x[:, None, :] + offs[None], -b, b)
                dd = scalar(pts.reshape(-1, 3))
                d0 = scalar(x)
                g = sign * (dd.reshape(-1, 3) - d0[:, None]) / eps
        elif self.normal_type == "analytic":
            g = sign * jax.grad(lambda p: scalar(p, exact=True).sum())(x)
        elif self.normal_type == "pred":
            enc = self._encode(params, planes, x).astype(self.dtype)
            g = _mlp(params["normal_net"], enc, self.dtype).astype(jnp.float32)
        else:
            raise ValueError(
                f"normal_type {self.normal_type!r} cannot produce normals")
        return g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-8)

    def color(self, params: Dict, d: jnp.ndarray, geo_feat: jnp.ndarray,
              x: Optional[jnp.ndarray] = None, planes: Optional[Dict] = None,
              shading: str = "diffuse") -> jnp.ndarray:
        if self.material == "no-material":
            return material_no_material(params, d, geo_feat, self.dtype)
        if self.material == "diffuse-with-point-light-material":
            if x is None:
                raise ValueError(
                    "diffuse-with-point-light-material needs sample positions;"
                    " call the field (__call__) or pass x= explicitly")
            n = self.normal(params, planes or {}, x)
            return material_diffuse_point_light(
                geo_feat, x, n, jnp.asarray(self.light_position),
                self.ambient_light_color, self.diffuse_light_color, shading)
        return self._inner.color(params, d, geo_feat)

    def __call__(self, params: Dict, planes: Dict, x: jnp.ndarray, d: jnp.ndarray,
                 resolution_mode: str = "full"):
        sigma, geo = self.density(params, planes, x, resolution_mode)
        return sigma, self.color(params, d, geo, x=x, planes=planes)

    def background(self, params: Dict, d: jnp.ndarray) -> jnp.ndarray:
        if self.bg_kind == "neural-environment-map-background":
            return background_env_map(params, d, self.cfg, self.dtype)
        if self.bg_kind == "textured-background":
            return background_textured(params, d)
        return background_solid(params, d, self.background_color)


def make_field(cfg: NeRFConfig,
               geometry: str = "implicit-volume",
               material: str = "neural-radiance-material",
               background: str = "solid-color-background",
               **kw) -> Tuple[Callable[[jax.Array], Dict], object]:
    """Resolve registry names -> (init_fn, field). The TriNeRFLet default
    triple returns the fused NeRFField fast path unchanged."""
    if (geometry, material, background) == (
        "implicit-volume", "neural-radiance-material", "solid-color-background"
    ):
        field = NeRFField(cfg)
        return (lambda rng: init_nerf_params(rng, cfg)), field
    field = RegistryField(cfg, geometry, material, background, **kw)
    return field.init_params, field
