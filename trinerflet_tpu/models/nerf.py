"""NeRF field: triplane encoding + sigma / color / background MLPs.

Mirrors the reference ``NeRFNetwork`` (reconstruction/nerf/network.py:10-147):
  * sigma net: bias-free Linear stack (in -> hidden^(L-1) -> 1 + geo_feat),
    ReLU between layers, ``trunc_exp`` density activation with optional
    gaussian density blob (network.py:111-132),
  * color net: input = SH(view dir) ++ geo_feat, bias-free Linear stack,
    sigmoid RGB (network.py:137-146),
  * optional background net on a sphere (network.py:168-183).

TPU design: the MLPs are plain matmul chains over large point batches — MXU
work. Weights live in float32; matmuls can run in bfloat16 with float32
accumulation (``compute_dtype``), replacing the reference's fp16 AMP +
GradScaler with TPU-native mixed precision.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.activation import trunc_exp
from ..ops.encoders import sh_encode, sh_dim
from .triplane import TriplaneConfig, build_planes, sample_triplane, init_triplane_params

__all__ = ["NeRFConfig", "init_nerf_params", "NeRFField"]


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    # spatial encoding: "triplane_wavelet" (default), "hashgrid", "tiledgrid",
    # "frequency", "k_planes", "multiscale_k_planes[_mul]"
    # (factory parity with reference encoding.py:get_encoder)
    encoding: str = "triplane_wavelet"
    triplane: TriplaneConfig = dataclasses.field(default_factory=TriplaneConfig)
    grid: Optional[object] = None       # GridEncoderConfig override
    kplanes: Optional[object] = None    # KPlanesConfig override
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    sh_degree: int = 4
    bound: float = 1.0
    density_scale: float = 1.0
    density_blob_scale: float = 0.0
    density_blob_std: float = 0.5
    bg_radius: float = -1.0
    num_layers_bg: int = 2
    hidden_dim_bg: int = 64
    compute_dtype: str = "float32"  # "bfloat16" for MXU-speed matmuls
    plane_dtype: str = "float32"    # "bfloat16" halves plane-gather bandwidth

    @property
    def in_dim(self) -> int:
        if self.encoding == "triplane_wavelet":
            return self.triplane.feature_dim
        from .encodings import get_encoder
        import jax as _jax

        _, _, dim = get_encoder(
            self.encoding, _jax.random.PRNGKey(0), grid_cfg=self.grid,
            kplanes_cfg=self.kplanes, bound=self.bound,
        )
        return dim

    @property
    def in_dim_dir(self) -> int:
        return sh_dim(self.sh_degree)


def _linear_init(rng: jax.Array, fan_in: int, fan_out: int) -> jnp.ndarray:
    """torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in**0.5)
    return jax.random.uniform(rng, (fan_in, fan_out), jnp.float32, -bound, bound)


def _init_mlp(rng: jax.Array, dims) -> Dict[str, jnp.ndarray]:
    keys = jax.random.split(rng, len(dims) - 1)
    return {
        f"w{i}": _linear_init(keys[i], dims[i], dims[i + 1])
        for i in range(len(dims) - 1)
    }


def init_nerf_params(rng: jax.Array, cfg: NeRFConfig) -> Dict:
    k_enc, k_sig, k_col, k_bg = jax.random.split(rng, 4)
    if cfg.encoding != "triplane_wavelet":
        from .encodings import get_encoder

        enc_params, _, _ = get_encoder(
            cfg.encoding, k_enc, grid_cfg=cfg.grid, kplanes_cfg=cfg.kplanes,
            bound=cfg.bound,
        )
    sigma_dims = (
        [cfg.in_dim]
        + [cfg.hidden_dim] * (cfg.num_layers - 1)
        + [1 + cfg.geo_feat_dim]
    )
    color_dims = (
        [cfg.in_dim_dir + cfg.geo_feat_dim]
        + [cfg.hidden_dim_color] * (cfg.num_layers_color - 1)
        + [3]
    )
    params = {
        "encoder": (
            init_triplane_params(k_enc, cfg.triplane)
            if cfg.encoding == "triplane_wavelet"
            else enc_params
        ),
        "sigma_net": _init_mlp(k_sig, sigma_dims),
        "color_net": _init_mlp(k_col, color_dims),
    }
    if cfg.bg_radius > 0:
        bg_dims = (
            [cfg.in_dim_dir + 2]
            + [cfg.hidden_dim_bg] * (cfg.num_layers_bg - 1)
            + [3]
        )
        params["bg_net"] = _init_mlp(k_bg, bg_dims)
    return params


def _mlp(params: Dict[str, jnp.ndarray], x: jnp.ndarray, dtype) -> jnp.ndarray:
    n = len(params)
    h = x.astype(dtype)
    for i in range(n):
        w = params[f"w{i}"].astype(dtype)
        h = jnp.dot(h, w, preferred_element_type=jnp.float32)
        if i != n - 1:
            h = jax.nn.relu(h)
        h = h.astype(dtype)
    return h


class NeRFField:
    """Stateless functional field; planes are passed in explicitly so they are
    built once per step and shared across density/color queries."""

    def __init__(self, cfg: NeRFConfig):
        self.cfg = cfg
        self.dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        if cfg.encoding != "triplane_wavelet":
            from .encodings import get_encoder

            _, self._enc_apply, _ = get_encoder(
                cfg.encoding, jax.random.PRNGKey(0), grid_cfg=cfg.grid,
                kplanes_cfg=cfg.kplanes, bound=cfg.bound,
            )
        else:
            self._enc_apply = None

    def build_planes(self, params: Dict, max_resolution: int = -1) -> Dict[str, jnp.ndarray]:
        if self.cfg.encoding != "triplane_wavelet":
            return {}
        enc = params["encoder"]
        if self.cfg.plane_dtype == "bfloat16":
            # Cast the pyramid coefficients to bf16 BEFORE the IDWT ladder so
            # the synthesis matmuls (fwd AND transpose/bwd) run at bf16 MXU
            # rates with f32 accumulation — the f32 ladder costs 23.6 ms
            # fwd+bwd at bench scale vs 6.8 bf16 (PERF.md), and the planes
            # are rounded to bf16 right after anyway. Master params stay f32
            # (the astype's autodiff upcasts the grads back for Adam).
            # Rotation/lbound-zoom scalars are not touched (not used here).
            enc = {
                k: (jax.tree.map(lambda a: a.astype(jnp.bfloat16), v)
                    if k in ("base", "wavelets", "upscale") else v)
                for k, v in enc.items()
            }
        planes = build_planes(enc, self.cfg.triplane, max_resolution)
        if self.cfg.plane_dtype == "bfloat16":
            planes = {k: v.astype(jnp.bfloat16) for k, v in planes.items()}
        return planes

    def _density_blob(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        if cfg.density_blob_scale > 1e-5:
            w = cfg.density_blob_scale * jnp.exp(
                -0.5 * (x * x).sum(-1) / cfg.density_blob_std**2
            )
            h = h * w
        return h

    def density(
        self,
        params: Dict,
        planes: Dict[str, jnp.ndarray],
        x: jnp.ndarray,
        resolution_mode: str = "full",
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (N, 3) in [-bound, bound] -> (sigma (N,), geo_feat (N, G))."""
        if self._enc_apply is not None:
            feats = self._enc_apply(params["encoder"], x)
        else:
            feats = sample_triplane(
                planes, x, self.cfg.triplane, lbound=self.cfg.bound,
                resolution_mode=resolution_mode, enc_params=params["encoder"],
            )
        h = _mlp(params["sigma_net"], feats, self.dtype)
        sigma = trunc_exp(self._density_blob(x, h[..., 0]))
        return sigma, h[..., 1:]

    def color(
        self,
        params: Dict,
        d: jnp.ndarray,
        geo_feat: jnp.ndarray,
    ) -> jnp.ndarray:
        """d: (N, 3) unit directions -> (N, 3) rgb in [0, 1]."""
        sh = sh_encode(d, self.cfg.sh_degree)
        h = jnp.concatenate([sh.astype(self.dtype), geo_feat.astype(self.dtype)], axis=-1)
        h = _mlp(params["color_net"], h, self.dtype)
        return jax.nn.sigmoid(h.astype(jnp.float32))

    def __call__(
        self,
        params: Dict,
        planes: Dict[str, jnp.ndarray],
        x: jnp.ndarray,
        d: jnp.ndarray,
        resolution_mode: str = "full",
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        sigma, geo = self.density(params, planes, x, resolution_mode)
        rgb = self.color(params, d, geo)
        return sigma, rgb

    def background(self, params: Dict, sph: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
        """sph: (N, 2) sphere coords in [-1, 1]; d: (N, 3) directions."""
        sh = sh_encode(d, self.cfg.sh_degree)
        h = jnp.concatenate([sh, sph], axis=-1).astype(self.dtype)
        h = _mlp(params["bg_net"], h, self.dtype)
        return jax.nn.sigmoid(h.astype(jnp.float32))
