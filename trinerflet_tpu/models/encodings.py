"""Position-encoding factory.

Mirrors the reference dispatchers (reconstruction/encoding.py:get_encoder and
super_resolution .../models/networks.py:get_encoding): one place that maps an
encoding name to (init_fn, apply_fn, output_dim):

  * "None"             — identity
  * "frequency"        — sin/cos bands (ops/encoders.freq_encode)
  * "sphere_harmonics" — real SH (ops/encoders.sh_encode)
  * "hashgrid"/"tiledgrid" — multires grid (models/gridencoder)
  * "triplane_wavelet" — the wavelet triplane (models/triplane)
  * "k_planes" / "multiscale_k_planes[_mul]" — plane-product ablations
    (SR triplane_encoder.py:445-579)

The reference's CUDA ffmlp / tiny-cuda-nn backends (--ff/--tcnn,
network_ff.py/network_tcnn.py) have no TPU analogue and need none: XLA already
fuses the bias-free MLP stack into MXU matmuls at bf16 — that *is* the
fully-fused-MLP design point on this hardware.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.encoders import freq_encode, freq_dim, sh_encode, sh_dim
from .gridencoder import GridEncoderConfig, grid_encode, init_grid_params

__all__ = ["get_encoder", "KPlanesConfig", "init_kplanes_params", "kplanes_encode"]


import dataclasses


@dataclasses.dataclass(frozen=True)
class KPlanesConfig:
    channels: int = 16
    resolutions: Tuple[int, ...] = (128,)   # one entry per scale
    combine: str = "concat"                  # "concat" | "mul" (hadamard across planes)
    init_sigma: float = 0.1

    @property
    def output_dim(self) -> int:
        per_scale = self.channels if self.combine == "mul" else 3 * self.channels
        return per_scale * len(self.resolutions)


def init_kplanes_params(rng: jax.Array, cfg: KPlanesConfig) -> Dict:
    keys = jax.random.split(rng, len(cfg.resolutions))
    out = {}
    for i, res in enumerate(cfg.resolutions):
        if cfg.combine == "mul":
            # multiplicative planes initialize near 1 (k-planes convention)
            init = 1.0 + cfg.init_sigma * jax.random.normal(
                keys[i], (3, cfg.channels, res, res), jnp.float32
            )
        else:
            init = cfg.init_sigma * jax.random.normal(
                keys[i], (3, cfg.channels, res, res), jnp.float32
            )
        out[f"scale_{i}"] = init
    return out


def kplanes_encode(params: Dict, x: jnp.ndarray, cfg: KPlanesConfig, bound: float) -> jnp.ndarray:
    from .triplane import project_to_planes
    from ..ops.grid_sample import sample_planes

    feats = []
    coords = project_to_planes(x, bound)
    for i in range(len(cfg.resolutions)):
        planes = jnp.transpose(params[f"scale_{i}"], (0, 2, 3, 1))  # (3, H, W, C)
        s = sample_planes(planes, coords)  # (N, 3, C)
        if cfg.combine == "mul":
            feats.append(jnp.prod(s, axis=1))
        else:
            feats.append(s.reshape(x.shape[0], -1))
    return jnp.concatenate(feats, axis=-1)


def get_encoder(
    name: Optional[str],
    rng: jax.Array,
    *,
    input_dim: int = 3,
    degree: int = 4,
    grid_cfg: Optional[GridEncoderConfig] = None,
    kplanes_cfg: Optional[KPlanesConfig] = None,
    bound: float = 1.0,
):
    """Returns (params, apply_fn(params, x) -> feats, output_dim)."""
    if name in (None, "None", "identity"):
        return {}, lambda p, x: x, input_dim
    if name == "frequency":
        return {}, lambda p, x: freq_encode(x, degree), freq_dim(input_dim, degree)
    if name == "sphere_harmonics":
        return {}, lambda p, x: sh_encode(x, degree), sh_dim(degree)
    if name in ("hashgrid", "tiledgrid"):
        cfg = grid_cfg or GridEncoderConfig(
            input_dim=input_dim,
            gridtype="hash" if name == "hashgrid" else "tiled",
        )
        params = init_grid_params(rng, cfg)
        return params, lambda p, x: grid_encode(p, x, cfg, bound), cfg.output_dim
    if name in ("k_planes", "multiscale_k_planes", "multiscale_k_planes_mul"):
        cfg = kplanes_cfg or KPlanesConfig(
            combine="mul" if name.endswith("_mul") else "concat",
            resolutions=(128,) if name == "k_planes" else (64, 128, 256),
        )
        params = init_kplanes_params(rng, cfg)
        return params, lambda p, x: kplanes_encode(p, x, cfg, bound), cfg.output_dim
    if name == "triplane_wavelet":
        raise ValueError(
            "triplane_wavelet is the NeRFField default; construct it via "
            "models.nerf.NeRFConfig/NeRFField"
        )
    raise ValueError(f"unknown encoding {name!r}")
