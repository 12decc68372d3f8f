"""Proposal-network sampling (nerfacc PropNetEstimator counterpart).

The reference's SR renderer supports three estimators — occgrid, proposal, and
importance (super_resolution/threestudio/models/renderers/
nerf_volume_renderer.py:146-281). Occgrid and importance are covered by
``render_occgrid`` / ``render_dense(upsample_steps>0)``; this module supplies
the proposal variant: a cheap density proxy is evaluated on a coarse uniform
ladder, its transmittance weights drive inverse-CDF placement of the main
field's samples, and the proxy is trained with the standard interlevel
(histogram-bound) loss against the main field's weights.

The proposal proxy here is a small multiresolution grid + 1-layer MLP —
grid-backed like nerfacc's recommended prop nets, and cheap on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import raymarch as RM
from ..models.gridencoder import GridEncoderConfig, grid_encode, init_grid_params
from ..ops.activation import trunc_exp
from .renderer import RenderConfig, _background

__all__ = ["ProposalConfig", "init_proposal_params", "proposal_density",
           "render_proposal", "interlevel_loss"]


@dataclasses.dataclass(frozen=True)
class ProposalConfig:
    num_proposal_samples: int = 64
    num_final_samples: int = 32
    grid: GridEncoderConfig = dataclasses.field(
        default_factory=lambda: GridEncoderConfig(
            num_levels=5, level_dim=2, base_resolution=16,
            desired_resolution=128, log2_hashmap_size=17,
        )
    )


def init_proposal_params(rng: jax.Array, cfg: ProposalConfig) -> Dict:
    k1, k2 = jax.random.split(rng)
    dim = cfg.grid.output_dim
    w = jax.random.uniform(k2, (dim, 1), jnp.float32, -(dim**-0.5), dim**-0.5)
    # larger-than-encoder grid init: a ~0 product of two tiny factors is a
    # saddle that starves the histogram loss's gradient
    return {"grid": init_grid_params(k1, cfg.grid, std=0.1), "w": w}


def proposal_density(params: Dict, pts: jnp.ndarray, cfg: ProposalConfig, bound: float) -> jnp.ndarray:
    feats = grid_encode(params["grid"], pts, cfg.grid, bound)
    return trunc_exp(feats @ params["w"])[..., 0]


def _ray_weights(sigmas, deltas):
    sd = sigmas * deltas
    alphas = 1.0 - jnp.exp(-sd)
    trans = jnp.cumprod(1.0 - alphas + 1e-15, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], -1)
    return alphas * trans


def render_proposal(
    density_fn: Callable,     # main field: pts (M,3) -> (sigma, geo)
    color_fn: Callable,       # (dirs, geo) -> rgb
    prop_params: Dict,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    cfg: RenderConfig,
    pcfg: ProposalConfig,
    rng: Optional[jax.Array] = None,
    bg_color=None,
    perturb: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Proposal-guided volume rendering. Returns the usual render outputs plus
    the (stop-gradient-free) proposal weights/bins needed for the interlevel
    loss: keys ``prop_weights``, ``prop_bins``, ``weights``, ``bins``."""
    N = rays_o.shape[0]
    P, F = pcfg.num_proposal_samples, pcfg.num_final_samples
    aabb = jnp.asarray(cfg.aabb, jnp.float32)
    nears, fars = RM.near_far_from_aabb(rays_o, rays_d, aabb, cfg.min_near)
    hit = nears < 1e30
    nears = jnp.where(hit, nears, 0.0)[:, None]
    fars = jnp.where(hit, fars, 1e-3)[:, None]

    # ---- proposal level: uniform bins
    u = jnp.linspace(0.0, 1.0, P + 1)
    bins_p = nears + (fars - nears) * u[None, :]       # (N, P+1) edges
    if perturb and rng is not None:
        rng, k = jax.random.split(rng)
        jitter = (jax.random.uniform(k, (N, P + 1)) - 0.5) * (fars - nears) / P
        bins_p = jnp.sort(bins_p + jitter, axis=-1)
    mid_p = 0.5 * (bins_p[:, 1:] + bins_p[:, :-1])     # (N, P)
    dt_p = bins_p[:, 1:] - bins_p[:, :-1]
    pts_p = rays_o[:, None] + rays_d[:, None] * mid_p[..., None]
    pts_p = jnp.clip(pts_p, -cfg.bound, cfg.bound)
    sig_p = proposal_density(prop_params, pts_p.reshape(-1, 3), pcfg, cfg.bound).reshape(N, P)
    w_p = _ray_weights(sig_p, dt_p)                    # (N, P)

    # ---- final level: inverse-CDF placement from proposal weights
    if perturb and rng is not None:
        rng, k = jax.random.split(rng)
        uu = jax.random.uniform(k, (N, F))
    else:
        uu = jnp.broadcast_to(jnp.linspace(0.5 / F, 1 - 0.5 / F, F), (N, F))
    t_f = RM.sample_pdf(bins_p, jax.lax.stop_gradient(w_p), F, uu)  # (N, F)
    t_f = jnp.sort(t_f, axis=-1)
    dt_f = jnp.diff(t_f, axis=-1)
    dt_f = jnp.concatenate([dt_f, (fars - nears) / F * jnp.ones_like(dt_f[:, :1])], -1)
    pts_f = rays_o[:, None] + rays_d[:, None] * t_f[..., None]
    pts_f = jnp.clip(pts_f, -cfg.bound, cfg.bound)
    sigmas, geos = density_fn(pts_f.reshape(-1, 3))
    sigmas = sigmas.reshape(N, F)
    dirs = jnp.broadcast_to(rays_d[:, None], (N, F, 3))
    rgbs = color_fn(dirs.reshape(-1, 3), geos).reshape(N, F, 3)

    ori_z = jnp.clip((t_f - nears) / (fars - nears), 0, 1)
    ws, depth, image, weights = RM.composite_dense(
        cfg.density_scale * sigmas, rgbs, dt_f, ori_z
    )
    bg = _background(rays_o, rays_d, bg_color, None, cfg)
    image = image + (1.0 - ws)[:, None] * bg
    return {
        "image": image, "depth": depth, "weights_sum": ws,
        "prop_weights": w_p, "prop_bins": bins_p,
        "weights": weights, "bins": t_f,
    }


def interlevel_loss(out: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Histogram-bound proposal loss (mip-NeRF 360 / nerfacc prop loss): the
    proposal's mass over each final-sample interval must upper-bound the final
    weights; penalize clip(w_final - w_prop_envelope, 0)^2 / w_prop."""
    pb = jax.lax.stop_gradient(out["bins"])       # (N, F) final sample ts
    wf = jax.lax.stop_gradient(out["weights"])    # (N, F)
    bins_p = out["prop_bins"]                     # (N, P+1)
    w_p = out["prop_weights"]                     # (N, P)
    cw = jnp.concatenate([jnp.zeros_like(w_p[:, :1]), jnp.cumsum(w_p, -1)], -1)
    starts = bins_p[:, :-1]
    ends = bins_p[:, 1:]

    # OUTER measure: total mass of every proposal bin overlapping the final
    # interval (mip-NeRF 360's bound; the inner CDF-difference measure has
    # zero gradient when an interval falls inside one bin)
    t_lo = pb
    t_hi = jnp.concatenate([pb[:, 1:], pb[:, -1:]], -1)
    hi_idx = jnp.sum(starts[:, None, :] < t_hi[:, :, None], axis=-1)       # (N, F)
    lo_idx = jnp.sum(ends[:, None, :] <= t_lo[:, :, None], axis=-1)
    P = w_p.shape[1]
    envelope = jnp.take_along_axis(cw, jnp.clip(hi_idx, 0, P), axis=-1) - \
        jnp.take_along_axis(cw, jnp.clip(lo_idx, 0, P), axis=-1)
    deficit = jnp.clip(wf - envelope, min=0.0)
    return (deficit**2 / jnp.maximum(envelope + wf, 1e-6)).mean()
