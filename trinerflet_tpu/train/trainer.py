"""Training loop: optimizer, EMA, losses, occupancy refresh, eval, checkpoints.

TPU-native counterpart of the reference ``Trainer``
(reconstruction/nerf/utils.py:364-1661). Key mappings:

* Adam(betas=(0.9, 0.99), eps=1e-15) + warmup/exponential decay
  (main_nerf.py:116-129, utils.py:55-62)       -> optax chain with the same law
* fp16 autocast + GradScaler                    -> bfloat16 matmuls, no scaler
* EMA via torch_ema (num_updates ramp)          -> hand-rolled pytree EMA
* wavelet L1 with numel weighting (utils.py:640-663) -> models.triplane.wavelet_l1
* per-epoch global ray shuffle (utils.py:1126)  -> on-device uniform ray sampling
  inside the jitted step (see data/rays.py)
* update_extra_state every 16 steps (utils.py:1144) -> update_density_grid
* checkpoint dict incl. EMA/opt/occupancy stats (utils.py:1390-1463)
  -> pickled pytree with the same components; stage growth via
  models.triplane.grow_params instead of load_state_dict(strict=False)

The whole hot path (ray sampling -> plane build -> march -> field -> composite
-> loss -> backward -> adam -> ema) is ONE jitted, donated-state function.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import pickle
import time
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.blender import SceneData
from ..data.rays import (
    sample_ray_batch,
    sample_ray_batch_error_map,
    sample_ray_batch_pregen,
    rays_full_image,
)
from ..models.nerf import NeRFConfig, NeRFField, init_nerf_params
from ..models.triplane import wavelet_l1, grow_params
from ..render import renderer as R
from .metrics import psnr as psnr_fn

__all__ = ["TrainConfig", "TrainState", "Trainer"]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-2
    iters: int = 5000
    warmup_steps: int = 0
    warmup_factor: float = 1e-3
    sched_base: float = 0.1          # --sched_base
    sched_exp: float = 2.5           # --sched_exp
    num_rays: int = 4096
    ema_decay: float = 0.95          # <= 0 disables
    wavelet_regularization: float = 0.1
    weighted_regularization: bool = False
    background_color: float = 0.0
    train_rand_bg: bool = False
    criterion: str = "mse"           # "mse" | "huber"
    huber_delta: float = 0.1
    alpha_bce: float = 0.0
    z_variance_reg: float = -1.0     # --z_variance_reg
    mlp_weight_decay: float = -1.0   # AdamW-style decay on the MLP groups only
    update_extra_interval: int = 16
    renderer: str = "occgrid"        # "occgrid" | "dense" | "proposal"
    # proposal estimator (reference --nerfacc_renderer proposal path,
    # nerfacc_utils.py:188-193 + render/proposal.py)
    proposal_samples: int = 64
    proposal_final: int = 32
    lambda_interlevel: float = 1.0
    error_map: bool = False          # error-guided ray sampling (--error_map)
    eval_chunk: int = 16384
    budget_autotune: bool = True     # shrink samples_per_ray_budget to live p99
    # never shrink the budget while capped rays' mean residual transmittance
    # exceeds this (they'd be losing visible radiance to truncation); above
    # the composite's t_thresh=1e-4 early-exit floor, below perceptible loss
    budget_trunc_tol: float = 3e-3
    seed: int = 0


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema_params: Any
    ema_count: jnp.ndarray    # () int32
    occ: R.OccupancyState
    step: jnp.ndarray         # () int32
    rng: jax.Array
    error_map: Any = None     # (V, 128*128) sampling weights when enabled


def lr_schedule(cfg: TrainConfig):
    """decay_function (utils.py:55-62): linear warmup from warmup_factor, then
    sched_base ** (min(t/T, 1) ** sched_exp); multiplies the base lr."""
    warmup = max(cfg.warmup_steps, 0)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        decay = cfg.sched_base ** (
            jnp.minimum(jnp.maximum(step - warmup, 0.0) / cfg.iters, 1.0) ** cfg.sched_exp
        )
        if warmup > 0:
            wf = cfg.sched_base * cfg.warmup_factor + step * (1 - cfg.warmup_factor) / max(warmup - 1, 1)
            return cfg.lr * jnp.where(step < warmup, wf, decay)
        return cfg.lr * decay

    return fn


def _criterion(cfg: TrainConfig, pred, gt):
    d = pred - gt
    if cfg.criterion == "huber":
        ad = jnp.abs(d)
        q = jnp.minimum(ad, cfg.huber_delta)
        return (0.5 * q * q + cfg.huber_delta * (ad - q)).mean(-1)
    return (d * d).mean(-1)


class Trainer:
    def __init__(
        self,
        nerf_cfg: NeRFConfig,
        render_cfg: R.RenderConfig,
        train_cfg: TrainConfig,
        workspace: Optional[str] = None,
        mesh=None,
    ):
        self.nerf_cfg = nerf_cfg
        self.render_cfg = render_cfg
        self.cfg = train_cfg
        self.field = NeRFField(nerf_cfg)
        self.workspace = workspace
        self.mesh = mesh  # jax.sharding.Mesh for multi-chip (see parallel/)
        self.logger = None
        if workspace:
            os.makedirs(workspace, exist_ok=True)
            from ..utils.logging import ExperimentLogger

            self.logger = ExperimentLogger(workspace)
            self.logger.config(
                {"nerf": nerf_cfg, "render": render_cfg, "train": train_cfg}
            )

        chain = [optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15)]
        if train_cfg.mlp_weight_decay > 0:
            # reference: AdamW decays only sigma/color nets (network.py:224-233)
            def mlp_mask(params):
                return {
                    k: jax.tree.map(lambda _: k in ("sigma_net", "color_net"), v)
                    for k, v in params.items()
                }

            chain.append(
                optax.add_decayed_weights(train_cfg.mlp_weight_decay, mask=mlp_mask)
            )
        chain.append(optax.scale_by_schedule(lambda s: -1.0 * lr_schedule(train_cfg)(s)))
        self.optimizer = optax.chain(*chain)
        # deep test-time rendering: wider per-ray budget, smaller ray chunks
        # (keeps eval memory ~constant at chunk x budget samples)
        self.eval_render_cfg = render_cfg.for_eval()
        ratio = max(
            1,
            self.eval_render_cfg.samples_per_ray_budget
            // max(render_cfg.samples_per_ray_budget, 1),
        )
        self.eval_chunk = max(1024, train_cfg.eval_chunk // ratio)
        self._march_retunes = 0
        self._budget_retunes = 0
        self._global_retunes = 0
        self._budget_p99_ema = None
        self._trunc_T_ema = None
        self._span_trunc_ema = None
        self._span_p99_ema = None
        self._needed_seg_ema = None
        self._budget_max = render_cfg.samples_per_ray_budget
        self._base_render_cfg = render_cfg   # configured (pre-retune) shapes
        self.clip_loss = None          # set via set_clip_guidance (--rand_pose)
        self.rand_pose_interval = -1
        self.prop_cfg = None
        if train_cfg.renderer == "proposal":
            from ..render.proposal import ProposalConfig

            self.prop_cfg = ProposalConfig(
                num_proposal_samples=train_cfg.proposal_samples,
                num_final_samples=train_cfg.proposal_final,
            )
        self._build_jits()

    def _build_jits(self):
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,),
                                   static_argnames=("with_stats",))
        self._update_grid = jax.jit(self._update_grid_impl, donate_argnums=(0,),
                                    static_argnames=("full",))
        self._render_chunk = jax.jit(self._render_chunk_impl, static_argnames=("train",))
        if getattr(self, "clip_loss", None) is not None:
            self._clip_step = jax.jit(self._clip_step_impl, donate_argnums=(0,))

    # -------------------------------------------------------- CLIP guidance

    def set_clip_guidance(self, clip_loss, rand_pose_interval: int,
                          radius: Optional[float] = None):
        """Enable semi-supervised random-pose CLIP steps (reference
        utils.py:500-552 + provider.py:289-300). ``rand_pose_interval`` = k:
        one CLIP step after every k supervised steps; k == 0: CLIP-only.
        Renders a low-res full frame sized so H*W ~= cfg.num_rays."""
        self.clip_loss = clip_loss
        self.rand_pose_interval = int(rand_pose_interval)
        self.clip_radius = radius if radius is not None else self.render_cfg.bound
        side = max(16, int(math.sqrt(self.cfg.num_rays)))
        self.clip_hw = (side, side)
        self._clip_rng = np.random.default_rng(self.cfg.seed + 7)
        self._clip_step = jax.jit(self._clip_step_impl, donate_argnums=(0,))

    def _clip_loss_fn(self, params, occ, rng, rays_o, rays_d):
        H, W = self.clip_hw
        planes = self.field.build_planes(params)
        # the reference fixes a white bg and forces all rays (utils.py:546)
        bg = jnp.ones((rays_o.shape[0], 3), jnp.float32)
        if self.cfg.renderer == "occgrid":
            def field_fn(xyzs, dirs):
                return self.field(params, planes, xyzs, dirs)

            out = R.render_occgrid(
                field_fn, rays_o, rays_d, occ.occ, self.render_cfg,
                rng=rng, bg_color=bg, perturb=True,
                occ_coarse=occ.occ_coarse, occ_bbox=occ.bbox,
                occ_bricks=occ.occ_bricks,
                occ_coarse_bricks=occ.occ_coarse_bricks,
            )
        else:
            out = R.render_dense(
                lambda x: self.field.density(params, planes, x),
                lambda d, g: self.field.color(params, d, g),
                rays_o, rays_d, self.render_cfg, rng=rng,
                bg_color=bg, perturb=True,
            )
        img = out["image"].reshape(1, H, W, 3)
        return self.clip_loss(img)

    def _clip_step_impl(self, state: TrainState, rays_o, rays_d):
        rng, k = jax.random.split(state.rng)
        loss, grads = jax.value_and_grad(self._clip_loss_fn)(
            state.params, state.occ, k, rays_o, rays_d
        )
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if self.cfg.ema_decay > 0:
            n = state.ema_count + 1
            decay = jnp.minimum(self.cfg.ema_decay, (1.0 + n) / (10.0 + n))
            ema = jax.tree.map(
                lambda e, p: e * decay + p * (1 - decay), state.ema_params, params
            )
        else:
            n, ema = state.ema_count, state.ema_params
        return state._replace(params=params, opt_state=opt_state,
                              ema_params=ema, ema_count=n,
                              step=state.step + 1, rng=rng), loss

    def clip_guidance_step(self, state: TrainState):
        """Sample one random orbit pose on the host and take a CLIP step."""
        from ..data.rays import rand_poses, rays_full_image

        H, W = self.clip_hw
        pose = rand_poses(self._clip_rng, 1, radius=self.clip_radius)[0]
        # focal chosen for a ~53deg FoV at the render size (the reference
        # scales the dataset intrinsics by sqrt(num_rays / (H*W)))
        f = 0.5 * W / math.tan(0.5 * math.radians(53.0))
        ro, rd = rays_full_image(pose, (f, f, W / 2, H / 2), H, W)
        return self._clip_step(state, jnp.asarray(ro.reshape(-1, 3)),
                               jnp.asarray(rd.reshape(-1, 3)))

    def _maybe_retune_march(self, state: TrainState, aux=None):
        """Adapt the static march shapes to the live occupancy statistics.

        (a) Coarse-segment span: shrink to the occupied-bbox diagonal (+25%
            margin); grow back if the bbox outgrows it.
        (b) Per-ray sample budget (``budget_autotune``): the dense budget
            layout computes field evals + plane gathers for all N*B slots, so
            slack between the configured B and the live per-ray demand is
            pure gather/FLOP waste (measured 2.5 samples/ray vs B=20 at bench
            config). Track the p99 of pre-compaction demand and re-jit with
            B ~= 1.3 * p99 (multiple of 4, never above the configured B,
            which stays the quality ceiling); grow back toward it if >2% of
            rays overflow.

        Each lever recompiles at most 4 times per run; both wait for the
        occupancy to stabilize (iter_density >= 6)."""
        cfg = self.render_cfg
        if (cfg.march != "hierarchical" or self.cfg.renderer != "occgrid"
                or int(state.occ.iter_density) < 6):
            return
        import math as _m

        if self._march_retunes < 4:
            bbox_t = R.tuned_num_coarse(cfg, np.asarray(state.occ.bbox))
            # span-p99 tune: size the marched span to the live per-ray chord
            # distribution instead of the worst-case corner diagonal (most
            # camera rays cross a far shorter chord). Gated on span_trunc_T:
            # spatially-truncated rays must already end opaque, the same
            # quality guarantee as the budget tuner. Train cfg only — eval
            # keeps the exact (bbox-safe) span.
            span_t = None
            seg = 2.0 * _m.sqrt(3.0) / cfg.max_steps * cfg.fine_per_coarse
            worst = int(_m.ceil(cfg.bound * cfg.max_steps / cfg.fine_per_coarse))
            if (self.cfg.budget_autotune and aux is not None
                    and "span_p99" in aux):
                stt = float(aux["span_trunc_T"])
                e = self._span_trunc_ema
                self._span_trunc_ema = stt if e is None else 0.5 * e + 0.5 * stt
                sp = float(aux["span_p99"])
                es = self._span_p99_ema
                self._span_p99_ema = sp if es is None else 0.5 * es + 0.5 * sp
                # saturation-aware demand span (last occupied / last
                # contributing coarse segment, see render_occgrid): the
                # signal that fires on full-volume scenes, where the chord
                # p99 never shrinks. Same trunc-T quality gate.
                ns = aux.get("needed_seg_p99")
                if ns is not None:
                    ns = float(ns)
                    en = self._needed_seg_ema
                    self._needed_seg_ema = ns if en is None else 0.5 * en + 0.5 * ns
                if self._span_trunc_ema <= self.cfg.budget_trunc_tol:
                    span_t = int(_m.ceil(self._span_p99_ema * 1.1 / seg)) + 2
                    if self._needed_seg_ema is not None:
                        span_t = min(
                            span_t,
                            int(_m.ceil(self._needed_seg_ema * 1.1)) + 2)
                    span_t = min(worst, max(8, (span_t + 7) // 8 * 8))
                elif cfg.num_coarse_override:
                    # truncated rays are losing visible mass: grow back
                    span_t = worst
            cands = [t for t in (bbox_t, span_t) if t is not None]
            target = min(cands) if cands else None
            cur = cfg.num_coarse_override or worst
            if target is not None and (target < int(cur * 0.9) or target > cur):
                self.render_cfg = dataclasses.replace(cfg, num_coarse_override=target)
                # eval derives from the CONFIGURED cfg (exact-safe bbox span,
                # original budget) so train-time tuning never shallows eval
                self.eval_render_cfg = dataclasses.replace(
                    self._base_render_cfg,
                    num_coarse_override=bbox_t
                    or self._base_render_cfg.num_coarse_override,
                ).for_eval()
                self._march_retunes += 1
                self._build_jits()

        if (self.cfg.budget_autotune and aux is not None
                and self._budget_retunes < 4 and "samples_p99" in aux):
            p99 = float(aux["samples_p99"])
            over = float(aux["overflow_frac"])
            trunc_T = float(aux.get("trunc_T", 1.0))
            e = self._budget_p99_ema
            self._budget_p99_ema = p99 if e is None else 0.5 * e + 0.5 * p99
            tt = getattr(self, "_trunc_T_ema", None)
            self._trunc_T_ema = trunc_T if tt is None else 0.5 * tt + 0.5 * trunc_T
            cfg = self.render_cfg
            cur = cfg.samples_per_ray_budget
            tol = self.cfg.budget_trunc_tol
            if over > 0.02 and self._trunc_T_ema > tol:
                # capped rays still transmissive: truncation is discarding
                # visible radiance — grow toward the configured ceiling
                target = min(self._budget_max, cur * 2)
            else:
                # either the demand tail fits, or every capped ray is already
                # opaque (trunc_T ~ 0: the cut tail is occluded — scenes like
                # the driver bench where p99 demand is huge but worthless).
                # Size to min(p99 rule, live-mean rule), floor 8.
                t_p99 = int(_m.ceil(self._budget_p99_ema * 1.3 / 4) * 4)
                t_mean = int(_m.ceil(
                    float(aux.get("samples_mean", cur)) * 1.4 / 4) * 4)
                target = min(self._budget_max, max(8, min(t_p99, t_mean)))
            if target > cur or target < int(cur * 0.75):
                self.render_cfg = dataclasses.replace(
                    cfg, samples_per_ray_budget=target)
                # eval keeps its own (deep) budget: for_eval derives from the
                # CONFIGURED train budget, not the tuned one
                self._budget_retunes += 1
                self._build_jits()

        # (c) Global compaction: when the live mean samples/ray sits far below
        # the (p99-sized) budget B, switch the train render to the shared-
        # buffer layout so field evals + plane gathers/scatters scale with the
        # mean instead of B (measured 2.6 vs B=20 at the bench config). Buffer
        # sized 3x the live mean; grows (or falls back to dense) if it fills.
        if (self.cfg.budget_autotune and aux is not None
                and self._global_retunes < 4 and "num_samples" in aux):
            cfg = self.render_cfg
            B = cfg.samples_per_ray_budget
            fill = float(aux.get("global_fill", 0.0))
            if cfg.compaction == "global" and fill > 0.85:
                slots = cfg.global_slots_per_ray * 2
                if slots >= B:  # dense is cheaper once the buffer ~= N*B
                    self.render_cfg = dataclasses.replace(
                        cfg, compaction="per_ray", global_slots_per_ray=0)
                else:
                    self.render_cfg = dataclasses.replace(
                        cfg, global_slots_per_ray=slots)
                self._global_retunes += 1
                self._build_jits()
            elif cfg.compaction == "per_ray" and self._global_retunes == 0:
                mean = float(aux["num_samples"]) / self.cfg.num_rays
                # 1.5x-mean buffer (was 3x): with the sort-free prefix-mask
                # source map the layout's fixed cost is ~O(N) vector work, so
                # it pays whenever the buffer undercuts the dense N*B volume
                # by ~20%; the fill>0.85 watchdog above doubles the buffer if
                # the live mean drifts up between retunes (overflow only ever
                # drops the tail samples of the LAST rays, transiently, and
                # the loss curve is monitored by the bench/quality gates).
                slots = max(4, int(_m.ceil(mean * 1.5 / 2) * 2))
                if slots <= int(B * 0.8):
                    self.render_cfg = dataclasses.replace(
                        cfg, compaction="global", global_slots_per_ray=slots)
                    self._global_retunes += 1
                    self._build_jits()

    # ------------------------------------------------------------------ init

    def init_state(self, rng: Optional[jax.Array] = None, density_grid: Optional[np.ndarray] = None) -> TrainState:
        rng = jax.random.PRNGKey(self.cfg.seed) if rng is None else rng
        k_param, k_loop = jax.random.split(rng)
        params = init_nerf_params(k_param, self.nerf_cfg)
        if self.prop_cfg is not None:
            from ..render.proposal import init_proposal_params

            k_param, k_prop = jax.random.split(k_param)
            params["proposal"] = init_proposal_params(k_prop, self.prop_cfg)
        occ = R.init_occupancy(self.render_cfg)
        if density_grid is not None:
            occ = occ._replace(density_grid=jnp.asarray(density_grid))
        return TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            # distinct buffers: params and ema live in one donated state pytree
            ema_params=jax.tree.map(jnp.copy, params),
            ema_count=jnp.zeros((), jnp.int32),
            occ=occ,
            step=jnp.zeros((), jnp.int32),
            rng=k_loop,
        )

    # ------------------------------------------------------------ train step

    def _loss_fn(self, params, occ, rng, data, error_map, with_stats=True):
        cfg = self.cfg
        k_batch, k_bg, k_perturb = jax.random.split(rng, 3)
        err_info = None
        if "rays_o" in data:  # pregenerated ray grids (LLFF/NDC)
            rays_o, rays_d, pixels = sample_ray_batch_pregen(
                k_batch, data["images"], data["rays_o"], data["rays_d"], cfg.num_rays
            )
        elif cfg.error_map and error_map is not None:
            rays_o, rays_d, pixels, err_info = sample_ray_batch_error_map(
                k_batch, data["images"], data["poses"], data["intrinsics"],
                cfg.num_rays, error_map,
            )
        else:
            rays_o, rays_d, pixels = sample_ray_batch(
                k_batch, data["images"], data["poses"], data["intrinsics"], cfg.num_rays
            )
        if self.mesh is not None:
            # shard the ray batch over the data axis; XLA inserts the gradient
            # psum automatically (replaces the reference's DDP all_reduce)
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.sharding import DATA_AXIS

            dp = NamedSharding(self.mesh, P(DATA_AXIS))
            rays_o = jax.lax.with_sharding_constraint(rays_o, dp)
            rays_d = jax.lax.with_sharding_constraint(rays_d, dp)
            pixels = jax.lax.with_sharding_constraint(pixels, dp)
        if cfg.train_rand_bg:
            bg = jax.random.uniform(k_bg, (cfg.num_rays, 3))
        else:
            bg = jnp.full((cfg.num_rays, 3), cfg.background_color, jnp.float32)
        if pixels.shape[-1] == 4:
            gt = pixels[..., :3] * pixels[..., 3:] + bg * (1 - pixels[..., 3:])
        else:
            gt = pixels

        planes = self.field.build_planes(params)
        if self.mesh is not None and self.mesh.shape.get("model", 1) > 1:
            # keep reconstructed planes channel-sharded over the model axis
            # (the IDWT ladder is depthwise -> shards with zero halo exchange)
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.sharding import MODEL_AXIS

            cs = NamedSharding(self.mesh, P(None, None, None, MODEL_AXIS))
            planes = {
                k: jax.lax.with_sharding_constraint(v, cs) for k, v in planes.items()
            }

        if cfg.renderer == "occgrid":
            def field_fn(xyzs, dirs):
                return self.field(params, planes, xyzs, dirs)

            out = R.render_occgrid(
                field_fn, rays_o, rays_d, occ.occ, self.render_cfg,
                rng=k_perturb, bg_color=bg, perturb=True,
                occ_coarse=occ.occ_coarse, occ_bbox=occ.bbox,
                occ_bricks=occ.occ_bricks,
                occ_coarse_bricks=occ.occ_coarse_bricks,
                with_stats=with_stats,
            )
        elif cfg.renderer == "proposal":
            from ..render.proposal import render_proposal

            out = render_proposal(
                lambda x: self.field.density(params, planes, x),
                lambda d, g: self.field.color(params, d, g),
                params["proposal"], rays_o, rays_d, self.render_cfg,
                self.prop_cfg, rng=k_perturb, bg_color=bg, perturb=True,
            )
        else:
            out = R.render_dense(
                lambda x: self.field.density(params, planes, x),
                lambda d, g: self.field.color(params, d, g),
                rays_o, rays_d, self.render_cfg, rng=k_perturb,
                bg_color=bg, perturb=True,
            )

        pred = out["image"]
        loss_pix = _criterion(cfg, pred, gt)
        loss = loss_pix.mean()
        aux = {"mse": jnp.mean((pred - gt) ** 2)}
        if cfg.renderer == "proposal" and cfg.lambda_interlevel > 0:
            from ..render.proposal import interlevel_loss

            il = interlevel_loss(out)
            loss = loss + cfg.lambda_interlevel * il
            aux["interlevel"] = il

        if cfg.wavelet_regularization > 0:
            reg = wavelet_l1(params["encoder"], self.nerf_cfg.triplane, cfg.weighted_regularization)
            loss = loss + cfg.wavelet_regularization * reg
            aux["wavelet_reg"] = reg
        if cfg.alpha_bce > 0:
            alpha = jnp.clip(out["weights_sum"], 0.01, 0.99)
            loss = loss + (-cfg.alpha_bce * jnp.log(alpha).mean())
        if cfg.z_variance_reg > 0 and "z_variance" in out:
            loss = loss + cfg.z_variance_reg * out["z_variance"].mean()
        if "num_samples" in out:
            aux["num_samples"] = out["num_samples"]
        for k in ("samples_p99", "overflow_frac", "global_fill", "trunc_T",
                  "samples_mean", "span_p99", "span_trunc_T",
                  "needed_seg_p99"):
            if k in out:
                aux[k] = out[k]
        if err_info is not None:
            # EMA update of the coarse error map (reference utils.py:615-637)
            img_idx, cell_idx = err_info
            err = jax.lax.stop_gradient(loss_pix)
            flat = img_idx * error_map.shape[1] + cell_idx
            old = jnp.take(error_map.reshape(-1), flat)
            new_map = error_map.reshape(-1).at[flat].set(0.1 * old + 0.9 * err)
            aux["_new_error_map"] = new_map.reshape(error_map.shape)
        return loss, aux

    def _train_step_impl(self, state: TrainState, data, with_stats: bool = True):
        from ..parallel.sharding import active_mesh

        rng, k = jax.random.split(state.rng)
        with active_mesh(self.mesh):
            # trace-time scope: mesh-aware ops (the blocked scatter in the
            # plane-grad path) express themselves per-data-shard instead of
            # leaving a global sort+scan for the SPMD partitioner to mangle
            (loss, aux), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True
            )(state.params, state.occ, k, data, state.error_map, with_stats)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        if self.cfg.ema_decay > 0:
            n = state.ema_count + 1
            decay = jnp.minimum(self.cfg.ema_decay, (1.0 + n) / (10.0 + n))
            ema = jax.tree.map(
                lambda e, p: e * decay + p * (1 - decay), state.ema_params, params
            )
        else:
            n = state.ema_count
            ema = state.ema_params  # unused when EMA disabled

        new_error_map = aux.pop("_new_error_map", state.error_map)
        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            ema_params=ema,
            ema_count=n,
            occ=state.occ,
            step=state.step + 1,
            rng=rng,
            error_map=new_error_map,
        )
        aux["loss"] = loss
        return new_state, aux

    def _update_grid_impl(self, state: TrainState, full: bool = True):
        rng, k = jax.random.split(state.rng)
        # the 128^3 density sweep needs no more than 2x grid-size planes
        # (reference triplane_encoder.py:500 get_planes(max_res=2*grid)); a
        # full 2048^2 rebuild here OOM'd the base-light stage 3
        planes = self.field.build_planes(
            state.params, max_resolution=2 * self.render_cfg.grid_size
        )

        def density_fn(pts):
            sigma, _ = self.field.density(state.params, planes, pts)
            return sigma

        # reference cadence (renderer.py:472-506): full sweeps for the first
        # 16 refreshes, partial (rotating quarter) afterwards
        occ = R.update_density_grid(state.occ, density_fn, k, self.render_cfg,
                                    fraction=1.0 if full else 0.25)
        return state._replace(occ=occ, rng=rng)

    # ------------------------------------------------------------- rendering

    def _render_chunk_impl(self, params, occ, rays_o, rays_d, bg_color, train: bool = False):
        rcfg = self.render_cfg if train else self.eval_render_cfg
        planes = self.field.build_planes(params)
        if self.cfg.renderer == "occgrid":
            def field_fn(xyzs, dirs):
                return self.field(params, planes, xyzs, dirs)

            return R.render_occgrid(
                field_fn, rays_o, rays_d, occ.occ, rcfg,
                bg_color=bg_color, perturb=False, occ_coarse=occ.occ_coarse,
                occ_bbox=occ.bbox, occ_bricks=occ.occ_bricks,
                occ_coarse_bricks=occ.occ_coarse_bricks,
            )
        if self.cfg.renderer == "proposal":
            from ..render.proposal import render_proposal

            return render_proposal(
                lambda x: self.field.density(params, planes, x),
                lambda d, g: self.field.color(params, d, g),
                params["proposal"], rays_o, rays_d, rcfg, self.prop_cfg,
                bg_color=bg_color, perturb=False,
            )
        return R.render_dense(
            lambda x: self.field.density(params, planes, x),
            lambda d, g: self.field.color(params, d, g),
            rays_o, rays_d, rcfg, bg_color=bg_color, perturb=False,
            occ=occ.occ,
        )

    def render_rays(self, params, occ, rays_o, rays_d, H, W, bg_color=None):
        """Full-frame render of precomputed rays in eval chunks."""
        if bg_color is None:
            bg_color = self.cfg.background_color
        return self._render_chunked(params, occ, rays_o, rays_d, H, W, bg_color)

    def render_image(self, params, occ, pose, intrinsics, H, W, bg_color=None):
        """Full-frame render in eval chunks (reference staged render,
        renderer.py:545-577). Returns (image (H, W, 3), depth (H, W))."""
        if bg_color is None:
            bg_color = self.cfg.background_color
        rays_o, rays_d = rays_full_image(np.asarray(pose), intrinsics, H, W)
        return self._render_chunked(params, occ, rays_o, rays_d, H, W, bg_color)

    def _render_chunked(self, params, occ, rays_o, rays_d, H, W, bg_color):
        rays_o = np.asarray(rays_o).reshape(-1, 3)
        rays_d = np.asarray(rays_d).reshape(-1, 3)
        n = H * W
        chunk = self.eval_chunk
        imgs, deps = [], []
        bg = jnp.full((chunk, 3), bg_color, jnp.float32)
        for s in range(0, n, chunk):
            ro = rays_o[s : s + chunk]
            rd = rays_d[s : s + chunk]
            pad = chunk - len(ro)
            if pad:
                ro = np.concatenate([ro, np.repeat(ro[-1:], pad, 0)])
                rd = np.concatenate([rd, np.repeat(rd[-1:], pad, 0)])
            out = self._render_chunk(params, occ, jnp.asarray(ro), jnp.asarray(rd), bg)
            img = np.asarray(out["image"])
            dep = np.asarray(out["depth"])
            if pad:
                img, dep = img[:-pad], dep[:-pad]
            imgs.append(img)
            deps.append(dep)
        return (
            np.concatenate(imgs).reshape(H, W, 3),
            np.concatenate(deps).reshape(H, W),
        )

    # ------------------------------------------------------------------ fit

    @staticmethod
    def scene_to_device(scene) -> Dict:
        if hasattr(scene, "rays_o") and getattr(scene, "rays_o", None) is not None:
            return {
                "images": jnp.asarray(scene.images),
                "rays_o": jnp.asarray(scene.rays_o),
                "rays_d": jnp.asarray(scene.rays_d),
            }
        return {
            "images": jnp.asarray(scene.images),
            "poses": jnp.asarray(scene.poses),
            "intrinsics": jnp.asarray(scene.intrinsics, jnp.float32),
        }

    def fit(self, state: TrainState, scene, log_every: int = 100, callback=None):
        """Run cfg.iters training steps. Accepts SceneData (pinhole) or any
        scene with precomputed per-view rays (rays_o/rays_d attrs, e.g. LLFF).
        Returns the final state."""
        data = self.scene_to_device(scene)
        if self.cfg.error_map and state.error_map is None and "poses" in data:
            state = state._replace(
                error_map=jnp.ones(
                    (data["images"].shape[0],
                     min(128, data["images"].shape[1], data["images"].shape[2]) ** 2),
                    jnp.float32,
                )
            )
        total = self.cfg.iters + max(self.cfg.warmup_steps, 0)
        interval = self.cfg.update_extra_interval
        t0 = time.time()
        last_aux = None
        for it in range(total):
            st = int(state.step)
            if self.cfg.renderer == "occgrid" and st % interval == 0:
                state = self._update_grid(
                    state, full=int(state.occ.iter_density) < 16
                )
                self._maybe_retune_march(state, last_aux)
            if self.clip_loss is not None and (
                self.rand_pose_interval == 0
                or (self.rand_pose_interval > 0
                    and it % (self.rand_pose_interval + 1) == self.rand_pose_interval)
            ):
                # semi-supervised CLIP step on a random pose (utils.py:543-552)
                state, clip_l = self.clip_guidance_step(state)
                aux = {"loss": clip_l, "clip_loss": clip_l}
                if self.rand_pose_interval == 0 and callback is not None:
                    callback(state, aux)
                if self.rand_pose_interval == 0:
                    continue
            # sort-based autotune stats only on the step whose aux the next
            # retune consumes (hot steps skip the 32k-row sort); non-occgrid
            # renderers have no stats graph, so pin True (one compile)
            state, aux = self._train_step(
                state, data,
                with_stats=(self.cfg.renderer != "occgrid")
                or ((st + 1) % interval == 0),
            )
            last_aux = aux
            if log_every and (it % log_every == 0 or it == total - 1):
                loss = float(aux["loss"])
                dt = time.time() - t0
                msg = (
                    f"step {int(state.step):6d} loss {loss:.5f} "
                    f"({self.cfg.num_rays * (it + 1) / max(dt, 1e-9):,.0f} rays/s)"
                )
                if self.logger is not None:
                    self.logger.text(msg)
                    scal = {k: v for k, v in aux.items() if jnp.ndim(v) == 0}
                    scal["lr"] = lr_schedule(self.cfg)(int(state.step))
                    self.logger.scalars(int(state.step), scal)
                else:
                    print(msg)
            if callback is not None:
                callback(state, aux)
        return state

    # ----------------------------------------------------------------- eval

    def evaluate(
        self,
        state: TrainState,
        scene: SceneData,
        use_ema: bool = True,
        save_dir: Optional[str] = None,
        tag: str = "results",
    ) -> Dict:
        from ..parallel.multihost import allgather_rows, is_primary, process_view_slice

        params = state.ema_params if (use_ema and self.cfg.ema_decay > 0) else state.params
        rows = []
        # each process renders its round-robin view shard; metric rows are
        # allgathered afterwards (reference DDP eval, utils.py:1270-1289)
        for v in process_view_slice(scene.num_views):
            if hasattr(scene, "rays_o") and getattr(scene, "rays_o", None) is not None:
                img, dep = self.render_rays(
                    params, state.occ, scene.rays_o[v], scene.rays_d[v], scene.H, scene.W
                )
            else:
                img, dep = self.render_image(
                    params, state.occ, scene.poses[v], scene.intrinsics, scene.H, scene.W
                )
            gt = scene.images[v]
            if gt.shape[-1] == 4:
                gt = gt[..., :3] * gt[..., 3:] + self.cfg.background_color * (1 - gt[..., 3:])
            from .metrics import ssim as ssim_fn

            rows.append([float(v), psnr_fn(img, gt), ssim_fn(np.asarray(img), np.asarray(gt))])
            if save_dir:
                import cv2

                os.makedirs(save_dir, exist_ok=True)
                bgr = (np.clip(img, 0, 1)[..., ::-1] * 255).astype(np.uint8)
                cv2.imwrite(os.path.join(save_dir, f"{tag}_{v:03d}.png"), bgr)
                # span-normalized depth map (reference eval RGB+depth dumps,
                # utils.py:1302-1325)
                d8 = (np.clip(np.asarray(dep), 0, 1) * 255).astype(np.uint8)
                cv2.imwrite(
                    os.path.join(save_dir, f"{tag}_{v:03d}_depth.png"), d8)
        table = allgather_rows(np.asarray(rows, np.float32).reshape(-1, 3),
                               scene.num_views)
        per_image = [{"view": int(r[0]), "PSNR": float(r[1]), "SSIM": float(r[2])}
                     for r in table]
        results = {
            "PSNR": float(np.mean(table[:, 1])) if len(table) else float("nan"),
            "SSIM": float(np.mean(table[:, 2])) if len(table) else float("nan"),
            "per_image": per_image,
        }
        if self.workspace and is_primary():
            with open(os.path.join(self.workspace, f"{tag}.json"), "w") as f:
                json.dump(results, f, indent=2)
        return results

    def save_mesh(self, state: TrainState, path: str, resolution: int = 256,
                  threshold: float = 10.0):
        """Density iso-surface -> OBJ (reference Trainer.save_mesh,
        utils.py:738-758; marching tetrahedra instead of mcubes)."""
        from ..ops.meshing import extract_mesh, write_obj

        params = state.params
        planes = jax.jit(self.field.build_planes)(params)

        @jax.jit
        def density_fn(pts):
            sigma, _ = self.field.density(params, planes, pts)
            return sigma

        verts, faces = extract_mesh(
            lambda p: density_fn(jnp.asarray(p)),
            bound=self.nerf_cfg.bound,
            resolution=resolution,
            threshold=threshold,
        )
        write_obj(path, verts, faces)
        return verts, faces

    # ----------------------------------------------------------- checkpoints

    def save_checkpoint(self, state: TrainState, path: str, full: bool = True):
        to_np = lambda t: jax.tree.map(np.asarray, t)
        payload = {
            "params": to_np(state.params),
            "ema_params": to_np(state.ema_params),
            "ema_count": int(state.ema_count),
            "step": int(state.step),
            "density_grid": np.asarray(state.occ.density_grid),
            "mean_density": float(state.occ.mean_density),
        }
        if full:
            payload["opt_state"] = to_np(state.opt_state)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    def load_checkpoint(self, path: str, state: Optional[TrainState] = None) -> TrainState:
        with open(path, "rb") as f:
            payload = pickle.load(f)
        if state is None:
            state = self.init_state()
        occ = state.occ._replace(
            density_grid=jnp.asarray(payload["density_grid"]),
            mean_density=jnp.asarray(payload["mean_density"]),
        )
        # rebuild occupancy bits from the loaded grid
        H, C = self.render_cfg.grid_size, self.render_cfg.cascades
        thresh = (
            min(payload["mean_density"], self.render_cfg.density_thresh)
            * self.render_cfg.occ_thresh_scale
        )
        occ_bits = jnp.asarray(payload["density_grid"] > thresh).reshape(C, H, H, H)
        from ..ops.raymarch import pack_occ_bricks

        occ_coarse_bits = R._dilate3(occ_bits,
                                     self.render_cfg.coarse_dilation_radius)
        occ = occ._replace(
            occ=occ_bits,
            occ_coarse=occ_coarse_bits,
            bbox=R._occupied_bbox(occ_bits, self.render_cfg),
            occ_bricks=pack_occ_bricks(occ_bits),
            occ_coarse_bricks=pack_occ_bricks(occ_coarse_bits))
        to_dev = lambda t: jax.tree.map(jnp.asarray, t)
        state = state._replace(
            params=to_dev(payload["params"]),
            ema_params=to_dev(payload["ema_params"]),
            ema_count=jnp.asarray(payload["ema_count"], jnp.int32),
            step=jnp.asarray(payload["step"], jnp.int32),
            occ=occ,
        )
        if "opt_state" in payload:
            state = state._replace(opt_state=to_dev(payload["opt_state"]))
        return state

    def load_model_for_stage(self, path: str, rng, old_nerf_cfg: NeRFConfig) -> TrainState:
        """Cross-stage resume: load a previous (smaller) stage's model weights
        into this stage's freshly-initialized pyramid (reference 'latest_model'
        resume + strict=False growth, utils.py:476-478, 1482-1487)."""
        with open(path, "rb") as f:
            payload = pickle.load(f)
        state = self.init_state(rng)
        old_params = payload["params"]
        new_params = dict(state.params)
        new_params["encoder"] = grow_params(
            jax.tree.map(jnp.asarray, old_params["encoder"]),
            old_nerf_cfg.triplane,
            self.nerf_cfg.triplane,
            jax.random.PRNGKey(self.cfg.seed + 7),
        )
        for k in ("sigma_net", "color_net", "bg_net"):
            if k in old_params and k in new_params:
                new_params[k] = jax.tree.map(jnp.asarray, old_params[k])
        state = state._replace(
            params=new_params,
            opt_state=self.optimizer.init(new_params),
            ema_params=jax.tree.map(jnp.copy, new_params),
        )
        return state
