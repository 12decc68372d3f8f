"""Two-phase NeRF super-resolution system.

TPU-native counterpart of the reference ``TriplaneWaveletSR`` LightningModule
(super_resolution/threestudio/systems/triplane_wavelet_sr.py):

* phase 1 (``step < sr_start_step``): fit the wavelet triplane on LR views,
  rendering with the planes decoded at ``resolution / low_res_scale``
  ("low_res" resolution mode; :363-373, 432-467),
* phase 2 (``step >= sr_start_step``): per-view pseudo-GT cache, refreshed
  every ``hr_fit_refresh_every`` steps (:377-378, 544-568) by rendering the
  full HR view (chunked; render_high_res :797-829) and refining it with the
  diffusion upscaler's ``generate_sr``; training renders random HR crops
  aligned to the LR grid (crop_batch :274-333) against the cached pseudo-GT
  with L2+L1 (:596-600) + LR-SR consistency (downscale HR estimate to LR, MSE
  vs LR ground truth; :614-628) + wavelet L1 (:651-660) + optional SDS,
* optional planes-only finetuning with a minimum-resolution gate on which
  wavelet levels receive gradients (on_before_optimizer_step :696-719),
* eval reports LR-PSNR and HR-PSNR/SSIM next to the bilinear-upscale baseline
  and writes ``final_results_{step}.json`` (:919-921, 1159-1286).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.rays import rays_full_image, sample_ray_batch
from ..models.nerf import NeRFConfig, NeRFField, init_nerf_params
from ..models.triplane import wavelet_l1
from ..render import renderer as R
from ..train.metrics import psnr as psnr_fn, ssim as ssim_fn
from ..train.trainer import lr_schedule, TrainConfig
from .config import C, ScheduledFloat
from .data import SRSceneData

__all__ = ["SRConfig", "SRSystem", "SRState"]


@dataclasses.dataclass(frozen=True)
class SRConfig:
    total_steps: int = 6000
    sr_start_step: int = 2000
    hr_fit_refresh_every: int = 500
    lr: float = 1e-2
    sched_base: float = 0.1
    sched_exp: float = 2.5
    num_rays_lr: int = 4096
    crop_size_lr: int = 24            # crop side in LR pixels; HR crop = x scale
    background_color: float = 0.0
    # loss weights (scheduled scalars allowed)
    lambda_lr: ScheduledFloat = 1.0
    lambda_l2_hr: ScheduledFloat = 1.0
    lambda_l1_hr: ScheduledFloat = 0.0
    lambda_lr_consistency: ScheduledFloat = 1.0
    # LPIPS(downscaled HR estimate, LR GT) — reference
    # triplane_wavelet_sr.py:622-628; needs lpips_params at system init
    lambda_lr_consistency_perceptual: ScheduledFloat = 0.0
    lambda_sds: ScheduledFloat = 0.0
    wavelet_regularization: ScheduledFloat = 0.1
    weighted_regularization: bool = False
    # phase 1 consumes a globally shuffled LR ray stream instead of per-view
    # random sampling (reference low_res_shuffled, multiview_sr.py:357-387)
    low_res_shuffled: bool = False
    # planes-only finetuning
    sr_planes_only: bool = False
    sr_min_res: int = -1
    update_extra_interval: int = 16
    eval_chunk: int = 16384
    seed: int = 0


class SRState(NamedTuple):
    params: Any
    opt_state: Any
    occ: R.OccupancyState
    step: jnp.ndarray
    rng: jax.Array


class SRSystem:
    def __init__(
        self,
        nerf_cfg: NeRFConfig,
        render_cfg: R.RenderConfig,
        cfg: SRConfig,
        guidance,
        workspace: Optional[str] = None,
        lpips_params=None,
        lpips_net: str = "vgg",
    ):
        assert nerf_cfg.triplane.low_res_scale > 1, "SR needs a dual-resolution triplane"
        self.nerf_cfg = nerf_cfg
        self.render_cfg = render_cfg
        self.cfg = cfg
        self.guidance = guidance
        self.field = NeRFField(nerf_cfg)
        self.lpips_params = lpips_params  # None -> perceptual terms disabled
        self.lpips_net = lpips_net
        self.workspace = workspace
        if workspace:
            os.makedirs(workspace, exist_ok=True)

        tc = TrainConfig(lr=cfg.lr, iters=cfg.total_steps,
                         sched_base=cfg.sched_base, sched_exp=cfg.sched_exp)
        self.optimizer = optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15),
            optax.scale_by_schedule(lambda s: -1.0 * lr_schedule(tc)(s)),
        )
        # deep test-time budgets for full-frame renders (reference
        # render_high_res chunking, triplane_wavelet_sr.py:797-829)
        self.eval_render_cfg = render_cfg.for_eval()
        ratio = max(1, self.eval_render_cfg.samples_per_ray_budget
                    // max(render_cfg.samples_per_ray_budget, 1))
        self.eval_chunk = max(1024, cfg.eval_chunk // ratio)
        # SDS is traced into the HR step only when the schedule can be nonzero
        self._use_sds = not (
            isinstance(cfg.lambda_sds, (int, float)) and cfg.lambda_sds == 0
        )
        self._base_render_cfg = render_cfg
        self._march_retunes = 0
        self._build_jits()

    def _build_jits(self):
        self._lr_step = jax.jit(self._lr_step_impl, donate_argnums=(0,))
        self._lr_stream_step = jax.jit(self._lr_stream_step_impl, donate_argnums=(0,))
        self._hr_step = jax.jit(self._hr_step_impl, donate_argnums=(0,))
        self._update_grid = jax.jit(self._update_grid_impl, donate_argnums=(0,))
        self._render_chunk = jax.jit(self._render_chunk_impl, static_argnames=("mode",))
        self._render_chunk_fit = jax.jit(self._render_chunk_fit_impl,
                                         static_argnames=("mode",))

    def _maybe_retune_march(self, state: "SRState"):
        """Shrink the static coarse-segment span to the live occupied-bbox
        diagonal (same lever as Trainer._maybe_retune_march): empty leading/
        trailing scene margin otherwise costs march candidates AND caps how
        deep the fixed span reaches — the wall-time lever for the chunked
        ``render_high_res`` counterpart (triplane_wavelet_sr.py:797-829)."""
        cfg = self.render_cfg
        if (cfg.march != "hierarchical" or self._march_retunes >= 2
                or int(state.occ.iter_density) < 6):
            return
        target = R.tuned_num_coarse(cfg, np.asarray(state.occ.bbox))
        if target is not None:
            self.render_cfg = dataclasses.replace(cfg, num_coarse_override=target)
            self.eval_render_cfg = dataclasses.replace(
                self._base_render_cfg, num_coarse_override=target).for_eval()
            self._march_retunes += 1
            self._build_jits()

    # ------------------------------------------------------------------ init

    def init_state(self, rng: Optional[jax.Array] = None,
                   density_grid: Optional[np.ndarray] = None) -> SRState:
        rng = jax.random.PRNGKey(self.cfg.seed) if rng is None else rng
        k1, k2 = jax.random.split(rng)
        params = init_nerf_params(k1, self.nerf_cfg)
        occ = R.init_occupancy(self.render_cfg)
        if density_grid is not None:
            # camera-frustum culling seed (reference mark_untrained_grid)
            occ = occ._replace(density_grid=jnp.asarray(density_grid))
        return SRState(
            params=params,
            opt_state=self.optimizer.init(params),
            occ=occ,
            step=jnp.zeros((), jnp.int32),
            rng=k2,
        )

    # -------------------------------------------------------------- internal

    def _render(self, params, occ, rays_o, rays_d, mode, rng=None, perturb=False,
                train: bool = True):
        planes = self.field.build_planes(params)
        if mode == "high_res" and "high_res" not in planes:
            mode = "full"

        def field_fn(xyzs, dirs):
            return self.field(params, planes, xyzs, dirs, resolution_mode=mode)

        bg = jnp.full((rays_o.shape[0], 3), self.cfg.background_color, jnp.float32)
        return R.render_occgrid(
            field_fn, rays_o, rays_d, occ.occ,
            self.render_cfg if train else self.eval_render_cfg,
            rng=rng, bg_color=bg, perturb=perturb, occ_coarse=occ.occ_coarse,
            occ_bbox=occ.bbox, occ_bricks=occ.occ_bricks,
            occ_coarse_bricks=occ.occ_coarse_bricks,
            # the SR retune is bbox-driven (no aux consumer): skip the
            # sort-based p99 stats on every render
            with_stats=False,
        )

    def _apply_updates(self, state, grads, aux):
        if self.cfg.sr_planes_only or self.cfg.sr_min_res > 0:
            grads = self._mask_grads(grads)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return SRState(params=params, opt_state=opt_state, occ=state.occ,
                       step=state.step + 1, rng=state.rng), aux

    def _mask_grads(self, grads):
        """Zero gradients per the planes-only / min-res policy
        (triplane_wavelet_sr.py:696-719)."""
        g = dict(grads)
        if self.cfg.sr_planes_only:
            for k in ("sigma_net", "color_net", "bg_net"):
                if k in g:
                    g[k] = jax.tree.map(jnp.zeros_like, g[k])
        enc = dict(g["encoder"])
        if self.cfg.sr_min_res > 0:
            if enc["base"].shape[-1] < self.cfg.sr_min_res:
                enc["base"] = jnp.zeros_like(enc["base"])
            enc["wavelets"] = {
                k: (v if v.shape[-1] >= self.cfg.sr_min_res else jnp.zeros_like(v))
                for k, v in enc["wavelets"].items()
            }
        g["encoder"] = enc
        return g

    # ------------------------------------------------------------ phase 1

    def _lr_step_impl(self, state: SRState, images, poses, intrinsics, weights):
        rng, k_batch, k_perturb = jax.random.split(state.rng, 3)
        state = state._replace(rng=rng)
        w_lr, w_reg = weights["lr"], weights["reg"]

        def loss_fn(params):
            rays_o, rays_d, pixels = sample_ray_batch(
                k_batch, images, poses, intrinsics, self.cfg.num_rays_lr
            )
            out = self._render(params, state.occ, rays_o, rays_d, "low_res",
                               rng=k_perturb, perturb=True)
            loss_lr = jnp.mean((out["image"] - pixels[..., :3]) ** 2)
            reg = wavelet_l1(params["encoder"], self.nerf_cfg.triplane,
                             self.cfg.weighted_regularization)
            return w_lr * loss_lr + w_reg * reg, {"loss_lr": loss_lr, "reg": reg}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        aux["loss"] = loss
        return self._apply_updates(state, grads, aux)

    def _lr_stream_step_impl(self, state: SRState, rays_o, rays_d, rgb, weights):
        """Phase-1 step on a pre-shuffled ray chunk (low_res_shuffled) or on
        precomputed LLFF/NDC rays."""
        rng, k_perturb = jax.random.split(state.rng)
        state = state._replace(rng=rng)
        w_lr, w_reg = weights["lr"], weights["reg"]

        def loss_fn(params):
            out = self._render(params, state.occ, rays_o, rays_d, "low_res",
                               rng=k_perturb, perturb=True)
            loss_lr = jnp.mean((out["image"] - rgb) ** 2)
            reg = wavelet_l1(params["encoder"], self.nerf_cfg.triplane,
                             self.cfg.weighted_regularization)
            return w_lr * loss_lr + w_reg * reg, {"loss_lr": loss_lr, "reg": reg}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        aux["loss"] = loss
        return self._apply_updates(state, grads, aux)

    # ------------------------------------------------------------ phase 2

    def _hr_step_impl(self, state: SRState, rays_o, rays_d, pseudo_gt, lr_gt,
                      weights, sds_t_bounds=None):
        rng, k_perturb, k_sds = jax.random.split(state.rng, 3)
        state = state._replace(rng=rng)
        scale = pseudo_gt.shape[0] // lr_gt.shape[0]

        def loss_fn(params):
            out = self._render(params, state.occ, rays_o, rays_d, "high_res",
                               rng=k_perturb, perturb=True)
            pred = out["image"].reshape(pseudo_gt.shape)
            l2 = jnp.mean((pred - pseudo_gt) ** 2)
            l1 = jnp.mean(jnp.abs(pred - pseudo_gt))
            # LR-SR consistency: average-pool the HR estimate down to LR
            h, w, _ = pred.shape
            pred_lr = pred.reshape(h // scale, scale, w // scale, scale, 3).mean((1, 3))
            cons = jnp.mean((pred_lr - lr_gt) ** 2)
            reg = wavelet_l1(params["encoder"], self.nerf_cfg.triplane,
                             self.cfg.weighted_regularization)
            loss = (weights["l2_hr"] * l2 + weights["l1_hr"] * l1
                    + weights["consistency"] * cons + weights["reg"] * reg)
            aux = {"l2_hr": l2, "l1_hr": l1, "consistency": cons, "reg": reg}
            if self.lpips_params is not None:
                from ..utils.lpips import lpips as lpips_dist

                percep = lpips_dist(
                    self.lpips_params, jnp.clip(pred_lr, 0, 1)[None],
                    jnp.clip(lr_gt, 0, 1)[None], net=self.lpips_net,
                ).mean()
                loss = loss + weights["percep"] * percep
                aux["consistency_perceptual"] = percep
            if self._use_sds and sds_t_bounds is not None:
                # optional score-distillation term on the rendered HR crop
                # (reference triplane_wavelet_sr.py:630-649)
                sds = self.guidance.sds_loss(
                    k_sds, lr_gt[None], pred[None], t_bounds=sds_t_bounds
                )
                loss = loss + weights["sds"] * sds
                aux["sds"] = sds
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        aux["loss"] = loss
        return self._apply_updates(state, grads, aux)

    # --------------------------------------------------------------- shared

    def _update_grid_impl(self, state: SRState):
        rng, k = jax.random.split(state.rng)
        lr_res = self.nerf_cfg.triplane.resolution // max(
            self.nerf_cfg.triplane.low_res_scale, 1
        )
        planes = self.field.build_planes(
            state.params,
            max_resolution=max(2 * self.render_cfg.grid_size, lr_res),
        )

        def density_fn(pts):
            sigma, _ = self.field.density(state.params, planes, pts,
                                          resolution_mode="low_res")
            return sigma

        occ = R.update_density_grid(state.occ, density_fn, k, self.render_cfg)
        return state._replace(occ=occ, rng=rng)

    def _render_chunk_impl(self, params, occ, rays_o, rays_d, mode: str = "full"):
        return self._render(params, occ, rays_o, rays_d, mode, train=False)

    def _render_chunk_fit_impl(self, params, occ, rays_o, rays_d, mode: str = "full"):
        # train-budget render (no perturb/rng): the pseudo-GT cache refresh
        # path — the reference refreshes its HR cache through the TRAIN-time
        # renderer settings (render_high_res, triplane_wavelet_sr.py:797-829),
        # not the deep test-time budget, and the refresh fires ~V/refresh_every
        # times per step so the deep budget would cost ~4x the whole HR phase.
        return self._render(params, occ, rays_o, rays_d, mode, train=True)

    def render_view(self, params, occ, pose, intrinsics, H, W, mode="full",
                    rays=None, deep=True):
        """Full-frame chunked render; ``rays=(rays_o, rays_d)`` overrides the
        pinhole camera (LLFF/NDC precomputed grids). ``deep=False`` renders at
        the train-time budget (cache refreshes); ``deep=True`` is the test-time
        deep-sampling path (evaluation). Chunk results are materialized after
        the dispatch loop so transfers overlap compute (remote-TPU RTT)."""
        if rays is not None:
            rays_o = np.asarray(rays[0]).reshape(-1, 3)
            rays_d = np.asarray(rays[1]).reshape(-1, 3)
        else:
            rays_o, rays_d = rays_full_image(np.asarray(pose), intrinsics, H, W)
        chunk = self.eval_chunk if deep else max(self.eval_chunk, self.cfg.eval_chunk)
        render = self._render_chunk if deep else self._render_chunk_fit
        outs = []
        for s in range(0, H * W, chunk):
            ro, rd = rays_o[s : s + chunk], rays_d[s : s + chunk]
            pad = chunk - len(ro)
            if pad:
                ro = np.concatenate([ro, np.repeat(ro[-1:], pad, 0)])
                rd = np.concatenate([rd, np.repeat(rd[-1:], pad, 0)])
            out = render(params, occ, jnp.asarray(ro), jnp.asarray(rd), mode=mode)
            outs.append((out["image"], pad))
        imgs = [np.asarray(img)[: len(img) - pad] if pad else np.asarray(img)
                for img, pad in outs]
        return np.concatenate(imgs).reshape(H, W, 3)

    # ----------------------------------------------------------------- train

    def fit(self, state: SRState, scene: SRSceneData, log_every: int = 200,
            callback=None) -> SRState:
        from .data import shuffled_ray_stream, view_ray_grid

        cfg = self.cfg
        scale = scene.scale
        pregen = scene.pregen_rays
        lr_images = jnp.asarray(scene.lr.images[..., :3])
        stream = None
        if cfg.low_res_shuffled:
            stream = shuffled_ray_stream(scene.lr, cfg.num_rays_lr, cfg.seed,
                                         cfg.background_color)
        elif pregen:
            lr_ro = jnp.asarray(scene.lr.rays_o)
            lr_rd = jnp.asarray(scene.lr.rays_d)
        else:
            lr_poses = jnp.asarray(scene.lr.poses)
            lr_intr = jnp.asarray(scene.lr.intrinsics, jnp.float32)
        hr_grids = [view_ray_grid(scene.hr, v) for v in range(scene.num_views)]
        hr_intr = getattr(scene.hr, "intrinsics", None)
        Hh, Wh = scene.hr.H, scene.hr.W
        V = scene.num_views

        cache = np.zeros((V, Hh, Wh, 3), np.float32)
        cache_step = np.full((V,), -(10**9), np.int64)
        host_rng = np.random.default_rng(cfg.seed)
        crop_hr = cfg.crop_size_lr * scale

        t0 = time.time()
        base_step = int(state.step)
        for it in range(cfg.total_steps):
            step = base_step + it
            if step % cfg.update_extra_interval == 0:
                state = self._update_grid(state)
                self._maybe_retune_march(state)

            if step < cfg.sr_start_step:
                weights = {
                    "lr": jnp.float32(C(cfg.lambda_lr, step)),
                    "reg": jnp.float32(C(cfg.wavelet_regularization, step)),
                }
                if stream is not None:
                    ro_c, rd_c, rgb_c = next(stream)
                    state, aux = self._lr_stream_step(
                        state, jnp.asarray(ro_c), jnp.asarray(rd_c),
                        jnp.asarray(rgb_c), weights,
                    )
                elif pregen:
                    k = jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 7), step)
                    from ..data.rays import sample_ray_batch_pregen

                    ro_c, rd_c, rgb_c = sample_ray_batch_pregen(
                        k, lr_images, lr_ro, lr_rd, cfg.num_rays_lr
                    )
                    state, aux = self._lr_stream_step(state, ro_c, rd_c, rgb_c, weights)
                else:
                    state, aux = self._lr_step(state, lr_images, lr_poses, lr_intr, weights)
            else:
                v = int(host_rng.integers(0, V))
                if step - cache_step[v] >= cfg.hr_fit_refresh_every:
                    hr_render = self.render_view(
                        state.params, state.occ, None, hr_intr, Hh, Wh,
                        mode="high_res", rays=hr_grids[v], deep=False,
                    )
                    k = jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 1), step)
                    pseudo = self.guidance.generate_sr(
                        k,
                        jnp.asarray(scene.lr.images[v][None, ..., :3]),
                        jnp.asarray(hr_render[None]),
                        step=step,
                    )
                    cache[v] = np.asarray(pseudo[0])
                    cache_step[v] = step

                # crop aligned to the LR grid (crop_batch :274-333)
                x0l = int(host_rng.integers(0, scene.lr.H - cfg.crop_size_lr + 1))
                y0l = int(host_rng.integers(0, scene.lr.W - cfg.crop_size_lr + 1))
                x0, y0 = x0l * scale, y0l * scale
                ro = jnp.asarray(
                    hr_grids[v][0][x0 : x0 + crop_hr, y0 : y0 + crop_hr].reshape(-1, 3)
                )
                rd = jnp.asarray(
                    hr_grids[v][1][x0 : x0 + crop_hr, y0 : y0 + crop_hr].reshape(-1, 3)
                )
                pgt = jnp.asarray(cache[v, x0 : x0 + crop_hr, y0 : y0 + crop_hr])
                lgt = jnp.asarray(
                    scene.lr.images[v, x0l : x0l + cfg.crop_size_lr,
                                    y0l : y0l + cfg.crop_size_lr, :3]
                )
                weights = {
                    "l2_hr": jnp.float32(C(cfg.lambda_l2_hr, step)),
                    "l1_hr": jnp.float32(C(cfg.lambda_l1_hr, step)),
                    "consistency": jnp.float32(C(cfg.lambda_lr_consistency, step)),
                    "reg": jnp.float32(C(cfg.wavelet_regularization, step)),
                    "percep": jnp.float32(
                        C(cfg.lambda_lr_consistency_perceptual, step)),
                    "sds": jnp.float32(C(cfg.lambda_sds, step)),
                }
                sds_t_bounds = None
                if self._use_sds:
                    mn, mx = self.guidance.step_bounds(step)
                    sds_t_bounds = jnp.asarray([mn, mx], jnp.int32)
                state, aux = self._hr_step(state, ro, rd, pgt, lgt, weights,
                                           sds_t_bounds)

            if log_every and (it % log_every == 0 or it == cfg.total_steps - 1):
                print(f"sr step {step:6d} loss {float(aux['loss']):.5f} "
                      f"({'LR' if step < cfg.sr_start_step else 'HR'} phase, "
                      f"{(it + 1) / max(time.time() - t0, 1e-9):.1f} it/s)")
            if callback:
                callback(state, aux)
        return state

    # ----------------------------------------------------------------- eval

    def evaluate(self, state: SRState, scene: SRSceneData, tag: str = "final_results") -> Dict:
        import jax.image as jimage

        lpips_fn = None
        if self.lpips_params is not None:
            from ..utils.lpips import make_lpips_fn

            lpips_fn = make_lpips_fn(params=self.lpips_params, net=self.lpips_net)

        res_lr, res_hr, res_bilinear, res_ssim, res_lpips = [], [], [], [], []
        per_frame = []
        from .data import view_ray_grid

        for v in range(scene.num_views):
            lr_pred = self.render_view(state.params, state.occ, None, None,
                                       scene.lr.H, scene.lr.W, mode="low_res",
                                       rays=view_ray_grid(scene.lr, v))
            hr_pred = self.render_view(state.params, state.occ, None, None,
                                       scene.hr.H, scene.hr.W, mode="high_res",
                                       rays=view_ray_grid(scene.hr, v))
            lr_gt = scene.lr.images[v][..., :3]
            hr_gt = scene.hr.images[v][..., :3]
            bilinear = np.asarray(
                jimage.resize(jnp.asarray(lr_gt), hr_gt.shape, "bilinear")
            )
            m = {
                "view": v,
                "PSNR_lr": psnr_fn(lr_pred, lr_gt),
                "PSNR_hr": psnr_fn(hr_pred, hr_gt),
                "PSNR_bilinear": psnr_fn(bilinear, hr_gt),
                "SSIM_hr": ssim_fn(hr_pred, hr_gt),
            }
            if lpips_fn is not None:
                m["LPIPS_hr"] = lpips_fn(np.clip(hr_pred, 0, 1), hr_gt)
                res_lpips.append(m["LPIPS_hr"])
            per_frame.append(m)
            res_lr.append(m["PSNR_lr"])
            res_hr.append(m["PSNR_hr"])
            res_bilinear.append(m["PSNR_bilinear"])
            res_ssim.append(m["SSIM_hr"])
        results = {
            "PSNR_lr": float(np.mean(res_lr)),
            "PSNR_hr": float(np.mean(res_hr)),
            "PSNR_bilinear": float(np.mean(res_bilinear)),
            "SSIM_hr": float(np.mean(res_ssim)),
            "per_frame": per_frame,
        }
        if res_lpips:
            results["LPIPS_hr"] = float(np.mean(res_lpips))
        if self.workspace:
            step = int(state.step)
            with open(os.path.join(self.workspace, f"{tag}_{step}.json"), "w") as f:
                json.dump(results, f, indent=2)
        return results
