"""Diffusion x4-upscaler guidance: SDEdit refinement + SDS gradients.

TPU-native re-implementation of the reference's Stable Diffusion upscaler
wrapper (super_resolution/threestudio/models/guidance/
stable_diffusion_guidance_sr.py):

* DDPM/DDIM schedule math (diffusers' ``scaled_linear`` betas, ``add_noise``,
  eta=0 DDIM steps) implemented in jnp,
* ``generate_sr`` (sd_guidance_sr.py:692-849): SDEdit — sample t in
  [min_step, max_step], noise the *condition* LR image with ``noise_level``,
  run the DDIM tail conditioned on ``concat(latents, noisy_LR)``: iterations
  with t > ignore_t only re-noise the encoded HR render toward the next
  timestep; iterations below denoise with classifier-free guidance. Includes
  the image-CFG variant (``guidance_scale_sr``: unconditional branch uses a
  noised "-1" image, :781-798) and the resolution pad/crop handling (:708-758),
* ``compute_grad_sds`` (:223-344) as the reparameterized SDS loss, and the
  ``max_step_percent`` linear anneal (update_step, :983-1011).

The denoiser itself is ABSTRACT (``denoiser(latents, cond_image, t,
noise_level, text_cond) -> eps``): plug in a flax UNet with x4-upscaler
weights when available. Offline, :class:`OracleDenoiser` exercises the exact
same DDIM algebra while steering pred_x0 to a known target (used by the tests
and by the oracle-guided SR recipe), and ``make_resize_guidance`` provides a
weights-free interpolation fallback.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .config import C, ScheduledFloat

__all__ = [
    "DiffusionSchedule",
    "GuidanceConfig",
    "UpscalerGuidance",
    "Text2ImgGuidance",
    "OracleDenoiser",
    "make_oracle_guidance",
    "make_resize_guidance",
]


class DiffusionSchedule:
    """DDPM/DDIM noise schedule matching diffusers 0.16 (the version the
    reference pins, requirements.txt:7) with the published x4-upscaler
    scheduler config: scaled_linear betas in [0.0001, 0.02], 1000 train
    steps, ``steps_offset=1``, ``set_alpha_to_one=false`` (so the final DDIM
    step targets ``alphas_cumprod[0]``, not exactly 1). Golden-pinned against
    hand-transcribed diffusers-0.16 constants in
    tests/test_diffusion_schedule.py so a real checkpoint drop-in cannot be
    silently wrong (reference loader: stable_diffusion_guidance_sr.py:94-97,
    149-158)."""

    def __init__(self, num_train_timesteps: int = 1000,
                 beta_start: float = 0.0001, beta_end: float = 0.02,
                 steps_offset: int = 1, set_alpha_to_one: bool = False):
        self.num_train_timesteps = num_train_timesteps
        self.steps_offset = steps_offset
        betas = (
            jnp.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps) ** 2
        )
        self.betas = betas
        self.alphas = 1.0 - betas
        self.alphas_cumprod = jnp.cumprod(self.alphas)
        self.final_alpha_cumprod = (
            jnp.asarray(1.0, jnp.float32) if set_alpha_to_one
            else self.alphas_cumprod[0]
        )

    def add_noise(self, x: jnp.ndarray, noise: jnp.ndarray, t) -> jnp.ndarray:
        a = self.alphas_cumprod[t]
        return jnp.sqrt(a) * x + jnp.sqrt(1.0 - a) * noise

    def ddim_timesteps(self, num_inference_steps: int) -> jnp.ndarray:
        """Descending timestep ladder — diffusers 0.16 'leading' spacing plus
        the config's ``steps_offset`` (scheduling_ddim.py set_timesteps)."""
        step = self.num_train_timesteps // num_inference_steps
        ts = (jnp.arange(num_inference_steps) * step).round().astype(jnp.int32)
        return ts[::-1] + self.steps_offset

    def ddim_step(self, eps, t: int, t_prev: int, x):
        """Deterministic (eta=0) DDIM update. ``t_prev < 0`` selects the
        final alpha (diffusers' ``prev_timestep < 0`` branch). Returns
        (x_prev, pred_x0)."""
        a_t = self.alphas_cumprod[t]
        a_prev = jnp.where(
            t_prev >= 0,
            self.alphas_cumprod[jnp.maximum(t_prev, 0)],
            self.final_alpha_cumprod,
        )
        pred_x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        dir_x = jnp.sqrt(1.0 - a_prev) * eps
        return jnp.sqrt(a_prev) * pred_x0 + dir_x, pred_x0


# denoiser(latents (B,H,W,Cl+Cc), t (int), noise_level (int), text_cond (bool))
#   -> predicted eps (B,H,W,Cl)
Denoiser = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray, bool], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class GuidanceConfig:
    num_train_timesteps: int = 1000
    num_inference_steps: int = 75
    min_step_percent: ScheduledFloat = 0.02
    max_step_percent: ScheduledFloat = 0.98
    noise_level: int = 20                  # LR-condition noising label
    guidance_scale: float = 7.5            # text CFG
    guidance_scale_sr: float = -1.0        # image CFG (>1 enables; uncond = -1 image)
    sr_start_step: int = 0                 # anneal origin for max_step_percent
    anneal_end_step: int = -1              # step at which max hits final value
    max_step_percent_final: float = -1.0   # <=0 disables the anneal
    latent_scale: int = 1                  # spatial down-factor of the latent space


class UpscalerGuidance:
    """SDEdit pseudo-GT generation + SDS gradients over an abstract denoiser."""

    def __init__(
        self,
        cfg: GuidanceConfig,
        denoiser: Denoiser,
        encode: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
        decode: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    ):
        self.cfg = cfg
        self.schedule = DiffusionSchedule(cfg.num_train_timesteps)
        self.denoiser = denoiser
        self.encode = encode or (lambda x: x)
        self.decode = decode or (lambda z: z)

    # -------------------------------------------------------------- stepping

    def step_bounds(self, step: int) -> Tuple[int, int]:
        """(min_step, max_step) with the linear max anneal
        (sd_guidance_sr.py:983-1011)."""
        cfg = self.cfg
        mn = C(cfg.min_step_percent, step)
        mx = C(cfg.max_step_percent, step)
        if cfg.max_step_percent_final > 0 and cfg.anneal_end_step > cfg.sr_start_step:
            t = (step - cfg.sr_start_step) / (cfg.anneal_end_step - cfg.sr_start_step)
            t = min(max(t, 0.0), 1.0)
            mx = mx + (cfg.max_step_percent_final - mx) * t
        T = cfg.num_train_timesteps
        return int(T * mn), int(T * mx)

    # ------------------------------------------------------------- SDEdit

    def generate_sr(
        self,
        rng: jax.Array,
        lr_image: jnp.ndarray,    # (B, h, w, 3) in [0, 1]
        hr_render: jnp.ndarray,   # (B, H, W, 3) in [0, 1]
        step: int = 0,
        ignore_t: Optional[int] = None,
    ) -> jnp.ndarray:
        """Diffusion-refined pseudo-GT of the NeRF's own HR render, conditioned
        on the LR ground truth (SDEdit; generate_sr sd_guidance_sr.py:692-849).

        Returns (B, H, W, 3) in [0, 1].
        """
        cfg = self.cfg
        sch = self.schedule
        k_t, k_cond, k_init, k_uncond, k_loop = jax.random.split(rng, 5)
        if ignore_t is None:
            mn, mx = self.step_bounds(step)
            ignore_t = int(jax.random.randint(k_t, (), mn, mx + 1))

        image_hr = self.encode(hr_render)
        # condition: LR image resized to the latent spatial dims (reference
        # interpolates the LR render to the UNet's 128x128 condition size,
        # sd_guidance_sr.py:725-728) then noised at `noise_level` in [-1, 1]
        cond = 2.0 * lr_image - 1.0
        if cond.shape[1:3] != image_hr.shape[1:3]:
            cond = jax.image.resize(
                cond, cond.shape[:1] + image_hr.shape[1:3] + cond.shape[3:], "bilinear"
            )
        noise_level = jnp.asarray(cfg.noise_level, jnp.int32)
        cond_noise = jax.random.normal(k_cond, cond.shape)
        image = sch.add_noise(cond, cond_noise, noise_level)
        x = jax.random.normal(k_init, image_hr.shape)  # init_noise_sigma = 1 (DDIM)

        use_text_cfg = cfg.guidance_scale > 1.0
        use_img_cfg = cfg.guidance_scale_sr > 1.0 and use_text_cfg
        if use_img_cfg:
            uncond_src = jnp.zeros_like(cond) - 1.0
            image_uncond = sch.add_noise(uncond_src, jax.random.normal(k_uncond, cond.shape), noise_level)
        else:
            image_uncond = image

        timesteps = [int(v) for v in sch.ddim_timesteps(cfg.num_inference_steps)]
        keys = jax.random.split(k_loop, len(timesteps))
        for i, t in enumerate(timesteps):
            if t > ignore_t:
                # SDEdit: stay on the "encode + noise" trajectory of the HR render
                t_next = timesteps[i + 1] if i + 1 < len(timesteps) else 0
                noise = jax.random.normal(keys[i], image_hr.shape)
                x = sch.add_noise(image_hr, noise, jnp.asarray(t_next, jnp.int32))
                continue
            tt = jnp.asarray(t, jnp.int32)
            eps_c = self.denoiser(
                jnp.concatenate([x, image], axis=-1), tt, noise_level, True
            )
            if use_text_cfg or use_img_cfg:
                eps_u = self.denoiser(
                    jnp.concatenate([x, image_uncond], axis=-1), tt, noise_level,
                    not use_text_cfg,
                )
                scale = cfg.guidance_scale_sr if use_img_cfg else cfg.guidance_scale
                eps = eps_u + scale * (eps_c - eps_u)
            else:
                eps = eps_c
            t_prev = timesteps[i + 1] if i + 1 < len(timesteps) else -1
            x, _ = sch.ddim_step(eps, t, t_prev, x)

        img = self.decode(x)
        return jnp.clip(img, 0.0, 1.0)

    # ----------------------------------------------------------------- SDS

    def sds_loss(
        self,
        rng: jax.Array,
        lr_image: jnp.ndarray,
        hr_render: jnp.ndarray,
        step: int = 0,
        t_bounds: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Score-distillation loss (compute_grad_sds, sd_guidance_sr.py:223-344,
        via the reparameterization at :668-673): grad = w(t)(eps_pred - eps),
        returned as 0.5 * ||latents - stop_grad(latents - grad)||^2.

        ``t_bounds``: (2,) int32 [min, max] timestep range — pass this when
        calling under jit (host ``step``-based annealing is not traceable)."""
        cfg = self.cfg
        sch = self.schedule
        k_t, k_n, k_c = jax.random.split(rng, 3)
        if t_bounds is not None:
            t = jax.random.randint(k_t, (), t_bounds[0], t_bounds[1] + 1)
        else:
            mn, mx = self.step_bounds(step)
            t = int(jax.random.randint(k_t, (), mn, mx + 1))

        latents = self.encode(hr_render)
        cond = 2.0 * lr_image - 1.0
        if cond.shape[1:3] != latents.shape[1:3]:
            cond = jax.image.resize(
                cond, cond.shape[:1] + latents.shape[1:3] + cond.shape[3:], "bilinear"
            )
        noise_level = jnp.asarray(cfg.noise_level, jnp.int32)
        image = sch.add_noise(cond, jax.random.normal(k_c, cond.shape), noise_level)
        noise = jax.random.normal(k_n, latents.shape)
        tt = jnp.asarray(t, jnp.int32)
        latents_noisy = sch.add_noise(latents, noise, tt)
        eps_pred = jax.lax.stop_gradient(
            self.denoiser(jnp.concatenate([latents_noisy, image], axis=-1), tt, noise_level, True)
        )
        w = 1.0 - sch.alphas_cumprod[tt]
        grad = w * (eps_pred - noise)
        target = jax.lax.stop_gradient(latents - grad)
        return 0.5 * jnp.sum((latents - target) ** 2) / latents.shape[0]


class Text2ImgGuidance(UpscalerGuidance):
    """Text-to-image prior: img2img SDEdit + SDS with text CFG only.

    The reference *generation* system drives refinement with a text-to-image
    diffusion model (DeepFloyd/SD via threestudio guidance,
    trinerflet_text_to_3d.py:42-140) — NOT the x4 upscaler. This class keeps
    the UpscalerGuidance interface (so :class:`TextTo3DSystem` can take
    either) but its denoiser sees only ``(latents, t, text_cond)``: the
    ``lr_image`` argument is ignored, and refinement is pure img2img of the
    NeRF's own render under the text prompt.

    Plug in an SD2-style txt2img UNet via
    :func:`trinerflet_tpu.sr.diffusion.make_text2img_denoiser`.
    """

    def generate_sr(self, rng, lr_image, hr_render, step: int = 0,
                    ignore_t: Optional[int] = None) -> jnp.ndarray:
        cfg = self.cfg
        sch = self.schedule
        k_t, k_init, k_loop = jax.random.split(rng, 3)
        if ignore_t is None:
            mn, mx = self.step_bounds(step)
            ignore_t = int(jax.random.randint(k_t, (), mn, mx + 1))

        latents = self.encode(hr_render)
        x = jax.random.normal(k_init, latents.shape)
        use_cfg = cfg.guidance_scale > 1.0

        timesteps = [int(v) for v in sch.ddim_timesteps(cfg.num_inference_steps)]
        keys = jax.random.split(k_loop, len(timesteps))
        nl = jnp.asarray(cfg.noise_level, jnp.int32)  # unused by t2i denoisers
        for i, t in enumerate(timesteps):
            if t > ignore_t:
                t_next = timesteps[i + 1] if i + 1 < len(timesteps) else 0
                noise = jax.random.normal(keys[i], latents.shape)
                x = sch.add_noise(latents, noise, jnp.asarray(t_next, jnp.int32))
                continue
            tt = jnp.asarray(t, jnp.int32)
            eps_c = self.denoiser(x, tt, nl, True)
            if use_cfg:
                eps_u = self.denoiser(x, tt, nl, False)
                eps = eps_u + cfg.guidance_scale * (eps_c - eps_u)
            else:
                eps = eps_c
            t_prev = timesteps[i + 1] if i + 1 < len(timesteps) else -1
            x, _ = sch.ddim_step(eps, t, t_prev, x)
        return jnp.clip(self.decode(x), 0.0, 1.0)

    def sds_loss(self, rng, lr_image, hr_render, step: int = 0,
                 t_bounds: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.cfg
        sch = self.schedule
        k_t, k_n = jax.random.split(rng)
        if t_bounds is not None:
            t = jax.random.randint(k_t, (), t_bounds[0], t_bounds[1] + 1)
        else:
            mn, mx = self.step_bounds(step)
            t = int(jax.random.randint(k_t, (), mn, mx + 1))
        latents = self.encode(hr_render)
        noise = jax.random.normal(k_n, latents.shape)
        tt = jnp.asarray(t, jnp.int32)
        latents_noisy = sch.add_noise(latents, noise, tt)
        nl = jnp.asarray(cfg.noise_level, jnp.int32)
        eps_c = self.denoiser(latents_noisy, tt, nl, True)
        if cfg.guidance_scale > 1.0:
            eps_u = self.denoiser(latents_noisy, tt, nl, False)
            eps_pred = eps_u + cfg.guidance_scale * (eps_c - eps_u)
        else:
            eps_pred = eps_c
        eps_pred = jax.lax.stop_gradient(eps_pred)
        w = 1.0 - sch.alphas_cumprod[tt]
        grad = w * (eps_pred - noise)
        target = jax.lax.stop_gradient(latents - grad)
        return 0.5 * jnp.sum((latents - target) ** 2) / latents.shape[0]


# ---------------------------------------------------------------------------
# Offline denoisers
# ---------------------------------------------------------------------------

class OracleDenoiser:
    """Denoiser whose eps prediction makes DDIM's pred_x0 equal a known target
    — exercises the full SDEdit/DDIM algebra without diffusion weights; also
    the 'cheating upscaler' used by SR system tests (pseudo-GT == GT)."""

    def __init__(self, target: jnp.ndarray, schedule: DiffusionSchedule):
        self.target = target
        self.schedule = schedule

    def __call__(self, latents_in, t, noise_level, text_cond):
        x = latents_in[..., : self.target.shape[-1]]
        a = self.schedule.alphas_cumprod[t]
        return (x - jnp.sqrt(a) * self.target) / jnp.sqrt(jnp.maximum(1.0 - a, 1e-8))


def make_oracle_guidance(cfg: GuidanceConfig, target_hr: jnp.ndarray) -> UpscalerGuidance:
    sch = DiffusionSchedule(cfg.num_train_timesteps)
    return UpscalerGuidance(cfg, OracleDenoiser(2.0 * target_hr - 1.0, sch),
                            encode=lambda x: 2.0 * x - 1.0,
                            decode=lambda z: 0.5 * (z + 1.0))


class ConditioningDenoiser:
    """Weights-free denoiser that steers DDIM's pred_x0 toward the (noised)
    LR conditioning channels it receives — i.e. the diffusion loop acts as an
    iterative upsampler faithful to the per-view LR input. Unlike
    OracleDenoiser it uses ONLY information a real denoiser sees at call time,
    so it is the honest offline stand-in for the SD x4-upscaler prior."""

    def __init__(self, schedule: DiffusionSchedule, latent_channels: int = 3):
        self.schedule = schedule
        self.latent_channels = latent_channels

    def __call__(self, latents_in, t, noise_level, text_cond):
        x = latents_in[..., : self.latent_channels]
        cond = latents_in[..., self.latent_channels :][..., : self.latent_channels]
        # the conditioning was noised at `noise_level`; its expectation is
        # sqrt(a_nl) * clean_cond — rescale as the pred_x0 target
        a_nl = self.schedule.alphas_cumprod[noise_level]
        target = cond / jnp.sqrt(jnp.maximum(a_nl, 1e-8))
        a = self.schedule.alphas_cumprod[t]
        return (x - jnp.sqrt(a) * target) / jnp.sqrt(jnp.maximum(1.0 - a, 1e-8))


def make_cond_guidance(cfg: GuidanceConfig) -> UpscalerGuidance:
    """SDEdit guidance with the conditioning-faithful denoiser (no weights)."""
    sch = DiffusionSchedule(cfg.num_train_timesteps)
    return UpscalerGuidance(cfg, ConditioningDenoiser(sch),
                            encode=lambda x: 2.0 * x - 1.0,
                            decode=lambda z: 0.5 * (z + 1.0))


def make_resize_guidance(cfg: GuidanceConfig, scale: int = 4):
    """Weights-free fallback: pseudo-GT = bilinear upsample of the LR ground
    truth blended with the HR render (keeps the SR pipeline functional when no
    diffusion checkpoint is available)."""

    class _Resize:
        def __init__(self):
            self.cfg = cfg  # same introspection surface as UpscalerGuidance

        def generate_sr(self, rng, lr_image, hr_render, step=0, ignore_t=None):
            up = jax.image.resize(lr_image, hr_render.shape, "bilinear")
            return jnp.clip(0.7 * up + 0.3 * hr_render, 0.0, 1.0)

        def step_bounds(self, step):
            return 0, cfg.num_train_timesteps

        def sds_loss(self, rng, lr_image, hr_render, step=0, t_bounds=None):
            up = jax.image.resize(lr_image, hr_render.shape, "bilinear")
            return jnp.mean((hr_render - jax.lax.stop_gradient(up)) ** 2)

    return _Resize()
