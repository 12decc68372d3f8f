"""Text/guidance-driven 3D generation with the wavelet triplane.

Counterpart of the reference ``trinerflet-generation`` system
(super_resolution/threestudio/systems/trinerflet_text_to_3d.py:42-140):
optimize the wavelet-triplane NeRF from scratch under diffusion guidance over
randomly sampled orbit cameras, with the reference's round-based cached
pseudo-GT refresh (``views_per_refresh``): each round renders a batch of views,
refines them with the guidance's ``generate_sr``, and fits the NeRF to the
cached targets (plus optional direct SDS).

The guidance is the abstract denoiser stack from :mod:`.guidance`; offline it
runs with the oracle/resize denoisers (tests), with real text-to-image weights
it becomes DeepFloyd/SD-style generation like the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.rays import rays_full_image
from ..data.synthetic import orbit_pose
from ..models.nerf import NeRFConfig
from ..models.triplane import wavelet_l1
from ..render import renderer as R
from .config import C, ScheduledFloat
from .system import SRSystem, SRConfig, SRState

__all__ = ["TextTo3DConfig", "TextTo3DSystem", "sample_orbit_cameras"]


def sample_orbit_cameras(rng: np.random.Generator, n: int, radius_range=(1.6, 2.2),
                         theta_range=(np.pi / 3, 2 * np.pi / 3)):
    """Random orbit cameras (reference provider.rand_poses / uncond data)."""
    poses = []
    for _ in range(n):
        theta = rng.uniform(*theta_range)
        phi = rng.uniform(0, 2 * np.pi)
        radius = rng.uniform(*radius_range)
        poses.append(orbit_pose(theta, phi, radius))
    return np.stack(poses)


@dataclasses.dataclass(frozen=True)
class TextTo3DConfig:
    total_steps: int = 4000
    views_per_refresh: int = 8       # cached multi-view pseudo-GT per round
    refresh_every: int = 400
    render_size: int = 128
    fovy_deg: float = 50.0
    lr: float = 1e-2
    num_rays: int = 4096
    lambda_fit: ScheduledFloat = 1.0
    lambda_sds: ScheduledFloat = 0.0
    wavelet_regularization: ScheduledFloat = 0.1
    background_color: float = 0.0
    update_extra_interval: int = 16
    eval_chunk: int = 16384
    seed: int = 0


class TextTo3DSystem:
    """Round-based generation loop built on the SR system's machinery."""

    def __init__(self, nerf_cfg: NeRFConfig, render_cfg: R.RenderConfig,
                 cfg: TextTo3DConfig, guidance, workspace: Optional[str] = None):
        self.cfg = cfg
        sr_cfg = SRConfig(
            total_steps=cfg.total_steps, sr_start_step=0, lr=cfg.lr,
            num_rays_lr=cfg.num_rays, background_color=cfg.background_color,
            wavelet_regularization=cfg.wavelet_regularization,
            update_extra_interval=cfg.update_extra_interval,
            eval_chunk=cfg.eval_chunk, seed=cfg.seed,
        )
        # reuse the SR system's render/step/occupancy plumbing
        nerf_cfg = dataclasses.replace(
            nerf_cfg,
            triplane=dataclasses.replace(nerf_cfg.triplane, low_res_scale=max(
                nerf_cfg.triplane.low_res_scale, 2)),
        )
        self.inner = SRSystem(nerf_cfg, render_cfg, sr_cfg, guidance, workspace)
        self.guidance = guidance

    def init_state(self) -> SRState:
        return self.inner.init_state()

    def fit(self, state: SRState, log_every: int = 200, callback=None) -> SRState:
        cfg = self.cfg
        host_rng = np.random.default_rng(cfg.seed)
        S = cfg.render_size
        fy = 0.5 * S / np.tan(0.5 * np.deg2rad(cfg.fovy_deg))
        intr = (fy, fy, S / 2.0, S / 2.0)

        poses = sample_orbit_cameras(host_rng, cfg.views_per_refresh)
        targets = np.zeros((cfg.views_per_refresh, S, S, 3), np.float32)
        last_refresh = -(10**9)

        for it in range(cfg.total_steps):
            step = it
            if step % cfg.update_extra_interval == 0:
                state = self.inner._update_grid(state)

            if step - last_refresh >= cfg.refresh_every:
                # new camera round + pseudo-GT refresh (views_per_refresh)
                poses = sample_orbit_cameras(host_rng, cfg.views_per_refresh)
                for v in range(cfg.views_per_refresh):
                    render = self.inner.render_view(
                        state.params, state.occ, poses[v], intr, S, S,
                        mode="full", deep=False,
                    )
                    k = jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 3), step + v)
                    lr_proxy = jax.image.resize(
                        jnp.asarray(render[None]), (1, S // 4, S // 4, 3), "bilinear"
                    )
                    pseudo = self.guidance.generate_sr(
                        k, lr_proxy, jnp.asarray(render[None]), step=step
                    )
                    targets[v] = np.asarray(pseudo[0])
                last_refresh = step

            # fit a random cached view crop via the SR system's HR step
            v = int(host_rng.integers(0, cfg.views_per_refresh))
            crop = min(64, S)
            x0 = int(host_rng.integers(0, S - crop + 1))
            y0 = int(host_rng.integers(0, S - crop + 1))
            dy, dx = np.meshgrid(np.arange(crop), np.arange(crop), indexing="ij")
            pix = ((x0 + dy) * S + (y0 + dx)).reshape(-1).astype(np.int32)
            from ..data.rays import rays_for_pixels

            ro, rd = rays_for_pixels(
                jnp.asarray(poses), jnp.asarray(intr, jnp.float32), S,
                jnp.full((len(pix),), v, jnp.int32), jnp.asarray(pix),
            )
            tgt = jnp.asarray(targets[v, x0:x0 + crop, y0:y0 + crop])
            lr_tgt = jax.image.resize(tgt[None], (1, crop // 4, crop // 4, 3), "bilinear")[0]
            weights = {
                "l2_hr": jnp.float32(C(cfg.lambda_fit, step)),
                "l1_hr": jnp.float32(0.0),
                "consistency": jnp.float32(0.0),
                "reg": jnp.float32(C(cfg.wavelet_regularization, step)),
                "percep": jnp.float32(0.0),
                "sds": jnp.float32(0.0),
            }
            state, aux = self.inner._hr_step(state, ro, rd, tgt, lr_tgt, weights)

            if log_every and (it % log_every == 0 or it == cfg.total_steps - 1):
                print(f"gen step {step:6d} loss {float(aux['loss']):.5f}")
            if callback:
                callback(state, aux)
        return state

    def render_turntable(self, state: SRState, out_path: str, frames: int = 30):
        imgs = []
        S = self.cfg.render_size
        fy = 0.5 * S / np.tan(0.5 * np.deg2rad(self.cfg.fovy_deg))
        intr = (fy, fy, S / 2.0, S / 2.0)
        for i in range(frames):
            pose = orbit_pose(1.2, 2 * np.pi * i / frames, 2.0)
            img = self.inner.render_view(state.params, state.occ, pose, intr, S, S)
            imgs.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
        from ..cli import write_video

        write_video(out_path, imgs)
        return out_path
