"""Probe: why did the reference-scale SR run underfit (LR PSNR 21.7)?

Hypothesis: the static march budget (max_steps 512 / budget 24, the r2 toy
config) truncates on the hf scene — the same 4.5-8.9 dB failure mode the r4
quality gate measured for static budget cuts on recon. LR-phase-only fits at
a grid of (max_steps, budget) on the cached 100^2 scene, PSNR_lr on 6 views.

Run: python -m scripts.probe_sr_lrfit
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from trinerflet_tpu.data.synthetic import make_synthetic_scene  # noqa: F401
from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.render.renderer import RenderConfig
from trinerflet_tpu.sr.data import load_sr_scene_npz, view_ray_grid
from trinerflet_tpu.sr.guidance import GuidanceConfig, make_resize_guidance
from trinerflet_tpu.sr.system import SRConfig, SRSystem


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def run_probe(scene, max_steps, budget, steps=1500, low_res_scale=4):
    nerf_cfg = NeRFConfig(
        triplane=TriplaneConfig(channels=16, resolution=1024, wavelet_scale=16,
                                wavelet_type="bior6.8",
                                low_res_scale=low_res_scale),
        bound=1.0, hidden_dim=64, hidden_dim_color=64,
        compute_dtype="bfloat16",
    )
    render_cfg = RenderConfig(bound=1.0, grid_size=128, density_thresh=1.0,
                              max_steps=max_steps,
                              samples_per_ray_budget=budget)
    cfg = SRConfig(total_steps=steps, sr_start_step=10**9,
                   hr_fit_refresh_every=500, lr=0.01, num_rays_lr=8192,
                   crop_size_lr=32, wavelet_regularization=0.2)
    guidance = make_resize_guidance(GuidanceConfig(), scale=scene.scale)
    sys_ = SRSystem(nerf_cfg, render_cfg, cfg, guidance)
    state = sys_.init_state()
    t0 = time.time()
    state = sys_.fit(state, scene, log_every=500)
    wall = time.time() - t0
    vals = []
    for v in range(0, scene.num_views, 17):
        pred = sys_.render_view(state.params, state.occ, None, None,
                                scene.lr.H, scene.lr.W, mode="low_res",
                                rays=view_ray_grid(scene.lr, v))
        vals.append(psnr(pred, scene.lr.images[v][..., :3]))
    return {"max_steps": max_steps, "budget": budget,
            "low_res_scale": low_res_scale,
            "psnr_lr_6view": round(float(np.mean(vals)), 3),
            "per_view": [round(v, 2) for v in vals],
            "wall_s": round(wall, 1)}


def main():
    scene = load_sr_scene_npz("workspaces/sr_scene_100_400_hf.npz")
    out = []
    for ms, b, lrs in [(512, 24, 4), (1024, 24, 4)]:
        r = run_probe(scene, ms, b, low_res_scale=lrs)
        out.append(r)
        print(json.dumps(r))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
