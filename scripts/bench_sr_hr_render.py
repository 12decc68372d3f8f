"""Measure the SR HR full-frame render cost with vs without the occupied-bbox
ray clipping (+ trained-grid seeding) that round 3 wired into SRSystem
(VERDICT r2 weak #7 / next #8). Equal params, equal PSNR by construction —
the bbox only clips the march's candidate span.

Run: nohup python -u -m scripts.bench_sr_hr_render > /tmp/bsrhr.log 2>&1 &
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.render.renderer import RenderConfig
from trinerflet_tpu.sr.data import make_synthetic_sr_scene
from trinerflet_tpu.sr.guidance import GuidanceConfig, make_resize_guidance
from trinerflet_tpu.sr.system import SRConfig, SRSystem

import os

smoke = os.environ.get("SMOKE") == "1"
scene = make_synthetic_sr_scene(num_views=4 if smoke else 8,
                                lr_size=16 if smoke else 64, scale=4, seed=0)
nerf_cfg = NeRFConfig(
    triplane=TriplaneConfig(channels=16, resolution=64 if smoke else 512,
                            wavelet_scale=4 if smoke else 8, low_res_scale=4),
    bound=1.0, compute_dtype="bfloat16", plane_dtype="bfloat16",
)
render_cfg = RenderConfig(bound=1.0, grid_size=32 if smoke else 128,
                          density_thresh=1.0, max_steps=128 if smoke else 512,
                          samples_per_ray_budget=24)
cfg = SRConfig(total_steps=40 if smoke else 600, sr_start_step=10**9,
               num_rays_lr=512 if smoke else 8192,
               update_extra_interval=8 if smoke else 16)
guidance = make_resize_guidance(GuidanceConfig(), scale=4)
sys_ = SRSystem(nerf_cfg, render_cfg, cfg, guidance, workspace="/tmp/bsrhr_ws")

# short LR fit so the occupancy grid concentrates on the object
state = sys_.init_state()
state = sys_.fit(state, scene, log_every=200)

H, W = scene.hr.images.shape[1:3]
pose = scene.hr.poses[0]
intr = scene.hr.intrinsics


def render(occ):
    return sys_.render_view(state.params, occ, pose, intr, H, W,
                            mode="high_res")


def timed(occ, reps=5):
    img = render(occ)
    np.asarray(img)
    t0 = time.perf_counter()
    for _ in range(reps):
        img = render(occ)
    np.asarray(img)
    return (time.perf_counter() - t0) / reps * 1e3, img


occ_clip = state.occ
occ_full = state.occ._replace(
    bbox=jnp.asarray(render_cfg.aabb, jnp.float32))

ms_full, img_full = timed(occ_full)
ms_clip, img_clip = timed(occ_clip)
gt = np.asarray(scene.hr.images[0][..., :3], np.float32)


def psnr(a):
    mse = float(np.mean((np.asarray(a, np.float32) - gt) ** 2))
    return round(-10 * np.log10(max(mse, 1e-12)), 2)


print(json.dumps({
    "hr_render_ms_full_aabb": round(ms_full, 1),
    "hr_render_ms_occ_bbox": round(ms_clip, 1),
    "speedup": round(ms_full / ms_clip, 2),
    "psnr_full": psnr(img_full),
    "psnr_clip": psnr(img_clip),
    "bbox": [round(float(v), 3) for v in np.asarray(state.occ.bbox)],
}, indent=2))
