"""SR app on TPU: full two-phase run on the hf scene at x4, comparing
guidance modes (resize fallback vs oracle-denoiser SDEdit through the real
DDIM loop). Run: nohup python -u -m scripts.sr_tpu_run > /tmp/sr_tpu.log 2>&1 &
"""
import json
import sys
import time

import numpy as np
import jax.numpy as jnp

from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.render.renderer import RenderConfig
from trinerflet_tpu.sr.data import make_synthetic_sr_scene
from trinerflet_tpu.sr.guidance import (
    GuidanceConfig, make_cond_guidance, make_oracle_guidance, make_resize_guidance,
)
from trinerflet_tpu.sr.system import SRConfig, SRSystem

mode = sys.argv[1] if len(sys.argv) > 1 else "resize"

scene = make_synthetic_sr_scene(num_views=12, lr_size=64, scale=4, seed=0)

nerf_cfg = NeRFConfig(
    triplane=TriplaneConfig(channels=16, resolution=512, wavelet_scale=8,
                            low_res_scale=4),
    bound=1.0, compute_dtype="bfloat16", plane_dtype="bfloat16",
)
render_cfg = RenderConfig(bound=1.0, grid_size=128, density_thresh=1.0,
                          max_steps=512, samples_per_ray_budget=24)
cfg = SRConfig(total_steps=1400, sr_start_step=800, hr_fit_refresh_every=200,
               num_rays_lr=8192, crop_size_lr=32, lambda_l1_hr=0.2)

gcfg = GuidanceConfig(num_inference_steps=24, noise_level=20,
                      guidance_scale=1.0, max_step_percent=0.6)
if mode == "cond":
    # conditioning-faithful SDEdit: the full DDIM tail with a prior that only
    # sees what a real denoiser sees (honest weights-free stand-in)
    guidance = make_cond_guidance(gcfg)
elif mode == "oracle":
    # oracle pred-x0 = the true HR mean image: exercises the FULL SDEdit DDIM
    # tail on-chip (what a real SD checkpoint would run) with a prior that
    # knows the answer
    guidance = make_oracle_guidance(
        gcfg, jnp.asarray(scene.hr.images[..., :3]).mean(0, keepdims=True))
else:
    guidance = make_resize_guidance(gcfg, scale=4)

sys_ = SRSystem(nerf_cfg, render_cfg, cfg, guidance, workspace=f"/tmp/sr_ws_{mode}")
state = sys_.init_state()
t0 = time.time()
state = sys_.fit(state, scene, log_every=200)
wall = time.time() - t0
res = sys_.evaluate(state, scene)
res = {k: v for k, v in res.items() if k != "per_frame"}
res["wall_s"] = round(wall, 1)
res["mode"] = mode
print(json.dumps(res, indent=2))
