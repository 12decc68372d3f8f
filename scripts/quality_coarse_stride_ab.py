"""Quality gate for the strided COARSE occupancy test: hard-scene A/B.

Same protocol as scripts/quality_fb_ab.py / quality_stride_ab.py (512^2
triplane, 1000 iters, 8k rays on the high-frequency scene, deep eval on 4
test views): coarse_test_stride 1 (exact, round-3 default) vs 2 and 3
(group-center probes of the radius-scaled dilated grid). Flip the auto
default only if within ~0.1 dB of stride 1.

Run: nohup python -u -m scripts.quality_coarse_stride_ab > /tmp/qcs.log 2>&1 &
"""
import os
import subprocess
import sys
import time

import numpy as np

from trinerflet_tpu.data.blender import load_blender
from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.render import renderer as R
from trinerflet_tpu.train.metrics import psnr
from trinerflet_tpu.train.trainer import Trainer, TrainConfig

ROOT = "/tmp/hf_scene"
if not os.path.isdir(ROOT):
    subprocess.run([sys.executable, "-m", "scripts.gen_hf_scene", ROOT,
                    "200", "40"], check=True, cwd="/root/repo")

scene = load_blender(ROOT, split="train", scale=1.0)
test = load_blender(ROOT, split="test", scale=1.0)

nerf_cfg = NeRFConfig(
    triplane=TriplaneConfig(channels=16, resolution=512, wavelet_scale=8),
    bound=1.0, compute_dtype="bfloat16", plane_dtype="bfloat16",
)
train_cfg = TrainConfig(lr=1e-2, iters=1000, num_rays=8192,
                        wavelet_regularization=0.2, renderer="occgrid",
                        background_color=0.0, eval_chunk=16384,
                        budget_autotune=True)

for cs in (1, 2, 3):
    rc = R.RenderConfig(bound=1.0, grid_size=128, density_thresh=10.0,
                        max_steps=1024, samples_per_ray_budget=24,
                        dt_gamma=0.0, eval_samples_per_ray=96,
                        coarse_test_stride=cs)
    trainer = Trainer(nerf_cfg, rc, train_cfg)
    grid = R.mark_untrained_grid(scene.poses, scene.intrinsics, rc)
    state = trainer.init_state(density_grid=grid)
    t0 = time.time()
    state = trainer.fit(state, scene, log_every=500)
    wall = time.time() - t0
    ps = []
    for v in range(min(4, test.images.shape[0])):
        img, _ = trainer.render_image(state.ema_params, state.occ,
                                      test.poses[v], test.intrinsics,
                                      test.H, test.W)
        gt = test.images[v][..., :3] * test.images[v][..., 3:]
        ps.append(float(psnr(img, np.asarray(gt))))
    print(f"coarse_test_stride={cs} (radius {rc.coarse_dilation_radius}): "
          f"val PSNR {float(np.mean(ps)):.3f}  wall {wall:.0f}s  "
          f"tuned_B {trainer.render_cfg.samples_per_ray_budget}", flush=True)
