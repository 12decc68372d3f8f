"""Quality gate for the bf16 IDWT ladder (plane_dtype=bfloat16 now runs the
synthesis matmuls in bf16, PERF.md round 3): rerun the strided arm of
scripts/quality_stride_ab.py at identical settings and compare against the
recorded f32-ladder result (BENCH_notes r3_occ_stride_quality_ab: 24.95 dB,
stride auto). Accept if within ~0.1 dB.

Run: nohup python -u -m scripts.quality_bf16_ladder_ab > /tmp/qbf16.log 2>&1 &
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
                        background_color=0.0, eval_chunk=16384)

rc = R.RenderConfig(bound=1.0, grid_size=128, density_thresh=10.0,
                    max_steps=1024, samples_per_ray_budget=24,
                    dt_gamma=0.0, eval_samples_per_ray=96,
                    occ_test_stride=0)
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
print(f"bf16 ladder, stride auto: val PSNR {float(np.mean(ps)):.3f} "
      f"(f32-ladder reference: 24.95)  wall {wall:.0f}s", flush=True)
