"""Round-1 occgrid-vs-dense quality control, re-run with diagnostics (TPU).

Replicates BASELINE.md's control (100 views 128^2, 512^2 triplane, 1200 iters)
across training variants to attribute the 3.4 dB gap. Run on the real chip:
  nohup python -u scripts/occgap_tpu.py > /tmp/occgap_tpu.log 2>&1 &
"""
import dataclasses
import json
import sys
import time

import numpy as np

import jax

from trinerflet_tpu.data.blender import SceneData
from trinerflet_tpu.data.synthetic import make_synthetic_scene
from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.render import renderer as R
from trinerflet_tpu.train.metrics import psnr
from trinerflet_tpu.train.trainer import Trainer, TrainConfig

H = W = 128
NV = 100
scene = make_synthetic_scene(num_views=NV + 4, H=H, W=W, num_steps=256)
train_scene = SceneData(images=scene.images[:NV], poses=scene.poses[:NV],
                        intrinsics=scene.intrinsics, H=H, W=W)
test_views = list(range(NV, NV + 4))

nerf_cfg = NeRFConfig(
    triplane=TriplaneConfig(channels=16, resolution=512, wavelet_scale=8),
    bound=1.0,
    compute_dtype="bfloat16", plane_dtype="bfloat16",
)
base_render = R.RenderConfig(
    bound=1.0, grid_size=128, density_thresh=10.0, max_steps=1024,
    samples_per_ray_budget=24, dt_gamma=0.0, num_steps=512,
)
base_train = TrainConfig(lr=1e-2, iters=1200, num_rays=8192,
                         wavelet_regularization=0.05, renderer="occgrid",
                         background_color=0.0, eval_chunk=16384)

VARIANTS = {
    "occgrid_B24": {},
    "dense512": {"train": {"renderer": "dense"}},
    "occgrid_B48": {"render": {"samples_per_ray_budget": 48, "coarse_budget": 12}},
    "occgrid_B24_thresh0.25": {"render": {"occ_thresh_scale": 0.25}},
    "occgrid_B48_thresh0.25": {"render": {"samples_per_ray_budget": 48,
                                          "coarse_budget": 12,
                                          "occ_thresh_scale": 0.25}},
}

which = sys.argv[1:] or list(VARIANTS)
results = {}
for name in which:
    mod = VARIANTS[name]
    rc = dataclasses.replace(base_render, **mod.get("render", {}))
    tc = dataclasses.replace(base_train, **mod.get("train", {}))
    trainer = Trainer(nerf_cfg, rc, tc)
    grid = R.mark_untrained_grid(train_scene.poses, train_scene.intrinsics, rc)
    state = trainer.init_state(density_grid=grid)
    t0 = time.time()
    state = trainer.fit(state, train_scene, log_every=400)
    wall = time.time() - t0
    params = state.ema_params

    ps = []
    for v in test_views:
        img, _ = trainer.render_image(params, state.occ, scene.poses[v],
                                      scene.intrinsics, H, W)
        gt = scene.images[v][..., :3] * scene.images[v][..., 3:]
        ps.append(psnr(img, np.asarray(gt)))
    # cross-eval: same params through the dense renderer (render-path isolation)
    tr_d = Trainer(nerf_cfg, rc, dataclasses.replace(tc, renderer="dense"))
    ps_d = []
    for v in test_views:
        img, _ = tr_d.render_image(params, state.occ, scene.poses[v],
                                   scene.intrinsics, H, W)
        gt = scene.images[v][..., :3] * scene.images[v][..., 3:]
        ps_d.append(psnr(img, np.asarray(gt)))

    # overflow stats: fraction of train rays whose occupied count exceeds B
    occ_frac = float(np.asarray(state.occ.occ, bool).mean())
    results[name] = {
        "wall_s": round(wall, 1),
        "psnr_own_path": round(float(np.mean(ps)), 2),
        "psnr_dense_render": round(float(np.mean(ps_d)), 2),
        "occ_fraction": round(occ_frac, 4),
        "mean_density": round(float(state.occ.mean_density), 3),
    }
    print(name, results[name], flush=True)

print(json.dumps(results, indent=2))
