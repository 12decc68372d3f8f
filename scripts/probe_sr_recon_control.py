"""Control: fit the SAME 100^2 LR views with the recon Trainer (all its
quality machinery: error map, budget autotune, bbox clip, EMA) vs the
SRSystem's LR phase. Separates 'data/physics limit' from 'SRSystem deficit'.

Run: python -m scripts.probe_sr_recon_control
"""
import json
import time

import numpy as np

from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.render.renderer import RenderConfig, mark_untrained_grid
from trinerflet_tpu.sr.data import load_sr_scene_npz
from trinerflet_tpu.train.metrics import psnr
from trinerflet_tpu.train.trainer import Trainer, TrainConfig


def main():
    sr = load_sr_scene_npz("workspaces/sr_scene_100_400_hf.npz")
    scene = sr.lr  # composited 3-channel images, pinhole cameras
    nerf_cfg = NeRFConfig(
        triplane=TriplaneConfig(channels=16, resolution=1024, wavelet_scale=16,
                                low_res_scale=4),
        bound=1.0, hidden_dim=64, hidden_dim_color=64,
        compute_dtype="bfloat16", plane_dtype="bfloat16",
    )
    render_cfg = RenderConfig(bound=1.0, grid_size=128, density_thresh=1.0,
                              max_steps=1024, samples_per_ray_budget=24,
                              eval_samples_per_ray=96)
    train_cfg = TrainConfig(lr=1e-2, iters=2000, num_rays=8192,
                            wavelet_regularization=0.2, renderer="occgrid",
                            eval_chunk=16384)
    trainer = Trainer(nerf_cfg, render_cfg, train_cfg)
    grid = mark_untrained_grid(scene.poses, scene.intrinsics, render_cfg)
    state = trainer.init_state(density_grid=grid)
    t0 = time.time()
    state = trainer.fit(state, scene, log_every=500)
    wall = time.time() - t0
    vals = []
    for v in range(0, scene.num_views, 17):
        img, _ = trainer.render_image(state.params, state.occ, scene.poses[v],
                                      scene.intrinsics, scene.H, scene.W,
                                      bg_color=0.0)
        vals.append(psnr(np.asarray(img), scene.images[v][..., :3]))
    print(json.dumps({"recon_trainer_lr_fit_psnr_6view": round(float(np.mean(vals)), 3),
                      "per_view": [round(v, 2) for v in vals],
                      "wall_s": round(wall, 1)}))


if __name__ == "__main__":
    main()
