"""Attribution follow-up to scripts/quality_protocol.py (round 3).

The first protocol run measured occgrid_deep96=40.81 vs dense_deep96=38.05
(gap 2.77 dB, occgrid BETTER) and a deep sweep that had not plateaued at 192
(+0.73 dB for 96->192). Two hypotheses to separate:

  H1 (free-space garbage): an occgrid-trained field is unsupervised outside
     occupied cells, so the dense path integrates garbage density the
     occupied-cell march never touches. Prediction: masking sigma with the
     occupancy grid in the dense path recovers most of the gap, and raising
     dense num_steps alone does not.
  H2 (sampling density): dense uses num_steps uniform samples over the whole
     [near, far] span (dt ~ 2x the occgrid march's). Prediction: dense
     num_steps 1024/2048 closes the gap.

Also extends the deep-eval sweep (96..768) to find the true plateau for this
short-training (1200 it) occupancy, so BASELINE.md can state the budget rule
("double until <0.05 dB/double") with a measured curve.

Run (TPU): cd /root/repo && nohup python -u -m scripts.quality_protocol2 > /tmp/qproto2.log 2>&1 &
"""
import dataclasses
import json
import time

import numpy as np

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
    bound=1.0, compute_dtype="bfloat16", plane_dtype="bfloat16",
)
render_cfg = R.RenderConfig(
    bound=1.0, grid_size=128, density_thresh=10.0, max_steps=1024,
    samples_per_ray_budget=24, dt_gamma=0.0, num_steps=512,
)
train_cfg = TrainConfig(lr=1e-2, iters=1200, num_rays=8192,
                        wavelet_regularization=0.05, renderer="occgrid",
                        background_color=0.0, eval_chunk=16384)

trainer = Trainer(nerf_cfg, render_cfg, train_cfg)
grid = R.mark_untrained_grid(train_scene.poses, train_scene.intrinsics, render_cfg)
state = trainer.init_state(density_grid=grid)
t0 = time.time()
state = trainer.fit(state, train_scene, log_every=400)
print(f"trained in {time.time() - t0:.0f} s", flush=True)

_trainers = {}


def eval_psnr(renderer_kind: str, deep: int, num_steps: int = 512,
              occ_mask_dense: bool = False):
    key = (renderer_kind, deep, num_steps, occ_mask_dense)
    if key not in _trainers:
        rc = dataclasses.replace(render_cfg, eval_samples_per_ray=deep,
                                 num_steps=num_steps,
                                 occ_mask_dense=occ_mask_dense)
        tc = dataclasses.replace(train_cfg, renderer=renderer_kind)
        _trainers[key] = Trainer(nerf_cfg, rc, tc)
    tr = _trainers[key]
    ps = []
    for v in test_views:
        img, _ = tr.render_image(state.ema_params, state.occ, scene.poses[v],
                                 scene.intrinsics, H, W)
        gt = scene.images[v][..., :3] * scene.images[v][..., 3:]
        ps.append(float(psnr(img, np.asarray(gt))))
    return round(float(np.mean(ps)), 3)


out = {}
# baseline pair (reproduces protocol run 1)
out["occgrid_deep96"] = eval_psnr("occgrid", 96)
out["dense_512"] = eval_psnr("dense", 96, num_steps=512)
print("baselines:", out, flush=True)

# H2: sampling density
out["dense_1024"] = eval_psnr("dense", 96, num_steps=1024)
out["dense_2048"] = eval_psnr("dense", 96, num_steps=2048)
print("H2 (denser uniform):", out, flush=True)

# H1: free-space supervision — occupancy-masked sigma in the dense path
out["dense_512_occmask"] = eval_psnr("dense", 96, num_steps=512,
                                     occ_mask_dense=True)
out["dense_1024_occmask"] = eval_psnr("dense", 96, num_steps=1024,
                                      occ_mask_dense=True)
print("H1 (occ-masked dense):", out, flush=True)

# extended deep sweep to the plateau
sweep = {b: eval_psnr("occgrid", b) for b in (96, 192, 384, 768)}
out["deep_sweep_ext"] = sweep
print("extended sweep:", sweep, flush=True)

print(json.dumps(out, indent=2))
