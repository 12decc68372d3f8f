"""Round-3 run of the 0.1 dB-parity protocol (BASELINE.md checks 1-3).

One quick occgrid training run (100 views 128^2, 512^2 triplane, 1200 iters),
then, on the SAME parameters:

1. occgrid-vs-dense cross-render at the deep eval budget (render-path
   isolation; reference renderer has one path, so the two must agree),
2. EMA-vs-raw-params eval (reference semantics = EMA on, utils.py:820),
3. deep-eval budget sweep 24/48/96/192 — PSNR must plateau (<0.05 dB/double)
   at the recorded setting, proving no budget truncation in reported numbers.

Run: nohup python -u -m scripts.quality_protocol > /tmp/qproto.log 2>&1 &
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


def eval_psnr(params, renderer_kind: str, deep: int):
    # one Trainer per (renderer, budget): each distinct eval config is a
    # separate remote-TPU compile (30-120 s) — never compile the same twice
    key = (renderer_kind, deep)
    if key not in _trainers:
        rc = dataclasses.replace(render_cfg, eval_samples_per_ray=deep)
        tc = dataclasses.replace(train_cfg, renderer=renderer_kind)
        _trainers[key] = Trainer(nerf_cfg, rc, tc)
    tr = _trainers[key]
    ps = []
    for v in test_views:
        img, _ = tr.render_image(params, state.occ, scene.poses[v],
                                 scene.intrinsics, H, W)
        gt = scene.images[v][..., :3] * scene.images[v][..., 3:]
        ps.append(float(psnr(img, np.asarray(gt))))
    return round(float(np.mean(ps)), 3)


out = {}
# check 1: render-path isolation at deep budget
out["occgrid_deep96"] = eval_psnr(state.ema_params, "occgrid", 96)
out["dense_deep96"] = eval_psnr(state.ema_params, "dense", 96)
out["cross_render_gap_db"] = round(abs(out["occgrid_deep96"] - out["dense_deep96"]), 3)
print("check1 (cross-render):", out, flush=True)

# check 2: EMA ablation
out["raw_params_deep96"] = eval_psnr(state.params, "occgrid", 96)
out["ema_delta_db"] = round(out["occgrid_deep96"] - out["raw_params_deep96"], 3)
print("check2 (EMA):", out["ema_delta_db"], flush=True)

# check 3: deep-budget plateau
sweep = {b: eval_psnr(state.ema_params, "occgrid", b) for b in (24, 48, 96, 192)}
out["deep_sweep"] = sweep
out["plateau_last_double_db"] = round(sweep[192] - sweep[96], 3)
print("check3 (plateau):", sweep, flush=True)

print(json.dumps(out, indent=2))
