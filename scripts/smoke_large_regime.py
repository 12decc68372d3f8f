"""Memory/throughput smoke of the `large` recipe regime (VERDICT r4 next #2b).

The reference's `large` recipe trains 48-channel triplanes with hidden_dim
128 for 80k iters (README.md:55). This proves the 2048^2 x 48ch stage —
where the quad-packed sampler's transient take table grows ~1.5x beyond the
1.07 GB measured at 32ch — compiles and runs on one v5e chip without an OOM
cliff, and records its step time.

Run: nohup python -u -m scripts.smoke_large_regime > /tmp/large_smoke.log 2>&1 &
"""
import json
import time

import numpy as np

import jax

from trinerflet_tpu.data.synthetic import make_synthetic_scene
from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.render.renderer import RenderConfig, mark_untrained_grid
from trinerflet_tpu.train.trainer import Trainer, TrainConfig

nerf_cfg = NeRFConfig(
    triplane=TriplaneConfig(channels=48, resolution=2048, wavelet_scale=32),
    bound=1.0, hidden_dim=128, hidden_dim_color=128,
    compute_dtype="bfloat16", plane_dtype="bfloat16",
)
render_cfg = RenderConfig(bound=1.0, grid_size=128, density_thresh=1.0,
                          max_steps=512, samples_per_ray_budget=24)
train_cfg = TrainConfig(lr=1e-2, iters=400, num_rays=32768,
                        wavelet_regularization=0.4, renderer="occgrid")

scene = make_synthetic_scene(num_views=12, H=128, W=128, variant="hf",
                             backend="jax")
trainer = Trainer(nerf_cfg, render_cfg, train_cfg)
grid = mark_untrained_grid(scene.poses, scene.intrinsics, render_cfg)
state = trainer.init_state(density_grid=grid)

t0 = time.time()
state = trainer.fit(state, scene, log_every=50)
wall = time.time() - t0

# steady-state windows after the 400-iter run settled the autotunes: re-enter
# fit() for short windows (compiles cached; float() forces completion —
# block_until_ready on donated outputs returns early, see CLAUDE.md)
import dataclasses

n_win, n_steps = 3, 40
trainer.cfg = dataclasses.replace(train_cfg, iters=n_steps, warmup_steps=0)
times = []
for w in range(n_win):
    t0 = time.time()
    state = trainer.fit(state, scene, log_every=0)
    _ = float(np.asarray(state.params["encoder"]["base"][0, 0, 0]))
    times.append((time.time() - t0) / n_steps * 1000)

out = {
    "regime": "2048^2 x 48ch, hidden 128, bf16, 32k rays (reference `large`)",
    "train_400_wall_s": round(wall, 1),
    "steady_ms_per_step": round(float(np.median(times)), 1),
    "rays_per_sec": round(32768 / (float(np.median(times)) / 1000), 1),
    "oom": False,
}
print(json.dumps(out), flush=True)
