"""Bisect the train-step overhead beyond the render fwd+bwd.

bench_breakdown measured (bench config, v5e): render fwd+bwd ~231 ms but the
full train step ~321 ms. This times the step with individual extras disabled
(EMA, wavelet reg, z-var/alpha regs) plus a 'render loss only' grad to locate
the missing ~90 ms. Run: python -m scripts.bench_step_parts
"""

import time

import jax
import numpy as np

from trinerflet_tpu.data.synthetic import make_synthetic_scene
from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.render.renderer import RenderConfig, mark_untrained_grid
from trinerflet_tpu.train.trainer import Trainer, TrainConfig

N_RAYS = 32768

nerf_cfg = NeRFConfig(
    triplane=TriplaneConfig(channels=16, resolution=1024, wavelet_scale=16),
    bound=1.5, compute_dtype="bfloat16", plane_dtype="bfloat16",
)
render_cfg = RenderConfig(
    bound=1.5, grid_size=128, density_thresh=10.0, max_steps=1024,
    samples_per_ray_budget=20, dt_gamma=0.0,
)
scene = make_synthetic_scene(num_views=8, H=256, W=256, num_steps=128)


def timed_step(train_cfg, label, steps=10):
    trainer = Trainer(nerf_cfg, render_cfg, train_cfg)
    grid = mark_untrained_grid(scene.poses, scene.intrinsics, render_cfg)
    state = trainer.init_state(density_grid=grid)
    data = trainer.scene_to_device(scene)
    aux = None
    for i in range(290):
        if i % 16 == 0:
            state = trainer._update_grid(state, full=int(state.occ.iter_density) < 16)
            trainer._maybe_retune_march(state, aux)
        state, aux = trainer._train_step(state, data)
    float(aux["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, aux = trainer._train_step(state, data)
    float(aux["loss"])
    ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"{label:34s}: {ms:8.1f} ms  (budget {trainer.render_cfg.samples_per_ray_budget},"
          f" num_coarse {trainer.render_cfg.num_coarse_override})", flush=True)
    return ms


base = dict(lr=1e-2, iters=10000, num_rays=N_RAYS, wavelet_regularization=0.4,
            renderer="occgrid", update_extra_interval=16)

timed_step(TrainConfig(**base), "full step (bench config)")
timed_step(TrainConfig(**{**base, "ema_decay": 0.0}), "no EMA")
timed_step(TrainConfig(**{**base, "wavelet_regularization": 0.0}), "no wavelet reg")
timed_step(TrainConfig(**{**base, "ema_decay": 0.0, "wavelet_regularization": 0.0}),
           "no EMA + no reg")
