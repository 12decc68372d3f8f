"""A/B: occ_test_stride (1 vs auto) on the bench config, end-to-end.

Measures step time AND the live samples/ray demand (nearest-probe testing
must not inflate demand; the gather saving must show in the step wall).

Run: nohup python -u -m scripts.bench_stride_ab > /tmp/bstride.log 2>&1 &
"""
import dataclasses
import time

import jax

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
base_render = RenderConfig(
    bound=1.5, grid_size=128, density_thresh=10.0, max_steps=1024,
    samples_per_ray_budget=20, dt_gamma=0.0,
)
train_cfg = TrainConfig(lr=1e-2, iters=10000, num_rays=N_RAYS,
                        wavelet_regularization=0.4, renderer="occgrid",
                        update_extra_interval=16)
scene = make_synthetic_scene(num_views=8, H=256, W=256, num_steps=128)

for stride in (1, 0):  # 0 = auto
    rc = dataclasses.replace(base_render, occ_test_stride=stride)
    print(f"--- occ_test_stride={stride} (resolved "
          f"{rc.resolved_occ_test_stride()})", flush=True)
    trainer = Trainer(nerf_cfg, rc, train_cfg)
    grid = mark_untrained_grid(scene.poses, scene.intrinsics, rc)
    state = trainer.init_state(density_grid=grid)
    data = trainer.scene_to_device(scene)
    aux = None
    for i in range(320):
        if i % train_cfg.update_extra_interval == 0:
            state = trainer._update_grid(
                state, full=int(state.occ.iter_density) < 16)
            trainer._maybe_retune_march(state, aux)
        state, aux = trainer._train_step(state, data)
    warm_loss = float(aux["loss"])
    t0 = time.perf_counter()
    steps = 50
    for i in range(steps):
        if i % train_cfg.update_extra_interval == 0:
            state = trainer._update_grid(state, full=False)
        state, aux = trainer._train_step(state, data)
    loss = float(aux["loss"])
    ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"stride={stride}: {ms:7.1f} ms/step  "
          f"samples/ray {float(aux['num_samples']) / N_RAYS:5.1f}  "
          f"budget {trainer.render_cfg.samples_per_ray_budget} "
          f"loss {warm_loss:.5f}->{loss:.5f}", flush=True)
