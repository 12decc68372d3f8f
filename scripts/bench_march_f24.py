"""March segment-length experiment: F=fine_per_coarse 12 -> 16/24.

r4 accounting: the march costs 56 ms of the 192 ms step, dominated by the
coarse midpoint test (32k rays x NC=128 segments = 4.2M gathers, 37 ms).
Longer segments cut NC proportionally (span coverage NC*F*dt is fixed), at
the price of a larger coarse dilation radius (radius ceil(F*dt/cell/2),
capped 3 — F=24 hits the cap exactly, F=32 would exceed it). This measures
march-only and full-step times plus demand stats for:

  F=12 Bc=8 (live), F=16 Bc=6, F=24 Bc=4   (Bc*F = 96 candidates fixed)

and prints mean/p99 demand + loss trajectories so a demand inflation from
the wider dilation shows up immediately.

Run: cd /root/repo && nohup python -u -m scripts.bench_march_f24 > /tmp/bf24.log 2>&1 &
"""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from trinerflet_tpu.data.synthetic import make_synthetic_scene
from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.render import renderer as R
from trinerflet_tpu.train.trainer import Trainer, TrainConfig

N_RAYS = 32768

nerf_cfg = NeRFConfig(
    triplane=TriplaneConfig(channels=16, resolution=1024, wavelet_scale=16),
    bound=1.5, compute_dtype="bfloat16", plane_dtype="bfloat16",
)
train_cfg = TrainConfig(
    lr=1e-2, iters=10000, num_rays=N_RAYS, wavelet_regularization=0.4,
    renderer="occgrid", update_extra_interval=16,
)
scene = make_synthetic_scene(num_views=8, H=256, W=256, num_steps=128)


def force(x):
    return float(jnp.asarray(jax.tree.leaves(x)[0]).astype(jnp.float32).reshape(-1)[0])


def run(F, Bc, steps=50):
    render_cfg = R.RenderConfig(
        bound=1.5, grid_size=128, density_thresh=10.0, max_steps=1024,
        samples_per_ray_budget=20, dt_gamma=0.0,
        fine_per_coarse=F, coarse_budget=Bc,
    )
    trainer = Trainer(nerf_cfg, render_cfg, train_cfg)
    grid = R.mark_untrained_grid(scene.poses, scene.intrinsics, render_cfg)
    state = trainer.init_state(density_grid=grid)
    data = trainer.scene_to_device(scene)
    aux = None
    for i in range(320):
        if i % 16 == 0:
            state = trainer._update_grid(state, full=int(state.occ.iter_density) < 16)
            trainer._maybe_retune_march(state, aux)
        state, aux = trainer._train_step(state, data)
    warm_loss = force(aux["loss"])
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(steps):
            if i % 16 == 0:
                state = trainer._update_grid(state, full=False)
            state, aux = trainer._train_step(state, data)
        force(aux["loss"])
        windows.append((time.perf_counter() - t0) / steps * 1e3)
    ms = float(np.median(windows))
    c = trainer.render_cfg
    import math
    nc = c.num_coarse_override or int(math.ceil(c.bound * c.max_steps / F))
    print(f"F={F:2d} Bc={Bc}: {ms:7.2f} ms/step ({N_RAYS/ms*1e3:,.0f} rays/s) "
          f"windows {[round(w,1) for w in windows]} NC={nc} "
          f"radius={c.coarse_dilation_radius} stride={c.resolved_occ_test_stride()} "
          f"mean s/ray {float(aux['num_samples'])/N_RAYS:.2f} "
          f"p99 {float(aux.get('samples_p99', -1)):.1f} "
          f"overflow {float(aux.get('overflow_frac', -1)):.3f} "
          f"loss {warm_loss:.5f}->{force(aux['loss']):.5f}", flush=True)


for F, Bc in ((12, 8), (16, 6), (24, 4)):
    run(F, Bc)
