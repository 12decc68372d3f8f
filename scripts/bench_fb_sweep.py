"""Combined march-F x budget-B sweep at the driver-bench config.

Round-4 accounting: march 56 ms (coarse test dominates, scales with
NC = bound*max_steps/F) and field fwd+bwd ~116 ms (scales with the N*B slot
count; live mean samples/ray ~8 vs B=20). This sweeps the two static shape
knobs together and reports step time + demand stats. Quality is gated
separately (scripts/quality_fb_ab.py) before any default changes.

Run: cd /root/repo && nohup python -u -m scripts.bench_fb_sweep > /tmp/bfb.log 2>&1 &
"""
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
scene = make_synthetic_scene(num_views=8, H=256, W=256, num_steps=128)


def force(x):
    return float(jnp.asarray(jax.tree.leaves(x)[0]).astype(jnp.float32).reshape(-1)[0])


def run(F, Bc, B, steps=50):
    render_cfg = R.RenderConfig(
        bound=1.5, grid_size=128, density_thresh=10.0, max_steps=1024,
        samples_per_ray_budget=B, dt_gamma=0.0,
        fine_per_coarse=F, coarse_budget=Bc,
    )
    train_cfg = TrainConfig(
        lr=1e-2, iters=10000, num_rays=N_RAYS, wavelet_regularization=0.4,
        renderer="occgrid", update_extra_interval=16, budget_autotune=False,
    )
    trainer = Trainer(nerf_cfg, render_cfg, train_cfg)
    grid = R.mark_untrained_grid(scene.poses, scene.intrinsics, render_cfg)
    state = trainer.init_state(density_grid=grid)
    data = trainer.scene_to_device(scene)
    aux = None
    for i in range(320):
        if i % 16 == 0:
            state = trainer._update_grid(state, full=int(state.occ.iter_density) < 16)
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
    print(f"F={F:2d} Bc={Bc} B={B:2d}: {ms:7.2f} ms ({N_RAYS/ms*1e3:,.0f} rays/s) "
          f"windows {[round(w,1) for w in windows]} "
          f"mean {float(aux['num_samples'])/N_RAYS:.2f} "
          f"overflow {float(aux.get('overflow_frac', -1)):.3f} "
          f"loss {warm_loss:.5f}->{force(aux['loss']):.5f}", flush=True)


import os

combos = os.environ.get("FB_COMBOS", "24,4,20;24,4,16;24,4,12;12,8,12")
for c in combos.split(";"):
    F, Bc, B = (int(x) for x in c.split(","))
    run(F, Bc, B)
