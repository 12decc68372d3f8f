"""Benchmark the dt_gamma > 0 (LLFF/colmap, growing-step) march at real
capture scale (VERDICT r3 item 9).

Before round 4 the dt_gamma fallback enumerated ceil(bound*max_steps)
candidates with a sequential lax.scan ladder (8192 dependent steps at
bound 8). Round 4 replaced it with the closed-form dt_ladder and a
worst-case candidate count (~620 at bound 8). This measures, on the TPU:

  * flat march fwd at bound 4 and 8 with the OLD candidate count
    (scan ladder is gone; candidates_override reproduces the old length)
  * flat march fwd with the NEW closed-form count
  * a full train step at the LLFF-like config (bound 4, dt_gamma 1/128)

Run: cd /root/repo && nohup python -u -m scripts.bench_dtgamma_march > /tmp/bdtg.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from trinerflet_tpu.data.synthetic import make_synthetic_scene
from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.ops import raymarch as RM
from trinerflet_tpu.render import renderer as R
from trinerflet_tpu.train.trainer import Trainer, TrainConfig

N = 32768


def force(x):
    return float(jnp.asarray(jax.tree.leaves(x)[0]).astype(jnp.float32).reshape(-1)[0])


def timeit(label, fn, *args, reps=5):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:58s}: {ms:9.2f} ms", flush=True)
    return ms


def march_at(bound, n_cand, dt_gamma, grid=128, max_steps=1024):
    cascades = 1 + max(0, int(np.ceil(np.log2(bound))))
    rng = np.random.default_rng(0)
    o = rng.uniform(-bound, bound, (N, 3)).astype(np.float32) * 0.1
    o[:, 2] = -2.5 * bound
    d = rng.normal(size=(N, 3)).astype(np.float32) * 0.15
    d[:, 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    aabb = jnp.asarray([-bound] * 3 + [bound] * 3, jnp.float32)
    near, far = RM.near_far_from_aabb(o, d, aabb)
    occ = jnp.asarray(
        rng.random((cascades, grid, grid, grid)) < 0.08)

    @jax.jit
    def go():
        res = RM.march_candidates(
            o, d, jnp.where(near < 1e30, near, 0.0),
            jnp.where(near < 1e30, far, 0.0), occ, jnp.zeros(N),
            num_steps=n_cand, max_steps=max_steps, grid_size=grid,
            cascades=cascades, bound=bound, dt_gamma=dt_gamma)
        return res.valid.sum(), res.ts.sum()

    return go


def main():
    for bound in (4.0, 8.0):
        cfg = R.RenderConfig(bound=bound, grid_size=128, max_steps=1024,
                             dt_gamma=1.0 / 128, march="flat")
        old_n = int(np.ceil(bound * 1024))
        new_n = cfg.num_candidates
        print(f"bound {bound}: old candidates {old_n}, closed-form {new_n}",
              flush=True)
        timeit(f"flat march fwd bound={bound} n_cand={old_n} (old)",
               march_at(bound, old_n, 1.0 / 128))
        timeit(f"flat march fwd bound={bound} n_cand={new_n} (new)",
               march_at(bound, new_n, 1.0 / 128))

    # full train step, LLFF-capture-like config
    bound = 4.0
    nerf_cfg = NeRFConfig(
        triplane=TriplaneConfig(channels=16, resolution=1024, wavelet_scale=16),
        bound=bound, compute_dtype="bfloat16", plane_dtype="bfloat16")
    render_cfg = R.RenderConfig(
        bound=bound, grid_size=128, density_thresh=10.0, max_steps=1024,
        samples_per_ray_budget=20, dt_gamma=1.0 / 128, march="flat")
    train_cfg = TrainConfig(lr=1e-2, iters=2000, num_rays=N,
                            wavelet_regularization=0.4, renderer="occgrid",
                            update_extra_interval=16)
    scene = make_synthetic_scene(num_views=8, H=256, W=256, num_steps=128,
                                 radius=2.0 * bound)
    trainer = Trainer(nerf_cfg, render_cfg, train_cfg)
    grid = R.mark_untrained_grid(scene.poses, scene.intrinsics, render_cfg)
    state = trainer.init_state(density_grid=grid)
    data = trainer.scene_to_device(scene)
    aux = None
    print("warming 96 steps...", flush=True)
    for i in range(96):
        if i % 16 == 0:
            state = trainer._update_grid(state, full=int(state.occ.iter_density) < 16)
        state, aux = trainer._train_step(state, data)
    force(aux["loss"])
    t0 = time.perf_counter()
    steps = 20
    for _ in range(steps):
        state, aux = trainer._train_step(state, data)
    force(aux["loss"])
    ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"full train step, bound 4 dt_gamma 1/128 flat march: {ms:.1f} ms "
          f"({N / ms * 1e3:,.0f} rays/s)", flush=True)


if __name__ == "__main__":
    main()
