"""Cost of the march-statistics outputs (samples_p99 quantile etc.) inside
the live train-step graph. bench_step_scan showed the whole 320 ms is the
loss grad; the isolated render probe (231 ms) uses only out['image'], so XLA
dead-code-eliminates the stats. Times the same live render grad with and
without the stats kept alive. Run: python -m scripts.bench_stats_cost
"""

import time

import jax
import jax.numpy as jnp

from trinerflet_tpu.data.synthetic import make_synthetic_scene
from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.render import renderer as R
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
train_cfg = TrainConfig(lr=1e-2, iters=10000, num_rays=N_RAYS,
                        wavelet_regularization=0.4, renderer="occgrid",
                        update_extra_interval=16, budget_autotune=False)

trainer = Trainer(nerf_cfg, render_cfg, train_cfg)
scene = make_synthetic_scene(num_views=8, H=256, W=256, num_steps=128)
grid = mark_untrained_grid(scene.poses, scene.intrinsics, render_cfg)
state = trainer.init_state(density_grid=grid)
data = trainer.scene_to_device(scene)
aux = None
for i in range(120):
    if i % 16 == 0:
        state = trainer._update_grid(state, full=int(state.occ.iter_density) < 16)
    state, aux = trainer._train_step(state, data)
float(aux["loss"])

field = trainer.field
occ = state.occ
k = jax.random.PRNGKey(3)
ro = jnp.asarray(jax.random.uniform(k, (N_RAYS, 3), minval=-0.5, maxval=0.5))
rd = jax.random.normal(jax.random.PRNGKey(4), (N_RAYS, 3))
rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)


def make_loss(keep_stats):
    def loss(p):
        planes = field.build_planes(p)
        out = R.render_occgrid(
            lambda x, dd: field(p, planes, x, dd), ro, rd, occ.occ,
            trainer.render_cfg, rng=jax.random.PRNGKey(5), perturb=True,
            bg_color=jnp.zeros((N_RAYS, 3)), occ_coarse=occ.occ_coarse,
            occ_bbox=occ.bbox,
        )
        l = jnp.mean(out["image"].astype(jnp.float32) ** 2)
        if keep_stats:
            l = l + 0.0 * (out["samples_p99"] + out["overflow_frac"]
                           + out["num_samples"].astype(jnp.float32))
        return l

    return loss


def timeit(fn, reps=8):
    g = fn(state.params)
    float(jnp.sum(jax.tree.leaves(g)[0].astype(jnp.float32).reshape(-1)[:1]))
    t0 = time.perf_counter()
    for _ in range(reps):
        g = fn(state.params)
    float(jnp.sum(jax.tree.leaves(g)[0].astype(jnp.float32).reshape(-1)[:1]))
    return (time.perf_counter() - t0) / reps * 1e3


print(f"render grad, no stats : {timeit(jax.jit(jax.grad(make_loss(False)))):8.1f} ms",
      flush=True)
print(f"render grad, + stats  : {timeit(jax.jit(jax.grad(make_loss(True)))):8.1f} ms",
      flush=True)
