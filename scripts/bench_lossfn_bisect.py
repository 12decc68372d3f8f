"""Bisect trainer._loss_fn: full (317.9 ms measured) vs render-only probe
(228 ms) on the same live state. Variants: (a) full _loss_fn grad, (b) same
but rays/gt precomputed outside the graph, (c) b with plain MSE only.
Run: python -m scripts.bench_lossfn_bisect
"""

import time

import jax
import jax.numpy as jnp

from trinerflet_tpu.data.rays import sample_ray_batch
from trinerflet_tpu.data.synthetic import make_synthetic_scene
from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.models.triplane import wavelet_l1
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
ro_f, rd_f, pix_f = sample_ray_batch(
    jax.random.PRNGKey(11), data["images"], data["poses"], data["intrinsics"],
    N_RAYS)
bg_f = jnp.zeros((N_RAYS, 3))
gt_f = pix_f[..., :3] * pix_f[..., 3:] + bg_f * (1 - pix_f[..., 3:])


def timeit(fn, *args, reps=8):
    g = fn(*args)
    float(jnp.sum(jax.tree.leaves(g)[0].astype(jnp.float32).reshape(-1)[:1]))
    t0 = time.perf_counter()
    for _ in range(reps):
        g = fn(*args)
    float(jnp.sum(jax.tree.leaves(g)[0].astype(jnp.float32).reshape(-1)[:1]))
    return (time.perf_counter() - t0) / reps * 1e3


# (a) the real thing
ga = jax.jit(lambda p: jax.grad(trainer._loss_fn, has_aux=True)(
    p, occ, state.rng, data, state.error_map)[0])
print(f"full _loss_fn grad       : {timeit(ga, state.params):8.1f} ms", flush=True)


# (b) _loss_fn body with sampling hoisted out (fixed rays/gt), losses kept
def loss_b(p):
    planes = field.build_planes(p)
    out = R.render_occgrid(
        lambda x, dd: field(p, planes, x, dd), ro_f, rd_f, occ.occ,
        trainer.render_cfg, rng=jax.random.PRNGKey(5), perturb=True,
        bg_color=bg_f, occ_coarse=occ.occ_coarse, occ_bbox=occ.bbox,
    )
    pred = out["image"]
    loss = jnp.mean((pred - gt_f) ** 2)
    loss = loss + 0.4 * wavelet_l1(p["encoder"], nerf_cfg.triplane, False)
    return loss


print(f"fixed rays, full losses  : {timeit(jax.jit(jax.grad(loss_b)), state.params):8.1f} ms",
      flush=True)


# (c) live-rng sampling inside the graph, mse only
def loss_c(p, rng):
    k_batch, k_bg, k_perturb = jax.random.split(rng, 3)
    ro, rd, pix = sample_ray_batch(k_batch, data["images"], data["poses"],
                                   data["intrinsics"], N_RAYS)
    gt = pix[..., :3] * pix[..., 3:]
    planes = field.build_planes(p)
    out = R.render_occgrid(
        lambda x, dd: field(p, planes, x, dd), ro, rd, occ.occ,
        trainer.render_cfg, rng=k_perturb, perturb=True,
        bg_color=jnp.zeros((N_RAYS, 3)), occ_coarse=occ.occ_coarse,
        occ_bbox=occ.bbox,
    )
    return jnp.mean((out["image"] - gt) ** 2)


print(f"in-graph sampling, mse   : {timeit(jax.jit(jax.grad(loss_c)), state.params, state.rng):8.1f} ms",
      flush=True)
