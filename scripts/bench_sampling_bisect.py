"""Bisect the ~117 ms cost of in-graph ray sampling (bench_lossfn_bisect2:
v2 229 ms with rays as jit args vs v3 347 ms with in-graph sampling).

All variants compute grad wrt params; every input is a jit ARGUMENT.
  s0  sampling alone, forward only (expected ~1 ms)
  s1  rays + gt as args                     (v2 baseline)
  s2  rays computed in-graph, gt as arg
  s3  rays as args, gt gathered in-graph
  s4  full in-graph sampling                (v3)
  s5  s4 + optimization_barrier after sampling
If s5 ~= s1, XLA is fusing/rematerializing the sampling gathers into the
march/backward and the fix is a barrier in Trainer._loss_fn.
Run: python -m scripts.bench_sampling_bisect
"""

import time

import jax
import jax.numpy as jnp

from trinerflet_tpu.data.rays import sample_ray_batch
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
ro_f, rd_f, pix_f = sample_ray_batch(
    jax.random.PRNGKey(11), data["images"], data["poses"], data["intrinsics"],
    N_RAYS)
gt_f = pix_f[..., :3] * pix_f[..., 3:]


def timeit(fn, *args, reps=8):
    g = fn(*args)
    float(jnp.sum(jax.tree.leaves(g)[0].astype(jnp.float32).reshape(-1)[:1]))
    t0 = time.perf_counter()
    for _ in range(reps):
        g = fn(*args)
    float(jnp.sum(jax.tree.leaves(g)[0].astype(jnp.float32).reshape(-1)[:1]))
    return (time.perf_counter() - t0) / reps * 1e3


def render_loss(p, ro, rd, gt, occ_b, occ_c, bbox, k):
    planes = field.build_planes(p)
    out = R.render_occgrid(
        lambda x, dd: field(p, planes, x, dd), ro, rd, occ_b,
        trainer.render_cfg, rng=k, perturb=True,
        bg_color=jnp.zeros((ro.shape[0], 3)), occ_coarse=occ_c, occ_bbox=bbox,
    )
    loss = jnp.mean((out["image"].astype(jnp.float32) - gt) ** 2)
    return loss + 0.0 * (out["samples_p99"] + out["overflow_frac"])


s0 = jax.jit(lambda rng, images, poses: sample_ray_batch(
    rng, images, poses, data["intrinsics"], N_RAYS))
r = s0(state.rng, data["images"], data["poses"])
float(r[0][0, 0])
t0 = time.perf_counter()
for _ in range(16):
    r = s0(state.rng, data["images"], data["poses"])
float(r[0][0, 0])
print(f"s0 sampling alone fwd  : {(time.perf_counter() - t0) / 16 * 1e3:8.1f} ms",
      flush=True)

s1 = jax.jit(jax.grad(render_loss))
print(f"s1 rays+gt as args     : {timeit(s1, state.params, ro_f, rd_f, gt_f, occ.occ, occ.occ_coarse, occ.bbox, state.rng):8.1f} ms",
      flush=True)


def loss_rays_ingraph(p, images, poses, gt, occ_b, occ_c, bbox, rng):
    k_batch, k_perturb = jax.random.split(rng)
    ro, rd, _ = sample_ray_batch(k_batch, images, poses, data["intrinsics"],
                                 N_RAYS)
    return render_loss(p, ro, rd, gt, occ_b, occ_c, bbox, k_perturb)


s2 = jax.jit(jax.grad(loss_rays_ingraph))
print(f"s2 rays in-graph       : {timeit(s2, state.params, data['images'], data['poses'], gt_f, occ.occ, occ.occ_coarse, occ.bbox, state.rng):8.1f} ms",
      flush=True)


def loss_gt_ingraph(p, images, poses, ro, rd, occ_b, occ_c, bbox, rng):
    k_batch, k_perturb = jax.random.split(rng)
    _, _, pix = sample_ray_batch(k_batch, images, poses, data["intrinsics"],
                                 N_RAYS)
    gt = pix[..., :3] * pix[..., 3:]
    return render_loss(p, ro, rd, gt, occ_b, occ_c, bbox, k_perturb)


s3 = jax.jit(jax.grad(loss_gt_ingraph))
print(f"s3 gt in-graph         : {timeit(s3, state.params, data['images'], data['poses'], ro_f, rd_f, occ.occ, occ.occ_coarse, occ.bbox, state.rng):8.1f} ms",
      flush=True)


def loss_full_ingraph(p, images, poses, occ_b, occ_c, bbox, rng, barrier):
    k_batch, k_perturb = jax.random.split(rng)
    ro, rd, pix = sample_ray_batch(k_batch, images, poses, data["intrinsics"],
                                   N_RAYS)
    gt = pix[..., :3] * pix[..., 3:]
    if barrier:
        ro, rd, gt = jax.lax.optimization_barrier((ro, rd, gt))
    return render_loss(p, ro, rd, gt, occ_b, occ_c, bbox, k_perturb)


s4 = jax.jit(jax.grad(
    lambda p, *a: loss_full_ingraph(p, *a, barrier=False)))
print(f"s4 full in-graph       : {timeit(s4, state.params, data['images'], data['poses'], occ.occ, occ.occ_coarse, occ.bbox, state.rng):8.1f} ms",
      flush=True)

s5 = jax.jit(jax.grad(
    lambda p, *a: loss_full_ingraph(p, *a, barrier=True)))
print(f"s5 + optimization_barrier: {timeit(s5, state.params, data['images'], data['poses'], occ.occ, occ.occ_coarse, occ.bbox, state.rng):8.1f} ms",
      flush=True)
