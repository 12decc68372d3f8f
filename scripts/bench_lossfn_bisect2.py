"""Round 2 of the loss-graph bisection, constant-folding-proof: every input
(rays, occupancy grids, bbox, rng) is a jit ARGUMENT so XLA cannot fold the
march/stats at compile time (which is what made the earlier probes read
228 ms — the march was computed at compile time).

Variants (all grads wrt params):
  v1  image-only loss (stats DCE'd)
  v2  + samples_p99/overflow stats kept alive
  v3  + in-graph ray sampling (rng-driven)
  v4  march only (no field/composite)
Run: python -m scripts.bench_lossfn_bisect2
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


def render_loss(p, ro, rd, gt, occ_b, occ_c, bbox, k, keep_stats):
    planes = field.build_planes(p)
    out = R.render_occgrid(
        lambda x, dd: field(p, planes, x, dd), ro, rd, occ_b,
        trainer.render_cfg, rng=k, perturb=True,
        bg_color=jnp.zeros((ro.shape[0], 3)), occ_coarse=occ_c, occ_bbox=bbox,
    )
    loss = jnp.mean((out["image"].astype(jnp.float32) - gt) ** 2)
    if keep_stats:
        loss = loss + 0.0 * (out["samples_p99"] + out["overflow_frac"])
    return loss


v1 = jax.jit(jax.grad(lambda p, *a: render_loss(p, *a, keep_stats=False)))
print(f"v1 image-only loss     : {timeit(v1, state.params, ro_f, rd_f, gt_f, occ.occ, occ.occ_coarse, occ.bbox, state.rng):8.1f} ms",
      flush=True)

v2 = jax.jit(jax.grad(lambda p, *a: render_loss(p, *a, keep_stats=True)))
print(f"v2 + stats kept        : {timeit(v2, state.params, ro_f, rd_f, gt_f, occ.occ, occ.occ_coarse, occ.bbox, state.rng):8.1f} ms",
      flush=True)


def loss_sampled(p, images, poses, occ_b, occ_c, bbox, rng):
    k_batch, k_perturb = jax.random.split(rng)
    ro, rd, pix = sample_ray_batch(k_batch, images, data["poses"],
                                   data["intrinsics"], N_RAYS)
    gt = pix[..., :3] * pix[..., 3:]
    return render_loss(p, ro, rd, gt, occ_b, occ_c, bbox, k_perturb,
                       keep_stats=True)


v3 = jax.jit(jax.grad(loss_sampled))
print(f"v3 + in-graph sampling : {timeit(v3, state.params, data['images'], data['poses'], occ.occ, occ.occ_coarse, occ.bbox, state.rng):8.1f} ms",
      flush=True)


def march_only(ro, rd, occ_b, occ_c, bbox, k):
    import math

    cfg = trainer.render_cfg
    aabb = bbox
    nears, fars = __import__("trinerflet_tpu.ops.raymarch", fromlist=["x"]).near_far_from_aabb(
        ro, rd, aabb, cfg.min_near)
    hit = nears < 1e30
    nears = jnp.where(hit, nears, 0.0)
    fars = jnp.where(hit, fars, 0.0)
    from trinerflet_tpu.ops import raymarch as RM

    F = cfg.fine_per_coarse
    nc = int(math.ceil(cfg.bound * cfg.max_steps / F))
    noise = jax.random.uniform(k, (ro.shape[0],))
    t, dt, mask, stride, _ = RM.march_hierarchical(
        ro, rd, nears, fars, occ_b, occ_c, noise,
        num_coarse=nc, fine_per_coarse=F, coarse_budget=cfg.coarse_budget,
        budget=cfg.samples_per_ray_budget, max_steps=cfg.max_steps,
        grid_size=cfg.grid_size, cascades=cfg.cascades, bound=cfg.bound,
        dt_gamma=0.0)
    return (t * mask).sum() + stride.sum()


v4 = jax.jit(march_only)
print(f"v4 march only          : {timeit(v4, ro_f, rd_f, occ.occ, occ.occ_coarse, occ.bbox, state.rng):8.1f} ms",
      flush=True)
