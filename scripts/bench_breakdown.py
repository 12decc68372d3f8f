"""Fresh per-piece timing of the bench-config train step (round 2).
Run: nohup python -u -m scripts.bench_breakdown > /tmp/bbreak.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from trinerflet_tpu.models.nerf import NeRFConfig, NeRFField, init_nerf_params
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.ops import raymarch as RM
from trinerflet_tpu.render import renderer as R


def force(x):
    leaves = jax.tree.leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32).reshape(-1)[:1]))


def timeit(fn, *args, reps=6):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / reps * 1e3


N_RAYS = 32768
B = 20
nerf_cfg = NeRFConfig(
    triplane=TriplaneConfig(channels=16, resolution=1024, wavelet_scale=16),
    bound=1.5, compute_dtype="bfloat16", plane_dtype="bfloat16",
)
render_cfg = R.RenderConfig(bound=1.5, grid_size=128, max_steps=1024,
                            samples_per_ray_budget=B, dt_gamma=0.0)
field = NeRFField(nerf_cfg)
params = init_nerf_params(jax.random.PRNGKey(0), nerf_cfg)

rng = np.random.default_rng(0)
rays_o = jnp.asarray(rng.uniform(-0.5, 0.5, (N_RAYS, 3)), jnp.float32)
d = rng.standard_normal((N_RAYS, 3))
rays_d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
occ = R.init_occupancy(render_cfg)
k = jax.random.PRNGKey(1)
occb = jax.random.uniform(k, occ.occ.shape) < 0.04  # lego-like occupancy
occ = occ._replace(occ=occb, occ_coarse=R._dilate3(occb))

M = N_RAYS * B
pts = jnp.asarray(rng.uniform(-1, 1, (M, 3)), jnp.float32)
dirs = jnp.asarray(rng.standard_normal((M, 3)), jnp.float32)

# 1. plane build (IDWT) fwd + bwd
build = jax.jit(lambda p: field.build_planes(p))
planes = build(params)
print(f"IDWT build fwd      : {timeit(build, params):8.1f} ms", flush=True)
g_build = jax.jit(jax.grad(lambda p: sum(jnp.sum(v.astype(jnp.float32)) for v in field.build_planes(p).values())))
print(f"IDWT build fwd+bwd  : {timeit(g_build, params):8.1f} ms", flush=True)

# 2. full field (sample + MLP) fwd and fwd+bwd at M points
fwd = jax.jit(lambda p, x, dd: field(p, field.build_planes(p), x, dd)[1].sum())
print(f"field fwd (M={M//1000}k) : {timeit(fwd, params, pts, dirs):8.1f} ms", flush=True)
gfield = jax.jit(jax.grad(lambda p, x, dd: field(p, field.build_planes(p), x, dd)[1].astype(jnp.float32).sum()))
print(f"field fwd+bwd       : {timeit(gfield, params, pts, dirs):8.1f} ms", flush=True)

# 3. hierarchical march alone
def march(ro, rd):
    aabb = jnp.asarray(render_cfg.aabb, jnp.float32)
    nears, fars = RM.near_far_from_aabb(ro, rd, aabb, 0.2)
    hit = nears < 1e30
    nears = jnp.where(hit, nears, 0.0)
    fars = jnp.where(hit, fars, 0.0)
    import math
    F = render_cfg.fine_per_coarse
    nc = int(math.ceil(render_cfg.bound * render_cfg.max_steps / F))
    return RM.march_hierarchical(
        ro, rd, nears, fars, occ.occ, occ.occ_coarse, jnp.zeros((len(ro),)),
        num_coarse=nc, fine_per_coarse=F, coarse_budget=render_cfg.coarse_budget,
        budget=B, max_steps=render_cfg.max_steps, grid_size=128,
        cascades=render_cfg.cascades, bound=render_cfg.bound, dt_gamma=0.0)

jm = jax.jit(march)
print(f"hier march          : {timeit(jm, rays_o, rays_d):8.1f} ms", flush=True)

# 4. full render fwd+bwd
def loss(p, ro, rd):
    planes = field.build_planes(p)
    out = R.render_occgrid(lambda x, dd: field(p, planes, x, dd), ro, rd,
                           occ.occ, render_cfg, bg_color=0.0,
                           occ_coarse=occ.occ_coarse)
    return jnp.mean(out["image"].astype(jnp.float32) ** 2)

gl = jax.jit(jax.grad(loss))
print(f"render fwd+bwd      : {timeit(gl, params, rays_o, rays_d):8.1f} ms", flush=True)

# 5. (round 3) the rest of the step: trainer probes at the bench config
from trinerflet_tpu.data.synthetic import make_synthetic_scene
from trinerflet_tpu.train.trainer import Trainer, TrainConfig

train_cfg = TrainConfig(lr=1e-2, iters=10000, num_rays=N_RAYS,
                        wavelet_regularization=0.4, renderer="occgrid",
                        update_extra_interval=16)
trainer = Trainer(nerf_cfg, render_cfg, train_cfg)
scene = make_synthetic_scene(num_views=8, H=256, W=256, num_steps=128)
grid = R.mark_untrained_grid(scene.poses, scene.intrinsics, render_cfg)
state = trainer.init_state(density_grid=grid)
data = trainer.scene_to_device(scene)
aux = None
# warm enough for iter_density >= 16 (autotune needs >= 6; partial grid
# refreshes start at 16, so the timed update below is the compiled steady
# state, not a fresh full=False compile)
for i in range(290):
    if i % 16 == 0:
        state = trainer._update_grid(state, full=int(state.occ.iter_density) < 16)
        trainer._maybe_retune_march(state, aux)
    state, aux = trainer._train_step(state, data)
force(aux["loss"])
print(f"budget after autotune: {trainer.render_cfg.samples_per_ray_budget}; "
      f"num_coarse: {trainer.render_cfg.num_coarse_override}", flush=True)

t0 = time.perf_counter()
for _ in range(10):
    state, aux = trainer._train_step(state, data)
force(aux["loss"])
print(f"train step alone    : {(time.perf_counter()-t0)/10*1e3:8.1f} ms", flush=True)

t0 = time.perf_counter()
for _ in range(4):
    state = trainer._update_grid(state, full=False)
force(state.occ.mean_density)
print(f"grid update (partial): {(time.perf_counter()-t0)/4*1e3:8.1f} ms", flush=True)
