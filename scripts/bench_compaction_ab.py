"""A/B the render fwd+bwd cost of the per-ray dense budget layout vs the
second-stage global compaction at the bench config (B=20, live mean 2.6).

Run: python -m scripts.bench_compaction_ab
"""

import dataclasses
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
for i in range(320):  # bench-matching warmup: converged grid -> mean ~2.6/ray
    if i % 16 == 0:
        state = trainer._update_grid(state, full=int(state.occ.iter_density) < 16)
    state, aux = trainer._train_step(state, data)
print(f"warm mean samples/ray: {float(aux['num_samples']) / N_RAYS:.2f}",
      flush=True)

# micro: flat int32 sort of the full candidate buffer (the compaction cost)
k = jnp.arange(N_RAYS * 20, dtype=jnp.int32)[::-1]
srt = jax.jit(lambda a: jax.lax.sort(a))
float(srt(k)[0])
t0 = time.perf_counter()
for _ in range(16):
    r = srt(k)
float(r[0])
print(f"flat sort 655k int32  : {(time.perf_counter() - t0) / 16 * 1e3:8.1f} ms",
      flush=True)

field = trainer.field
occ = state.occ
ro, rd, pix = sample_ray_batch(
    jax.random.PRNGKey(11), data["images"], data["poses"], data["intrinsics"],
    N_RAYS)
gt = pix[..., :3] * pix[..., 3:]


def timeit(fn, *args, reps=8):
    g = fn(*args)
    float(jnp.sum(jax.tree.leaves(g)[0].astype(jnp.float32).reshape(-1)[:1]))
    t0 = time.perf_counter()
    for _ in range(reps):
        g = fn(*args)
    float(jnp.sum(jax.tree.leaves(g)[0].astype(jnp.float32).reshape(-1)[:1]))
    return (time.perf_counter() - t0) / reps * 1e3


def make_loss(cfg):
    def loss(p, ro, rd, gt, occ_b, occ_c, bbox, k):
        planes = field.build_planes(p)
        out = R.render_occgrid(
            lambda x, dd: field(p, planes, x, dd), ro, rd, occ_b, cfg,
            rng=k, perturb=True, bg_color=jnp.zeros((ro.shape[0], 3)),
            occ_coarse=occ_c, occ_bbox=bbox,
        )
        l = jnp.mean((out["image"].astype(jnp.float32) - gt) ** 2)
        return l + 0.0 * (out["samples_p99"] + out["overflow_frac"])
    return jax.jit(jax.grad(loss))


args = (state.params, ro, rd, gt, occ.occ, occ.occ_coarse, occ.bbox, state.rng)

dense = make_loss(trainer.render_cfg)
print(f"per_ray dense (B=20)  : {timeit(dense, *args):8.1f} ms", flush=True)

for slots in (4, 8, 12):
    cfg_g = dataclasses.replace(
        trainer.render_cfg, compaction="global", global_slots_per_ray=slots)
    g = make_loss(cfg_g)
    print(f"global slots={slots:<2}       : {timeit(g, *args):8.1f} ms",
          flush=True)
