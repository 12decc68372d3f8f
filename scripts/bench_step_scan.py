"""Is the ~90 ms/step gap between the isolated render fwd+bwd (231 ms) and
the live train step (323 ms) real compute or per-dispatch overhead through
the remote-TPU relay?

Times (a) the normal one-dispatch-per-step loop, (b) K steps chained inside
ONE jitted lax.scan dispatch, (c) grad-of-loss only (no optimizer/EMA), on
identical state/data. Run: python -m scripts.bench_step_scan
"""

import time

import jax
import jax.numpy as jnp

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

# (a) one dispatch per step
t0 = time.perf_counter()
for _ in range(16):
    state, aux = trainer._train_step(state, data)
float(aux["loss"])
print(f"per-dispatch step    : {(time.perf_counter()-t0)/16*1e3:8.1f} ms", flush=True)

# (b) 16 steps inside one scan dispatch
K = 16


def chunk(state, data):
    def body(s, _):
        s, aux = trainer._train_step_impl(s, data)
        return s, aux["loss"]

    return jax.lax.scan(body, state, None, length=K)


jchunk = jax.jit(chunk, donate_argnums=(0,))
state, losses = jchunk(state, data)
float(losses[-1])
t0 = time.perf_counter()
for _ in range(3):
    state, losses = jchunk(state, data)
float(losses[-1])
print(f"scan-16 step         : {(time.perf_counter()-t0)/(3*K)*1e3:8.1f} ms", flush=True)

# (c) grad of the loss only (no Adam/EMA/state rebuild)
gfn = jax.jit(lambda p, o, r, d, e: jax.grad(
    trainer._loss_fn, has_aux=True)(p, o, r, d, e)[0])
g = gfn(state.params, state.occ, state.rng, data, state.error_map)
jax.tree.leaves(g)[0].block_until_ready()
float(jnp.sum(jax.tree.leaves(g)[0].astype(jnp.float32).reshape(-1)[:1]))
t0 = time.perf_counter()
for _ in range(10):
    g = gfn(state.params, state.occ, state.rng, data, state.error_map)
float(jnp.sum(jax.tree.leaves(g)[0].astype(jnp.float32).reshape(-1)[:1]))
print(f"loss grad only       : {(time.perf_counter()-t0)/10*1e3:8.1f} ms", flush=True)
