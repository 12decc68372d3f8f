"""Round-3 follow-up probes, one TPU process (amortizes tunnel startup):

1. blocked_scatter_add reorder A/B at bench scale: "gather" (argsort + one
   serialized row-take into sorted order, ~14 ms of the 36 ms stage budget)
   vs "sortops" (payload columns ride lax.sort as extra operands — PERF.md
   measured multi-operand sort payloads as ~free). Decides the shipped
   default in ops/scatter.scatter_add_rows.
2. Train-step extras ablation (EMA / wavelet reg off) to attribute the
   residual step time beyond march+field+sampler.

Run (TPU): cd /root/repo && nohup python -u -m scripts.bench_r3_followup > /tmp/bfollow.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from trinerflet_tpu.ops.scatter import blocked_scatter_add


def force(x):
    leaves = jax.tree.leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32).reshape(-1)[:1]))


def timeit(name, fn, *args, reps=8):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:52s}: {ms:8.2f} ms", flush=True)
    return ms


rng = np.random.default_rng(0)
RES, C = 1024, 16
for N in (425_984, 655_360):
    idx = jnp.asarray(rng.integers(0, RES * RES, N), jnp.int32)
    payload = jnp.asarray(rng.standard_normal((N, 4 * C)), jnp.float32)
    for prec in ("default", "highest"):
        for reorder in ("gather", "sortops"):
            timeit(
                f"scatter {N//1000}k x64 prec={prec:7s} reorder={reorder}",
                jax.jit(lambda i, p, pr=prec, ro=reorder: blocked_scatter_add(
                    i, p, RES * RES, precision=pr, reorder=ro)),
                idx, payload)

# --- step extras ablation -------------------------------------------------
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
scene = make_synthetic_scene(num_views=8, H=256, W=256, num_steps=128)


def timed_step(train_cfg, label, steps=10):
    trainer = Trainer(nerf_cfg, render_cfg, train_cfg)
    grid = mark_untrained_grid(scene.poses, scene.intrinsics, render_cfg)
    state = trainer.init_state(density_grid=grid)
    data = trainer.scene_to_device(scene)
    aux = None
    for i in range(290):
        if i % 16 == 0:
            state = trainer._update_grid(state, full=int(state.occ.iter_density) < 16)
            trainer._maybe_retune_march(state, aux)
        state, aux = trainer._train_step(state, data)
    float(aux["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, aux = trainer._train_step(state, data)
    float(aux["loss"])
    ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"{label:52s}: {ms:8.1f} ms  (budget {trainer.render_cfg.samples_per_ray_budget})",
          flush=True)
    return ms


base = dict(lr=1e-2, iters=10000, num_rays=N_RAYS, wavelet_regularization=0.4,
            renderer="occgrid", update_extra_interval=16)
timed_step(TrainConfig(**base), "full step (bench config)")
timed_step(TrainConfig(**{**base, "ema_decay": 0.0}), "no EMA")
timed_step(TrainConfig(**{**base, "wavelet_regularization": 0.0}), "no wavelet reg")
timed_step(TrainConfig(**{**base, "ema_decay": 0.0, "wavelet_regularization": 0.0}),
           "no EMA + no reg")
