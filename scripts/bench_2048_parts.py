"""2048^2/32ch regime decomposition (VERDICT r3 item 2: the real base-recipe
stage-3 config runs 19.3k rays/s vs the bench config's 170k).

At 2048^2 the quad-packed sampler is gated off (its (H, W, 4C) table was
>1 GB/plane in f32) and the corner sampler's backward scatters 4N rows of
C=32 f32 (128 B rows, 4x the sort volume) — 215 ms fwd+bwd at 425k pts in
round 3. This measures, at the stage-3 shapes (2048^2, 32ch, 32k rays):

  * full train step (reference point at the live post-warm state)
  * corner sample fwd / fwd+bwd at live M
  * quad-grad variant: ONE scatter of N rows x 4C=128ch f32 into (H*W, 4C)
    + unpack (sort N keys instead of 4N; grad buffer 2 GB f32 transient)
  * channel-split corner scatter: 2x(4N, 16) 64 B rows
  * march at 2048 resolution config (unchanged grid 128^3 -> same cost?)
  * IDWT ladder fwd/fwd+bwd at 2048^2/32ch bf16

Run: cd /root/repo && nohup python -u -m scripts.bench_2048_parts > /tmp/b2048.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from trinerflet_tpu.data.synthetic import make_synthetic_scene
from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.ops.scatter import blocked_scatter_add
from trinerflet_tpu.render import renderer as R
from trinerflet_tpu.train.trainer import Trainer, TrainConfig

N_RAYS = 32768
RES, CH = 2048, 32

import os

QUADMAX = int(os.environ.get("B2048_QUADMAX", "1024"))
nerf_cfg = NeRFConfig(
    triplane=TriplaneConfig(channels=CH, resolution=RES, wavelet_scale=32,
                            quad_max_resolution=QUADMAX),
    bound=1.5, compute_dtype="bfloat16", plane_dtype="bfloat16",
)
render_cfg = R.RenderConfig(
    bound=1.5, grid_size=128, density_thresh=10.0, max_steps=1024,
    samples_per_ray_budget=20, dt_gamma=0.0,
)
train_cfg = TrainConfig(
    lr=1e-2, iters=10000, num_rays=N_RAYS, wavelet_regularization=0.4,
    renderer="occgrid", update_extra_interval=16,
)


def force(x):
    return float(jnp.asarray(jax.tree.leaves(x)[0]).astype(jnp.float32).reshape(-1)[0])


def timeit(label, fn, *args, reps=8):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:58s}: {ms:9.2f} ms", flush=True)
    return ms


def main():
    scene = make_synthetic_scene(num_views=8, H=256, W=256, num_steps=128)
    trainer = Trainer(nerf_cfg, render_cfg, train_cfg)
    grid = R.mark_untrained_grid(scene.poses, scene.intrinsics, render_cfg)
    state = trainer.init_state(density_grid=grid)
    data = trainer.scene_to_device(scene)
    print(f"warming 96 steps (quad_max_resolution={QUADMAX})...", flush=True)
    aux = None
    for i in range(96):
        if i % 16 == 0:
            state = trainer._update_grid(state, full=int(state.occ.iter_density) < 16)
            trainer._maybe_retune_march(state, aux)
        state, aux = trainer._train_step(state, data)
    force(aux["loss"])
    print(f"mean samples/ray {float(aux['num_samples'])/N_RAYS:.1f}", flush=True)

    # time the trainer's own DONATED step in a chained window (re-jitting
    # without donation doubles the ~8 GB state -> the r4 OOM)
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(10):
            state, aux = trainer._train_step(state, data)
        force(aux["loss"])
        print(f"full train step (2048^2/32ch, chained x10)          : "
              f"{(time.perf_counter() - t0) / 10 * 1e3:9.2f} ms", flush=True)

    # IDWT ladder
    bp = jax.jit(trainer.field.build_planes)
    timeit("build_planes (IDWT) fwd", bp, state.params)
    bpg = jax.jit(jax.grad(lambda p: sum(
        jnp.sum(v.astype(jnp.float32) ** 2)
        for v in jax.tree.leaves(trainer.field.build_planes(p)))))
    timeit("build_planes fwd+bwd", bpg, state.params)


if __name__ == "__main__":
    main()
