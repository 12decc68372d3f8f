"""Round-4 FULL accounting of the 192 ms driver-bench step.

The known pieces (march 56.5, sample fwd 28.5, blocked-scatter bwd ~38,
MLPs ~30, IDWT bf16 ~7, composite 4.5, adam 6.2, sampler 3) sum to ~145 ms
— ~47 ms of the driver-measured 192 ms is unaccounted. This times nested
prefixes of the real train step (same Trainer, same warmup as bench.py) so
every millisecond lands in exactly one bucket:

  A. full _train_step                      (the driver number)
  B. value_and_grad(_loss_fn)              (A - B = adam + EMA + state pack)
  C. _loss_fn forward only                 (B - C = the whole backward)
  D. render-only forward (no losses/reg)   (C - D = losses + wavelet reg fwd)
  E. march-only (near_far + hierarchical + demand stats)
  F. build_planes (IDWT ladder) fwd / fwd+vjp
  G. wavelet_l1 fwd+vjp
  H. optimizer update alone (adam + EMA on a grads-shaped tree)
  I. ray sampling alone
  J. _update_grid (amortized /16 in the driver loop)

Run (TPU): cd /root/repo && nohup python -u -m scripts.bench_step_account_r4 > /tmp/baccount.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from trinerflet_tpu.data.rays import sample_ray_batch
from trinerflet_tpu.data.synthetic import make_synthetic_scene
from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.models.triplane import wavelet_l1
from trinerflet_tpu.render import renderer as R
from trinerflet_tpu.train.trainer import Trainer, TrainConfig

N_RAYS = 32768

nerf_cfg = NeRFConfig(
    triplane=TriplaneConfig(channels=16, resolution=1024, wavelet_scale=16),
    bound=1.5, compute_dtype="bfloat16", plane_dtype="bfloat16",
)
import os

_F, _Bc, _B = (int(x) for x in os.environ.get("ACC_FB", "12,8,20").split(","))
render_cfg = RC = R.RenderConfig(
    bound=1.5, grid_size=128, density_thresh=10.0, max_steps=1024,
    samples_per_ray_budget=_B, dt_gamma=0.0,
    fine_per_coarse=_F, coarse_budget=_Bc,
)
train_cfg = TrainConfig(
    lr=1e-2, iters=10000, num_rays=N_RAYS, wavelet_regularization=0.4,
    renderer="occgrid", update_extra_interval=16,
)


def force(x):
    return float(jnp.asarray(jax.tree.leaves(x)[0]).astype(jnp.float32).reshape(-1)[0])


def timeit(label, fn, *args, reps=10):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:44s}: {ms:8.2f} ms", flush=True)
    return ms


def main():
    scene = make_synthetic_scene(num_views=8, H=256, W=256, num_steps=128)
    trainer = Trainer(nerf_cfg, render_cfg, train_cfg)
    grid = R.mark_untrained_grid(scene.poses, scene.intrinsics, render_cfg)
    state = trainer.init_state(density_grid=grid)
    data = trainer.scene_to_device(scene)

    print("warming 320 steps (bench.py protocol)...", flush=True)
    aux = None
    for i in range(320):
        if i % 16 == 0:
            state = trainer._update_grid(state, full=int(state.occ.iter_density) < 16)
            trainer._maybe_retune_march(state, aux)
        state, aux = trainer._train_step(state, data)
    force(aux["loss"])
    cfg = trainer.render_cfg
    print(f"live cfg: budget {cfg.samples_per_ray_budget}, layout "
          f"{cfg.compaction}(x{cfg.global_slots_per_ray}), "
          f"NC {cfg.num_coarse_override}, stride "
          f"{cfg.resolved_occ_test_stride()}, mean samples/ray "
          f"{float(aux['num_samples'])/N_RAYS:.1f}", flush=True)

    params, occ, rng = state.params, state.occ, state.rng
    key = jax.random.PRNGKey(7)

    # A. full step (non-donated copy so we can repeat on the same state)
    step_nodonate = jax.jit(trainer._train_step_impl)
    timeit("A full _train_step", lambda: step_nodonate(state, data))

    # B. value_and_grad(loss)
    vg = jax.jit(lambda p, o, k: jax.value_and_grad(
        trainer._loss_fn, has_aux=True)(p, o, k, data, state.error_map))
    timeit("B value_and_grad(_loss_fn)", lambda: vg(params, occ, key))

    # C. loss forward
    lf = jax.jit(lambda p, o, k: trainer._loss_fn(p, o, k, data, state.error_map))
    timeit("C _loss_fn forward", lambda: lf(params, occ, key))

    # D. render-only forward (sample + planes + render, no losses)
    def render_only(p, o, k):
        k_batch, k_bg, k_perturb = jax.random.split(k, 3)
        ro, rd, pix = sample_ray_batch(
            k_batch, data["images"], data["poses"], data["intrinsics"], N_RAYS)
        planes = trainer.field.build_planes(p)
        out = R.render_occgrid(
            lambda x, d: trainer.field(p, planes, x, d), ro, rd, o.occ,
            trainer.render_cfg, rng=k_perturb,
            bg_color=jnp.zeros((N_RAYS, 3)), perturb=True,
            occ_coarse=o.occ_coarse, occ_bbox=o.bbox)
        return out["image"]

    timeit("D render-only forward", jax.jit(render_only), params, occ, key)

    # E. march only
    def march_only(o, k):
        k_batch, _, k_perturb = jax.random.split(k, 3)
        ro, rd, pix = sample_ray_batch(
            k_batch, data["images"], data["poses"], data["intrinsics"], N_RAYS)
        import math
        from trinerflet_tpu.ops import raymarch as RM
        nears, fars = RM.near_far_from_aabb(
            ro, rd, o.bbox, trainer.render_cfg.min_near)
        hit = nears < 1e30
        nears_c = jnp.where(hit, nears, 0.0)
        fars_c = jnp.where(hit, fars, 0.0)
        noise = jax.random.uniform(k_perturb, (N_RAYS,))
        c = trainer.render_cfg
        F = c.fine_per_coarse
        nc = c.num_coarse_override or int(math.ceil(c.bound * c.max_steps / F))
        t, dt, mask, stride, _ = RM.march_hierarchical(
            ro, rd, nears_c, fars_c, o.occ, o.occ_coarse, noise,
            num_coarse=nc, fine_per_coarse=F, coarse_budget=c.coarse_budget,
            budget=c.samples_per_ray_budget, max_steps=c.max_steps,
            grid_size=c.grid_size, cascades=c.cascades, bound=c.bound,
            dt_gamma=0.0, occ_test_stride=c.resolved_occ_test_stride())
        demand = mask.sum(-1).astype(jnp.float32) * stride
        return t.sum() + demand.sum() + jnp.quantile(demand, 0.99)

    timeit("E march+nearfar+stats", jax.jit(march_only), occ, key)

    # F. IDWT ladder
    bp = jax.jit(trainer.field.build_planes)
    timeit("F build_planes fwd", bp, params)
    bp_g = jax.jit(jax.grad(lambda p: sum(
        jnp.sum(v.astype(jnp.float32) ** 2) for v in trainer.field.build_planes(p).values())))
    timeit("F build_planes fwd+bwd", bp_g, params)

    # G. wavelet reg
    wl_g = jax.jit(jax.value_and_grad(
        lambda p: wavelet_l1(p["encoder"], nerf_cfg.triplane,
                             train_cfg.weighted_regularization)))
    timeit("G wavelet_l1 fwd+bwd", wl_g, params)

    # H. optimizer alone
    grads = jax.tree.map(jnp.ones_like, params)
    def opt_only(g, os_, p, ema):
        upd, os2 = trainer.optimizer.update(g, os_, p)
        p2 = jax.tree.map(lambda a, b: a + b, p, upd)
        ema2 = jax.tree.map(lambda e, q: e * 0.95 + q * 0.05, ema, p2)
        return p2, os2, ema2
    timeit("H adam+EMA alone", jax.jit(opt_only), grads, state.opt_state,
           params, state.ema_params)

    # I. ray sampling
    samp = jax.jit(lambda k: sample_ray_batch(
        k, data["images"], data["poses"], data["intrinsics"], N_RAYS)[0])
    timeit("I sample_ray_batch", samp, key)

    # J. grid update
    ug = jax.jit(trainer._update_grid_impl, static_argnames=("full",))
    ms = timeit("J _update_grid(full=False)", lambda: ug(state, full=False))
    print(f"J amortized per step (/16): {ms/16:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
