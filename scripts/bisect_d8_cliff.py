"""Bisect the d=8 weak-scaling cliff inside the train step.

bench_psum_microbench showed bare sharded compute + psums scale fine to
d=8 on this 1-core host, so the 6.6x cliff lives in a specific piece of the
step. For d in {4, 8} this times: loss fwd only, fwd+bwd (no optimizer),
the full step, the step without wavelet reg, without EMA, and the grid
update. Run: python -m scripts.bisect_d8_cliff
"""
import os
import time

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def probe(n_dev: int, rays_per_device: int = 1024, steps: int = 6, **cfg_kw):
    from trinerflet_tpu.data.synthetic import make_synthetic_scene
    from trinerflet_tpu.models.nerf import NeRFConfig
    from trinerflet_tpu.models.triplane import TriplaneConfig
    from trinerflet_tpu.parallel.sharding import make_mesh, state_shardings
    from trinerflet_tpu.render.renderer import RenderConfig, mark_untrained_grid
    from trinerflet_tpu.train.trainer import Trainer, TrainConfig

    devices = jax.devices()[:n_dev]
    mesh = make_mesh(devices, model_parallel=1) if n_dev > 1 else None
    nerf_cfg = NeRFConfig(
        triplane=TriplaneConfig(channels=8, resolution=128, wavelet_scale=4),
        bound=1.0)
    render_cfg = RenderConfig(bound=1.0, grid_size=32, density_thresh=1.0,
                              max_steps=128, samples_per_ray_budget=12)
    base = dict(lr=1e-2, iters=1000, num_rays=rays_per_device * n_dev,
                wavelet_regularization=0.1, renderer="occgrid")
    base.update(cfg_kw)
    train_cfg = TrainConfig(**base)
    trainer = Trainer(nerf_cfg, render_cfg, train_cfg, mesh=mesh)
    scene = make_synthetic_scene(num_views=3, H=48, W=48, num_steps=32)
    grid = mark_untrained_grid(scene.poses, scene.intrinsics, render_cfg)
    state = trainer.init_state(density_grid=grid)
    if mesh is not None:
        state = jax.device_put(state, state_shardings(mesh, state))
    data = trainer.scene_to_device(scene)
    state = trainer._update_grid(state, full=True)

    def t(fn, force):
        out = fn()
        force(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn()
        force(out)
        return (time.perf_counter() - t0) / steps * 1e3

    res = {}
    key = jax.random.PRNGKey(0)
    lf = jax.jit(lambda: trainer._loss_fn(
        state.params, state.occ, key, data, state.error_map)[0])
    res["fwd only"] = t(lf, lambda o: float(o))
    vg = jax.jit(lambda: jax.value_and_grad(trainer._loss_fn, has_aux=True)(
        state.params, state.occ, key, data, state.error_map))
    res["fwd+bwd"] = t(vg, lambda o: float(o[0][0]))
    step = jax.jit(trainer._train_step_impl)
    res["full step"] = t(lambda: step(state, data), lambda o: float(o[1]["loss"]))
    res["grid update"] = t(
        lambda: jax.jit(trainer._update_grid_impl, static_argnames=("full",))(
            state, full=False),
        lambda o: float(o.occ.mean_density))
    return res


def main():
    rows = {}
    for d in (4, 8):
        rows[d] = probe(d)
        print(f"d={d}: " + "  ".join(f"{k} {v:8.1f} ms" for k, v in rows[d].items()),
              flush=True)
    for d in (4, 8):
        r = probe(d, wavelet_regularization=0.0, ema_decay=0.0)
        print(f"d={d} (no reg, no EMA): " +
              "  ".join(f"{k} {v:8.1f} ms" for k, v in r.items()), flush=True)


if __name__ == "__main__":
    main()
