"""Virtual-mesh scaling check (VERDICT r2 item 9).

Times the full sharded train step at data = 1/2/4/8 on a CPU mesh with a
FIXED per-device ray count (weak scaling). All virtual devices share one
physical core here, so ideal weak scaling is wall time growing ~linearly
with device count; the interesting signal is the *overhead ratio*:

    overhead(d) = wall(d) / (d * wall(1))

If the collective pattern (psum of grads, channel-sharded planes) added
superlinear cost — e.g. all_gathers materializing replicated planes per
device — overhead would blow up with d. A flat overhead curve validates the
sharding design before real multi-chip hardware exists.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python -m scripts.bench_multichip_scaling
"""
import json
import os
import time

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")  # env var alone stalls on the axon tunnel

import jax.numpy as jnp
import numpy as np


def run_config(n_dev: int, rays_per_device: int = 1024, steps: int = 8):
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
        bound=1.0,
    )
    render_cfg = RenderConfig(bound=1.0, grid_size=32, density_thresh=1.0,
                              max_steps=128, samples_per_ray_budget=12)
    train_cfg = TrainConfig(lr=1e-2, iters=1000,
                            num_rays=rays_per_device * n_dev,
                            wavelet_regularization=0.1, renderer="occgrid")
    trainer = Trainer(nerf_cfg, render_cfg, train_cfg, mesh=mesh)
    scene = make_synthetic_scene(num_views=3, H=48, W=48, num_steps=32)
    grid = mark_untrained_grid(scene.poses, scene.intrinsics, render_cfg)
    state = trainer.init_state(density_grid=grid)
    if mesh is not None:
        state = jax.device_put(state, state_shardings(mesh, state))
    data = trainer.scene_to_device(scene)

    state = trainer._update_grid(state, full=True)
    state, aux = trainer._train_step(state, data)  # compile
    _ = float(aux["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, aux = trainer._train_step(state, data)
    _ = float(aux["loss"])
    return (time.perf_counter() - t0) / steps


def main():
    n = len(jax.devices())
    assert n >= 8, f"need 8 virtual devices, got {n} (set XLA_FLAGS before jax import)"
    rows = []
    t1 = None
    for d in (1, 2, 4, 8):
        w = run_config(d)
        if t1 is None:
            t1 = w
        overhead = w / (d * t1)
        rows.append({"devices": d, "ms_per_step": round(w * 1e3, 2),
                     "weak_scaling_overhead": round(overhead, 3)})
        print(f"data={d}: {w * 1e3:8.2f} ms/step  overhead vs linear {overhead:.3f}",
              flush=True)
    print(json.dumps({"multichip_cpu_weak_scaling": rows}))


if __name__ == "__main__":
    main()
