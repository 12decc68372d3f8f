"""Compare compiled-HLO collective/op counts of the train fwd+bwd at d=4 vs
d=8 to locate the weak-scaling cliff (it is in the backward pass only).
Run: python -m scripts.hlo_d8_diff
"""
import os
import re
from collections import Counter

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def build(n_dev: int):
    from trinerflet_tpu.data.synthetic import make_synthetic_scene
    from trinerflet_tpu.models.nerf import NeRFConfig
    from trinerflet_tpu.models.triplane import TriplaneConfig
    from trinerflet_tpu.parallel.sharding import make_mesh, state_shardings
    from trinerflet_tpu.render.renderer import RenderConfig, mark_untrained_grid
    from trinerflet_tpu.train.trainer import Trainer, TrainConfig

    devices = jax.devices()[:n_dev]
    mesh = make_mesh(devices, model_parallel=1)
    nerf_cfg = NeRFConfig(
        triplane=TriplaneConfig(channels=8, resolution=128, wavelet_scale=4),
        bound=1.0)
    render_cfg = RenderConfig(bound=1.0, grid_size=32, density_thresh=1.0,
                              max_steps=128, samples_per_ray_budget=12)
    train_cfg = TrainConfig(lr=1e-2, iters=1000, num_rays=1024 * n_dev,
                            wavelet_regularization=0.1, renderer="occgrid")
    trainer = Trainer(nerf_cfg, render_cfg, train_cfg, mesh=mesh)
    scene = make_synthetic_scene(num_views=3, H=48, W=48, num_steps=32)
    grid = mark_untrained_grid(scene.poses, scene.intrinsics, render_cfg)
    state = trainer.init_state(density_grid=grid)
    state = jax.device_put(state, state_shardings(mesh, state))
    data = trainer.scene_to_device(scene)
    key = jax.random.PRNGKey(0)
    vg = jax.jit(lambda: jax.value_and_grad(trainer._loss_fn, has_aux=True)(
        state.params, state.occ, key, data, state.error_map))
    return vg.lower().compile().as_text()


def summarize(txt: str) -> Counter:
    ops = Counter()
    for m in re.finditer(r"=\s+\S+\s+(\w[\w.-]*)\(", txt):
        ops[m.group(1)] += 1
    return ops


def main():
    t4 = build(4)
    t8 = build(8)
    c4, c8 = summarize(t4), summarize(t8)
    keys = sorted(set(c4) | set(c8),
                  key=lambda k: -(abs(c8.get(k, 0) - c4.get(k, 0))))
    print(f"{'op':35s} {'d=4':>8} {'d=8':>8}")
    for k in keys[:40]:
        if c4.get(k, 0) != c8.get(k, 0) or "all" in k or "collective" in k \
                or "scatter" in k or "while" in k or "sort" in k:
            print(f"{k:35s} {c4.get(k, 0):>8} {c8.get(k, 0):>8}")
    for name, txt in (("d4", t4), ("d8", t8)):
        with open(f"/tmp/hlo_{name}.txt", "w") as f:
            f.write(txt)
    print("full HLO at /tmp/hlo_d4.txt /tmp/hlo_d8.txt")


if __name__ == "__main__":
    main()
