"""d=8 cliff, round 2: which GRADIENT path explodes?

bisect_d8_cliff showed fwd scales but fwd+bwd blows up 13x at d=8.
This probes value_and_grad variants at d in {4, 8}:
  (a) full grads (reference point)
  (b) stop_gradient on the reconstructed planes  -> no plane-scatter bwd,
      no IDWT bwd (MLP/background grads only)
  (c) grads w.r.t. encoder only (planes path only, MLPs stopped)
Run: python -m scripts.bisect_d8_cliff2
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


def probe(n_dev: int, steps: int = 6):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from trinerflet_tpu.data.rays import sample_ray_batch
    from trinerflet_tpu.data.synthetic import make_synthetic_scene
    from trinerflet_tpu.models.nerf import NeRFConfig
    from trinerflet_tpu.models.triplane import TriplaneConfig
    from trinerflet_tpu.parallel.sharding import DATA_AXIS, make_mesh, state_shardings
    from trinerflet_tpu.render import renderer as R
    from trinerflet_tpu.train.trainer import Trainer, TrainConfig

    n_rays = 1024 * n_dev
    devices = jax.devices()[:n_dev]
    mesh = make_mesh(devices, model_parallel=1)
    nerf_cfg = NeRFConfig(
        triplane=TriplaneConfig(channels=8, resolution=128, wavelet_scale=4),
        bound=1.0)
    render_cfg = R.RenderConfig(bound=1.0, grid_size=32, density_thresh=1.0,
                                max_steps=128, samples_per_ray_budget=12)
    train_cfg = TrainConfig(lr=1e-2, iters=1000, num_rays=n_rays,
                            wavelet_regularization=0.0, renderer="occgrid")
    trainer = Trainer(nerf_cfg, render_cfg, train_cfg, mesh=mesh)
    scene = make_synthetic_scene(num_views=3, H=48, W=48, num_steps=32)
    grid = R.mark_untrained_grid(scene.poses, scene.intrinsics, render_cfg)
    state = trainer.init_state(density_grid=grid)
    state = jax.device_put(state, state_shardings(mesh, state))
    data = trainer.scene_to_device(scene)
    state = trainer._update_grid(state, full=True)
    params, occ = state.params, state.occ
    key = jax.random.PRNGKey(0)

    def loss_with(p, planes_mode):
        k_batch, _, k_perturb = jax.random.split(key, 3)
        ro, rd, pix = sample_ray_batch(
            k_batch, data["images"], data["poses"], data["intrinsics"], n_rays)
        dp = NamedSharding(mesh, P(DATA_AXIS))
        ro = jax.lax.with_sharding_constraint(ro, dp)
        rd = jax.lax.with_sharding_constraint(rd, dp)
        pix = jax.lax.with_sharding_constraint(pix, dp)
        planes = trainer.field.build_planes(p)
        if planes_mode == "stop":
            planes = jax.tree.map(jax.lax.stop_gradient, planes)
        fp = p if planes_mode != "mlp_stop" else jax.tree.map(
            jax.lax.stop_gradient, p)
        out = R.render_occgrid(
            lambda x, d: trainer.field(fp, planes, x, d), ro, rd, occ.occ,
            trainer.render_cfg, rng=k_perturb,
            bg_color=jnp.zeros((n_rays, 3)), perturb=True,
            occ_coarse=occ.occ_coarse, occ_bbox=occ.bbox)
        return jnp.mean((out["image"] - pix[..., :3]) ** 2)

    def t(fn):
        out = fn()
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn()
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        return (time.perf_counter() - t0) / steps * 1e3

    from trinerflet_tpu.parallel.sharding import active_mesh

    res = {}
    for mode, label in (("full", "full grads"), ("stop", "planes stopped"),
                        ("mlp_stop", "mlps stopped (planes only)")):
        def make(m):
            @jax.jit
            def vg():
                with active_mesh(mesh):
                    return jax.grad(lambda p: loss_with(p, m))(params)
            return vg
        res[label] = t(make(mode))
    return res


def main():
    for d in (4, 8):
        r = probe(d)
        print(f"d={d}: " + "  ".join(f"[{k}] {v:8.1f} ms" for k, v in r.items()),
              flush=True)


if __name__ == "__main__":
    main()
