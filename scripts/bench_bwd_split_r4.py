"""Split the ~85 ms backward of the driver-bench step (round-4 accounting:
fwd 96 ms / bwd 91.5 ms / opt 4 ms).

At the live post-warmup state this times jax.grad variants and isolated
scatter configurations so the backward decomposes into: plane-scatter path,
MLP path, composite bwd, and everything else.

  a) grad, full params               (reference: ~91.5 ms bwd)
  b) grad, planes stop_gradient      (bwd minus scatter+IDWT-transpose)
  c) grad, MLPs stopped              (scatter+IDWT path alone)
  d) blocked scatter isolated at live M / quad shapes, tile/block variants
  e) scatter with reorder='sortops' vs 'gather'

Run: cd /root/repo && nohup python -u -m scripts.bench_bwd_split_r4 > /tmp/bbwd.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from trinerflet_tpu.data.rays import sample_ray_batch
from trinerflet_tpu.data.synthetic import make_synthetic_scene
from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.ops.scatter import blocked_scatter_add
from trinerflet_tpu.render import renderer as R
from trinerflet_tpu.train.trainer import Trainer, TrainConfig

N_RAYS = 32768

nerf_cfg = NeRFConfig(
    triplane=TriplaneConfig(channels=16, resolution=1024, wavelet_scale=16),
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


def timeit(label, fn, *args, reps=10):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:56s}: {ms:8.2f} ms", flush=True)
    return ms


def main():
    scene = make_synthetic_scene(num_views=8, H=256, W=256, num_steps=128)
    trainer = Trainer(nerf_cfg, render_cfg, train_cfg)
    grid = R.mark_untrained_grid(scene.poses, scene.intrinsics, render_cfg)
    state = trainer.init_state(density_grid=grid)
    data = trainer.scene_to_device(scene)
    print("warming 320 steps...", flush=True)
    aux = None
    for i in range(320):
        if i % 16 == 0:
            state = trainer._update_grid(state, full=int(state.occ.iter_density) < 16)
            trainer._maybe_retune_march(state, aux)
        state, aux = trainer._train_step(state, data)
    force(aux["loss"])
    params, occ = state.params, state.occ
    key = jax.random.PRNGKey(7)
    B = trainer.render_cfg.samples_per_ray_budget

    def loss_with(p, mode):
        k_batch, _, k_perturb = jax.random.split(key, 3)
        ro, rd, pix = sample_ray_batch(
            k_batch, data["images"], data["poses"], data["intrinsics"], N_RAYS)
        planes = trainer.field.build_planes(p)
        if mode == "planes_stop":
            planes = jax.tree.map(jax.lax.stop_gradient, planes)
        fp = p if mode != "mlp_stop" else jax.tree.map(jax.lax.stop_gradient, p)
        out = R.render_occgrid(
            lambda x, d: trainer.field(fp, planes, x, d), ro, rd, occ.occ,
            trainer.render_cfg, rng=k_perturb,
            bg_color=jnp.zeros((N_RAYS, 3)), perturb=True,
            occ_coarse=occ.occ_coarse, occ_bbox=occ.bbox)
        return jnp.mean((out["image"] - pix[..., :3]) ** 2)

    for mode, label in (("full", "a grad full"),
                        ("planes_stop", "b grad planes-stopped"),
                        ("mlp_stop", "c grad mlps-stopped (planes only)")):
        g = jax.jit(lambda m=mode: jax.grad(lambda p: loss_with(p, m))(params))
        timeit(label, g)

    # d/e: isolated blocked scatter at the quad-bwd shapes: per plane,
    # N = N_RAYS * B rows of 4C f32 into H*W rows
    H = nerf_cfg.triplane.resolution
    C = nerf_cfg.triplane.channels
    M = N_RAYS * B
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, H * H, M, dtype=np.int32))
    pay = jnp.asarray(rng.normal(size=(M, 4 * C)).astype(np.float32))
    for tile, block in ((2048, 1024), (4096, 1024), (2048, 2048), (8192, 2048)):
        f = jax.jit(lambda i, p, t=tile, b=block: blocked_scatter_add(
            i, p, H * H, tile=t, block=b, precision="default"))
        timeit(f"d scatter M={M} 4C={4*C} tile={tile} block={block}", f, idx, pay)
    f = jax.jit(lambda i, p: blocked_scatter_add(
        i, p, H * H, precision="default", reorder="sortops"))
    timeit("e scatter reorder=sortops", f, idx, pay)
    f = jax.jit(lambda i, p: blocked_scatter_add(
        i, p, H * H, precision="highest"))
    timeit("e scatter precision=highest (6-pass)", f, idx, pay)
    # channel-split: two 32-wide scatters instead of one 64-wide
    ph = pay.reshape(M, 2, 2 * C)
    f = jax.jit(lambda i, p: jnp.stack([
        blocked_scatter_add(i, p[:, 0], H * H, precision="default"),
        blocked_scatter_add(i, p[:, 1], H * H, precision="default")]))
    timeit("e scatter split 2x32ch", f, idx, ph)


if __name__ == "__main__":
    main()
