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

nerf_cfg = NeRFConfig(
    triplane=TriplaneConfig(channels=CH, resolution=RES, wavelet_scale=32),
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
    print("warming 96 steps...", flush=True)
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

    # isolated sampler paths at live-ish M
    B = trainer.render_cfg.samples_per_ray_budget
    M = N_RAYS * B
    planes = jax.jit(trainer.field.build_planes)(state.params)
    plane = planes["full"][0]  # (H, W, C) channel-last
    print(f"plane shape {plane.shape} dtype {plane.dtype}", flush=True)
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.uniform(-1, 1, (M, 2)).astype(np.float32))

    from trinerflet_tpu.ops.grid_sample import grid_sample_2d_corner

    f = jax.jit(lambda p, c: grid_sample_2d_corner(p, c).sum())
    timeit(f"corner fwd M={M}", f, plane, coords)
    g = jax.jit(jax.grad(lambda p: grid_sample_2d_corner(p, coords)
                         .astype(jnp.float32).sum()))
    timeit("corner fwd+bwd (live path)", g, plane)

    # realistic index/liveness model: samples cluster in the occupied
    # footprint (~35% of the plane) and ~45% of slots are dead (ray padding
    # + early termination) -> routed to the drop sentinel by the live path
    live_frac, fp_lo, fp_hi = 0.55, int(0.3 * RES * RES), int(0.65 * RES * RES)
    idxN = rng.integers(fp_lo, fp_hi, M).astype(np.int32)
    idxN[rng.random(M) > live_frac] = RES * RES  # sentinel
    idxN = jnp.asarray(idxN)
    pay4c = jnp.asarray(rng.normal(size=(M, 4 * CH)).astype(np.float32))

    # quad-grad variant: one scatter of N rows x 4C into (H*W, 4C)
    fq = jax.jit(lambda i, p: blocked_scatter_add(
        i, p, RES * RES, precision="default", trip="dynamic"))
    timeit(f"scatter N={M} rows x 4C={4*CH} (quad-grad form)", fq, idxN, pay4c)

    # factored quad-grad: sort narrow [w|g] rows, outer product in-body
    from trinerflet_tpu.ops.scatter import blocked_scatter_add_outer

    wN = jnp.asarray(rng.random((M, 4)).astype(np.float32))
    gN = jnp.asarray(rng.normal(size=(M, CH)).astype(np.float32))
    # (tile, block) sweep: at 2048^2 the live rows spread over 4x more tiles
    # than at 1024^2 (~500 rows/touched tile vs ~2100), so the matmul FLOPs
    # (= rows_processed * tile * D) favor far smaller tiles/blocks here
    for tile, block in ((2048, 2048), (2048, 1024), (1024, 1024),
                        (1024, 512), (512, 512), (4096, 2048)):
        fo = jax.jit(lambda i, w, g, t=tile, b=block: blocked_scatter_add_outer(
            i, w, g, RES * RES, tile=t, block=b, precision="default"))
        timeit(f"scatter outer w4 x g{CH} tile={tile} block={block}",
               fo, idxN, wN, gN)

    # corner form: 4N rows x C
    idx4N = np.repeat(np.asarray(idxN), 4)
    idx4N[idx4N < RES * RES] += rng.integers(0, 2, (idx4N < RES * RES).sum())
    idx4N = jnp.asarray(idx4N.astype(np.int32))
    payC = jnp.asarray(rng.normal(size=(4 * M, CH)).astype(np.float32))
    fc = jax.jit(lambda i, p: blocked_scatter_add(
        i, p, RES * RES, precision="default", trip="dynamic"))
    timeit(f"scatter 4N={4*M} rows x C={CH} (corner form)", fc, idx4N, payC)

    # channel-split corner: 2 x (4N, 16)
    fs = jax.jit(lambda i, p: jnp.stack([
        blocked_scatter_add(i, p[:, :16], RES * RES, precision="default",
                            trip="dynamic"),
        blocked_scatter_add(i, p[:, 16:], RES * RES, precision="default",
                            trip="dynamic")]))
    timeit("scatter corner split 2x16ch", fs, idx4N, payC)

    # IDWT ladder
    bp = jax.jit(trainer.field.build_planes)
    timeit("build_planes (IDWT) fwd", bp, state.params)
    bpg = jax.jit(jax.grad(lambda p: sum(
        jnp.sum(v.astype(jnp.float32) ** 2)
        for v in jax.tree.leaves(trainer.field.build_planes(p)))))
    timeit("build_planes fwd+bwd", bpg, state.params)


if __name__ == "__main__":
    main()
