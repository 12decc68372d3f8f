"""Decompose the field fwd+bwd slice of the bench-config train step.

bench_step_parts (round 3, post sampler fix) measures the full step at
~217 ms with march ~31-43 ms and sampler ~3 ms — leaving ~150+ ms in
"field fwd+bwd + IDWT + composite + opt" that has never been split at the
CURRENT code state (quad sampler + blocked scatter + banded-matrix IDWT).
This times each piece in isolation at bench scale so the next optimization
targets the real maximum.

Run (TPU): cd /root/repo && nohup python -u -m scripts.bench_field_parts > /tmp/bfield.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from trinerflet_tpu.models.nerf import NeRFConfig, NeRFField, init_nerf_params
from trinerflet_tpu.models.triplane import TriplaneConfig, project_to_planes
from trinerflet_tpu.ops.grid_sample import sample_planes_corner, sample_planes_quad
from trinerflet_tpu.ops import raymarch as RM


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
    print(f"{name:44s}: {ms:8.2f} ms", flush=True)
    return ms


N_RAYS, B = 32768, 20
M_BUDGET = N_RAYS * B            # per-ray budget layout volume (655k)
M_MEAN = N_RAYS * 13             # global-compaction volume at live mean (426k)
C, RES = 16, 1024

nerf_cfg = NeRFConfig(
    triplane=TriplaneConfig(channels=C, resolution=RES, wavelet_scale=16),
    bound=1.5, compute_dtype="bfloat16", plane_dtype="bfloat16",
)
field = NeRFField(nerf_cfg)
params = init_nerf_params(jax.random.PRNGKey(0), nerf_cfg)
planes = jax.jit(field.build_planes)(params)
rng = np.random.default_rng(0)

for M in (M_MEAN, M_BUDGET):
    print(f"--- M = {M//1000}k points ---", flush=True)
    pts = jnp.asarray(rng.uniform(-1.4, 1.4, (M, 3)), jnp.float32)
    dirs_ = rng.standard_normal((M, 3))
    dirs = jnp.asarray(dirs_ / np.linalg.norm(dirs_, axis=-1, keepdims=True),
                       jnp.float32)

    stack = planes["full"]                      # (3, RES, RES, C) bf16
    pc = jax.jit(lambda x: project_to_planes(x, 1.5))(pts)

    timeit("project_to_planes", jax.jit(lambda x: project_to_planes(x, 1.5)), pts)
    timeit("quad sample fwd", jax.jit(sample_planes_quad), stack, pc)
    gq = jax.jit(jax.grad(lambda s, c: sample_planes_quad(s, c).astype(jnp.float32).sum()))
    timeit("quad sample fwd+bwd (blocked scatter)", gq, stack, pc)
    timeit("corner sample fwd", jax.jit(sample_planes_corner), stack, pc)
    gc_ = jax.jit(jax.grad(lambda s, c: sample_planes_corner(s, c).astype(jnp.float32).sum()))
    timeit("corner sample fwd+bwd", gc_, stack, pc)

    # raw gather floor: 3 x M rows from a (RES^2, 4C) bf16 quad table
    quad_t = jnp.asarray(rng.standard_normal((RES * RES, 4 * C)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, RES * RES, M), jnp.int32)
    timeit("raw take Mx(4C bf16) x1", jax.jit(lambda t, i: jnp.take(t, i, axis=0)),
           quad_t, idx)

    # full field with planes held constant (sampling + MLPs, no IDWT)
    f_fwd = jax.jit(lambda p, x, d: field(p, planes, x, d)[1].astype(jnp.float32).sum())
    timeit("field fwd (planes fixed)", f_fwd, params, pts, dirs)
    f_g = jax.jit(jax.grad(lambda p, x, d: field(p, planes, x, d)[1].astype(jnp.float32).sum()))
    timeit("field fwd+bwd (planes fixed: no IDWT bwd)", f_g, params, pts, dirs)

    fp_g = jax.jit(jax.grad(
        lambda p, x, d: field(p, field.build_planes(p), x, d)[1].astype(jnp.float32).sum()))
    timeit("field fwd+bwd (incl. IDWT fwd+bwd)", fp_g, params, pts, dirs)

# composite at render shape
sig = jnp.asarray(rng.uniform(0, 3, (N_RAYS, B)), jnp.float32)
rgb = jnp.asarray(rng.uniform(0, 1, (N_RAYS, B, 3)), jnp.float32)
zr = jnp.cumsum(jnp.full((N_RAYS, B), 0.01), -1)
dl = jnp.full((N_RAYS, B), 0.01)
comp = jax.jit(lambda s, r: RM.composite_dense(s, r, dl, zr)[2].astype(jnp.float32).sum())
timeit("composite_dense fwd", comp, sig, rgb)
comp_g = jax.jit(jax.grad(lambda s, r: RM.composite_dense(s, r, dl, zr)[2].astype(jnp.float32).sum(), argnums=(0, 1)))
timeit("composite_dense fwd+bwd", comp_g, sig, rgb)

# optimizer + EMA on the full param tree with ones-grads
import optax

opt = optax.adam(1e-2, b1=0.9, b2=0.99, eps=1e-15)
opt_state = opt.init(params)
grads = jax.tree.map(jnp.ones_like, params)


def opt_step(os_, p, g):
    up, os2 = opt.update(g, os_, p)
    p2 = optax.apply_updates(p, up)
    ema = jax.tree.map(lambda a, b: 0.95 * a + 0.05 * b, p, p2)
    return os2, p2, ema


timeit("adam update + EMA (full tree)", jax.jit(opt_step), opt_state, params, grads)
