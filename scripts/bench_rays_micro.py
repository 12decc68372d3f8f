"""Line-level bisect of sample_ray_batch on the real TPU.

bench_sampling_bisect showed the jitted sampler ALONE at 93.7 ms (s0) before
the einsum fix. This probe times each cumulative stage of the sampler so the
slow lowering can be pinned to one line. Run (TPU, from /root/repo):
    nohup python -u -m scripts.bench_rays_micro > /tmp/brays.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 32768
V, H, W = 8, 256, 256
intrinsics = (180.0, 180.0, 128.0, 128.0)

images = jnp.asarray(np.random.RandomState(0).rand(V, H, W, 4), jnp.float32)
poses = jnp.asarray(np.random.RandomState(1).randn(V, 4, 4), jnp.float32)
rng = jax.random.PRNGKey(0)


def timeit(name, fn, *args, reps=16):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    float(np.asarray(jax.tree.leaves(r)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    float(np.asarray(jax.tree.leaves(r)[0]).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:28s}: {dt:8.2f} ms", flush=True)


fx, fy, cx, cy = intrinsics


def idx(rng):
    k1, k2 = jax.random.split(rng)
    img_idx = jax.random.randint(k1, (N,), 0, V)
    pix_idx = jax.random.randint(k2, (N,), 0, H * W)
    return img_idx, pix_idx


def dirs_of(pix_idx):
    i = (pix_idx % W).astype(jnp.float32) + 0.5
    j = (pix_idx // W).astype(jnp.float32) + 0.5
    d = jnp.stack([(i - cx) / fx, (j - cy) / fy, jnp.ones_like(i)], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


timeit("a randint only", lambda r: idx(r), rng)
timeit("b + dirs/norm", lambda r: dirs_of(idx(r)[1]), rng)
timeit("c + pose gather 3x3", lambda r: poses[idx(r)[0], :3, :3], rng)


def c2(r):
    ii, _ = idx(r)
    return jnp.take(poses.reshape(V, 16), ii, axis=0)


timeit("c2 flat take pose rows", c2, rng)


def d_stage(r):
    ii, pp = idx(r)
    dd = dirs_of(pp)
    rot = poses[ii, :3, :3]
    return (rot * dd[:, None, :]).sum(-1)


timeit("d + matvec (mul-sum)", d_stage, rng)


def d2(r):
    ii, pp = idx(r)
    dd = dirs_of(pp)
    rows = jnp.take(poses.reshape(V, 16), ii, axis=0)
    rot = rows[:, :12].reshape(N, 3, 4)[:, :, :3]
    return (rot * dd[:, None, :]).sum(-1), rows[:, 3:12:4]


timeit("d2 matvec via flat take", d2, rng)


def e_full(r):
    ii, pp = idx(r)
    dd = dirs_of(pp)
    rot = poses[ii, :3, :3]
    rd = (rot * dd[:, None, :]).sum(-1)
    ro = poses[ii, :3, 3]
    return ro, rd


timeit("e full rays_for_pixels", e_full, rng)


def f_pix(r):
    ii, pp = idx(r)
    return images.reshape(V, H * W, -1)[ii, pp]


timeit("f pixel gather (2-idx)", f_pix, rng)


def f2(r):
    ii, pp = idx(r)
    return jnp.take(images.reshape(V * H * W, 4), ii * (H * W) + pp, axis=0)


timeit("f2 pixel gather (flat)", f2, rng)

from trinerflet_tpu.data.rays import sample_ray_batch  # noqa: E402

timeit("g sample_ray_batch", lambda r: sample_ray_batch(
    r, images, poses, intrinsics, N), rng)


# --- RNG implementation suspects -------------------------------------------
# threefry2x32 is JAX's default key impl; 'rbg' uses the hardware RNG.
rbg_key = jax.random.key(0, impl="rbg")

timeit("h randint rbg impl", lambda r: (
    jax.random.randint(jax.random.split(r)[0], (N,), 0, V),
    jax.random.randint(jax.random.split(r)[1], (N,), 0, H * W)), rbg_key)


def lcg(r):
    # counter-based stateless LCG from one scalar seed: 2 mul-adds per stream
    s = jax.random.key_data(r).reshape(-1)[0].astype(jnp.uint32)
    c = jnp.arange(N, dtype=jnp.uint32)
    a = (s + c) * jnp.uint32(747796405) + jnp.uint32(2891336453)
    b = (s + c + jnp.uint32(0x9E3779B9)) * jnp.uint32(747796405)
    return (a % jnp.uint32(V)).astype(jnp.int32), \
           (b % jnp.uint32(H * W)).astype(jnp.int32)


timeit("i stateless LCG idx", lcg, rng)


def j_bits(r):
    k1, k2 = jax.random.split(r)
    b1 = jax.random.bits(k1, (N,), jnp.uint32)
    b2 = jax.random.bits(k2, (N,), jnp.uint32)
    return (b1 % jnp.uint32(V)).astype(jnp.int32), \
           (b2 % jnp.uint32(H * W)).astype(jnp.int32)


timeit("j bits+mod (no randint)", j_bits, rng)

timeit("k split only", lambda r: jax.random.split(r), rng)

timeit("l one fold_in + bits", lambda r: jax.random.bits(
    jax.random.fold_in(r, 7), (2 * N,), jnp.uint32), rng)


def m_full_lcg(r):
    ii, pp = lcg(r)
    dd = dirs_of(pp)
    rot = poses[ii, :3, :3]
    rd = (rot * dd[:, None, :]).sum(-1)
    ro = poses[ii, :3, 3]
    pix = images.reshape(V, H * W, -1)[ii, pp]
    return ro, rd, pix


timeit("m full sampler w/ LCG", m_full_lcg, rng)


# --- pixel-gather A/B: 2-array advanced indexing vs flat row-take ----------
def px_adv(r):
    ii, pp = idx(r)
    return images.reshape(V, H * W, -1)[ii, pp]


def px_flat(r):
    ii, pp = idx(r)
    return jnp.take(images.reshape(V * H * W, -1), ii * (H * W) + pp, axis=0)


timeit("n pixels 2-array adv idx", px_adv, rng)
timeit("o pixels flat row-take", px_flat, rng)

from trinerflet_tpu.data.rays import sample_ray_batch as srb_now  # noqa: E402

timeit("p sample_ray_batch (now)", lambda r: srb_now(
    r, images, poses, intrinsics, N), rng)
