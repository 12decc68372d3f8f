"""Sub-phase timing of the hierarchical march at the bench config (round 3).

Answers: where do the ~82 ms of march go (coarse occ gathers, coarse
selection sort, fine occ gathers, fine selection sort, final take), and do
candidate variants (strided fine testing, int8 grid gathers) pay?

Run: nohup python -u -m scripts.bench_march > /tmp/bmarch.log 2>&1 &
"""
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from trinerflet_tpu.ops import raymarch as RM
from trinerflet_tpu.render import renderer as R


def force(x):
    leaves = jax.tree.leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32).reshape(-1)[:1]))


def timeit(fn, *args, reps=10):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / reps * 1e3


N = 32768
render_cfg = R.RenderConfig(bound=1.5, grid_size=128, max_steps=1024,
                            samples_per_ray_budget=20, dt_gamma=0.0)
F = render_cfg.fine_per_coarse          # 12
BC = render_cfg.coarse_budget           # 8
B = 8                                    # post-auto-tune budget
H = render_cfg.grid_size
CAS = render_cfg.cascades
BOUND = render_cfg.bound
MAXS = render_cfg.max_steps
NC = 40                                  # post-auto-tune coarse segments

rng = np.random.default_rng(0)
rays_o = jnp.asarray(rng.uniform(-0.5, 0.5, (N, 3)), jnp.float32)
d = rng.standard_normal((N, 3))
rays_d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
occb = jax.random.uniform(jax.random.PRNGKey(1), (CAS, H, H, H)) < 0.04
occ_coarse = R._dilate3(occb)
noise = jnp.zeros((N,), jnp.float32)

aabb = jnp.asarray(render_cfg.aabb, jnp.float32)
nears, fars = RM.near_far_from_aabb(rays_o, rays_d, aabb, 0.2)
hit = nears < 1e30
nears = jnp.where(hit, nears, 0.0)
fars = jnp.where(hit, fars, 0.0)

dt = 2.0 * RM.SQRT3 / MAXS
seg = dt * F
t0v = nears + dt * noise


def occ_lookup(grid_bool, pts, dts):
    lvl = RM._mip_level(pts, dts, H, CAS)
    mip_bound = jnp.minimum(jnp.exp2(lvl.astype(pts.dtype)), BOUND)
    q = 0.5 * (pts / mip_bound[..., None] + 1.0) * H
    q = jnp.clip(q, 0.0, H - 1).astype(jnp.int32)
    flat = ((lvl * H + q[..., 0]) * H + q[..., 1]) * H + q[..., 2]
    return jnp.take(grid_bool.reshape(-1), flat.reshape(-1)).reshape(flat.shape)


# ---- phase A: coarse test
def coarse(ro, rd, t0, far):
    kc = jnp.arange(NC, dtype=ro.dtype)
    t_mid = t0[:, None] + seg * kc[None, :] + 0.5 * seg
    pts_c = jnp.clip(ro[:, None, :] + rd[:, None, :] * t_mid[..., None], -BOUND, BOUND)
    occ_c = occ_lookup(occ_coarse, pts_c, jnp.full_like(t_mid, dt))
    return occ_c & (t_mid - 0.5 * seg < far[:, None])


jc = jax.jit(coarse)
valid_c = jc(rays_o, rays_d, t0v, fars)
print(f"A coarse occ test ({N*NC/1e6:.1f}M gathers): {timeit(jc, rays_o, rays_d, t0v, fars):7.1f} ms", flush=True)

# ---- phase B: coarse first_k_valid (sort NC wide)
jb = jax.jit(lambda v: RM.first_k_valid(v, BC, spread=True))
seg_idx, seg_mask, seg_stride = jb(valid_c)
print(f"B coarse select (sort {NC}-wide)     : {timeit(jb, valid_c):7.1f} ms", flush=True)


# ---- phase C: fine test
def fine(ro, rd, t0, far, sidx, smask):
    t_seg0 = t0[:, None] + seg * sidx.astype(ro.dtype)
    kf = jnp.arange(F, dtype=ro.dtype)
    t_f = t_seg0[..., None] + dt * kf[None, None, :]
    pts_f = jnp.clip(ro[:, None, None, :] + rd[:, None, None, :] * t_f[..., None], -BOUND, BOUND)
    occ_f = occ_lookup(occb, pts_f, jnp.full_like(t_f, dt))
    valid_f = occ_f & smask[..., None] & (t_f < far[:, None, None])
    return valid_f.reshape(N, BC * F), t_f.reshape(N, BC * F)


jf = jax.jit(fine)
valid_f, t_f = jf(rays_o, rays_d, t0v, fars, seg_idx, seg_mask)
print(f"C fine occ test ({N*BC*F/1e6:.1f}M gathers) : {timeit(jf, rays_o, rays_d, t0v, fars, seg_idx, seg_mask):7.1f} ms", flush=True)


# ---- phase C': strided fine test (test every s-th candidate on the DILATED
# grid, broadcast to the block; conservative because dilation covers +-1 voxel
# > s*dt for s <= 6 at this config)
def fine_strided(ro, rd, t0, far, sidx, smask, s):
    t_seg0 = t0[:, None] + seg * sidx.astype(ro.dtype)
    kf = jnp.arange(F // s, dtype=ro.dtype)
    t_probe = t_seg0[..., None] + dt * (s * kf[None, None, :] + 0.5 * (s - 1))
    pts_p = jnp.clip(ro[:, None, None, :] + rd[:, None, None, :] * t_probe[..., None], -BOUND, BOUND)
    occ_p = occ_lookup(occ_coarse, pts_p, jnp.full_like(t_probe, dt))  # dilated
    occ_full = jnp.repeat(occ_p, s, axis=-1)
    kf_all = jnp.arange(F, dtype=ro.dtype)
    t_f = t_seg0[..., None] + dt * kf_all[None, None, :]
    valid_f = occ_full & smask[..., None] & (t_f < far[:, None, None])
    return valid_f.reshape(N, BC * F), t_f.reshape(N, BC * F)


for s in (2, 4):
    js = jax.jit(lambda ro, rd, t0, far, si, sm, s=s: fine_strided(ro, rd, t0, far, si, sm, s))
    js(rays_o, rays_d, t0v, fars, seg_idx, seg_mask)
    print(f"C' strided fine s={s} ({N*BC*F//s/1e6:.1f}M gathers): {timeit(js, rays_o, rays_d, t0v, fars, seg_idx, seg_mask):7.1f} ms", flush=True)

# ---- phase D: final first_k_valid (sort BC*F wide)
jd = jax.jit(lambda v: RM.first_k_valid(v, B, spread=True))
jd(valid_f)
print(f"D final select (sort {BC*F}-wide)    : {timeit(jd, valid_f):7.1f} ms", flush=True)

# ---- phase E: final t gather
idx, mask, _ = jd(valid_f)


def final_take(tf, ix, mk):
    t = jnp.take(tf.reshape(-1), (jnp.arange(N, dtype=jnp.int32) * (BC * F))[:, None] + ix)
    return jnp.where(mk, t, 0.0)


je = jax.jit(final_take)
print(f"E final t gather                  : {timeit(je, t_f, idx, mask):7.1f} ms", flush=True)

# ---- whole march (current code) for reference, at tuned NC and budget
jm = jax.jit(lambda ro, rd, nr, fr, ns: RM.march_hierarchical(
    ro, rd, nr, fr, occb, occ_coarse, ns,
    num_coarse=NC, fine_per_coarse=F, coarse_budget=BC, budget=B,
    max_steps=MAXS, grid_size=H, cascades=CAS, bound=BOUND, dt_gamma=0.0))
jm(rays_o, rays_d, nears, fars, noise)
print(f"full march_hierarchical (NC={NC},B={B}): {timeit(jm, rays_o, rays_d, nears, fars, noise):7.1f} ms", flush=True)

# ---- dtype variant: int8 grid instead of bool
occ_i8 = occb.astype(jnp.int8)
jci = jax.jit(lambda ro, rd, t0, far: occ_lookup(occ_i8, jnp.clip(
    ro[:, None, :] + rd[:, None, :] * (t0[:, None] + seg * jnp.arange(NC, dtype=ro.dtype)[None, :] + 0.5 * seg)[..., None],
    -BOUND, BOUND), jnp.full((N, NC), dt)))
jci(rays_o, rays_d, t0v, fars)
print(f"coarse gathers on int8 grid       : {timeit(jci, rays_o, rays_d, t0v, fars):7.1f} ms", flush=True)
