"""Round-4 march decomposition at the REAL driver-bench configuration.

Round 3 left the march at ~65-70 ms of the 192 ms step with the breakdown
measured only at a hand-picked post-autotune shape (NC=40, B=8) that the
driver run never reached (its tail showed num_coarse 0 -> NC=128, B=20).
This probe replays bench.py exactly (same trainer, same synthetic scene,
same 320-step warmup) so the occupancy state is the real steady state, then
times each march phase at the ACTUAL shapes, plus the candidate levers:

  * tuned num_coarse (what the bbox autotune would buy if it fired),
  * occupancy state diagnostics (bbox, fill) explaining WHY it didn't fire,
  * first_k_valid sort costs in isolation,
  * p99/overflow stats cost (per-step quantile = one 32k sort).

Run: cd /root/repo && nohup python -u -m scripts.bench_march_r4 > /tmp/bmarch4.log 2>&1 &
"""
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from trinerflet_tpu.data.synthetic import make_synthetic_scene
from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.ops import raymarch as RM
from trinerflet_tpu.render import renderer as R
from trinerflet_tpu.train.trainer import Trainer, TrainConfig


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


# ---- replay bench.py exactly ------------------------------------------------
N = 32768
nerf_cfg = NeRFConfig(
    triplane=TriplaneConfig(channels=16, resolution=1024, wavelet_scale=16),
    bound=1.5, compute_dtype="bfloat16", plane_dtype="bfloat16",
)
render_cfg = R.RenderConfig(
    bound=1.5, grid_size=128, density_thresh=10.0, max_steps=1024,
    samples_per_ray_budget=20, dt_gamma=0.0, occ_test_stride=0,
)
train_cfg = TrainConfig(lr=1e-2, iters=10000, num_rays=N,
                        wavelet_regularization=0.4, renderer="occgrid",
                        update_extra_interval=16)
trainer = Trainer(nerf_cfg, render_cfg, train_cfg)
scene = make_synthetic_scene(num_views=8, H=256, W=256, num_steps=128)
grid = R.mark_untrained_grid(scene.poses, scene.intrinsics, render_cfg)
state = trainer.init_state(density_grid=grid)
data = trainer.scene_to_device(scene)

def report(tag, state, aux):
    cfg = trainer.render_cfg
    bbox = np.asarray(state.occ.bbox)
    occ_, occ_coarse_ = state.occ.occ, state.occ.occ_coarse
    print(f"[{tag}] cfg: budget {cfg.samples_per_ray_budget}, "
          f"compaction {cfg.compaction}(x{cfg.global_slots_per_ray}), "
          f"num_coarse_override {cfg.num_coarse_override}, "
          f"stride {cfg.resolved_occ_test_stride()}", flush=True)
    print(f"[{tag}] occ bbox {bbox.round(3)}  diag "
          f"{np.linalg.norm(bbox[3:]-bbox[:3]):.3f}  fill fine "
          f"{float(occ_.mean()):.4f} coarse {float(occ_coarse_.mean()):.4f}  "
          f"tuned_nc {R.tuned_num_coarse(cfg, bbox)}", flush=True)
    print(f"[{tag}] samples/ray mean {float(aux['num_samples'])/N:.2f}  "
          f"p99 {float(aux['samples_p99']):.2f}  "
          f"overflow {float(aux['overflow_frac']):.4f}  "
          f"loss {float(aux['loss']):.5f}", flush=True)


def run_steps(state, n, aux=None):
    for i in range(n):
        if i % train_cfg.update_extra_interval == 0:
            state = trainer._update_grid(state, full=int(state.occ.iter_density) < 16)
            trainer._maybe_retune_march(state, aux)
        state, aux = trainer._train_step(state, data)
    return state, aux


def time_step(state, steps=30):
    """Time the live train step, threading the donated state."""
    state, aux = trainer._train_step(state, data)  # ensure compiled
    _ = float(aux["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, aux = trainer._train_step(state, data)
    _ = float(aux["loss"])
    return (time.perf_counter() - t0) / steps * 1e3, state


print("warming 320 steps (matching bench.py)...", flush=True)
state, aux = run_steps(state, 320)
report("warm320", state, aux)
ms, state = time_step(state)
print(f"[warm320] full train step: {ms:7.1f} ms  "
      f"({N/ms*1e3/1e3:.1f}k rays/s)", flush=True)

# capture the 320-step occupancy for the phase decomposition below
cfg = trainer.render_cfg
bbox = np.asarray(state.occ.bbox)
occ = state.occ.occ
occ_coarse = state.occ.occ_coarse

# does longer warmup reach a sparser steady state? (training spends ~97% of
# its 10k iters past step 640 — if occupancy keeps shrinking, the 320-step
# bench window under-reports the true steady-state throughput)
# MARCH_R4_FAST=1 skips these (already measured: 190.3 ms flat at 640/1280 —
# the step cost is dominated by static-shape work, not occupancy content)
import os
if os.environ.get("MARCH_R4_FAST") != "1":
    for upto in (640, 1280, 2560):
        state, aux = run_steps(state, upto - (320 if upto == 640 else upto // 2),
                               aux)
        report(f"warm{upto}", state, aux)
        ms, state = time_step(state)
        print(f"[warm{upto}] full train step: {ms:7.1f} ms  "
              f"({N/ms*1e3/1e3:.1f}k rays/s)", flush=True)

F = cfg.fine_per_coarse
BC = cfg.coarse_budget
B = cfg.samples_per_ray_budget
H = cfg.grid_size
CAS = cfg.cascades
BOUND = cfg.bound
MAXS = cfg.max_steps
STRIDE = cfg.resolved_occ_test_stride()
NC0 = cfg.num_coarse_override or int(math.ceil(BOUND * MAXS / F))

# a real ray batch (same sampler as the step)
from trinerflet_tpu.data.rays import sample_ray_batch
rays_o, rays_d, _ = sample_ray_batch(
    jax.random.PRNGKey(7), data["images"], data["poses"], data["intrinsics"], N)[:3]
aabb = jnp.asarray(state.occ.bbox)
nears, fars = RM.near_far_from_aabb(rays_o, rays_d, aabb, cfg.min_near)
hit = nears < 1e30
nears_c = jnp.where(hit, nears, 0.0)
fars_c = jnp.where(hit, fars, 0.0)
noise = jnp.zeros((N,), jnp.float32)
dt = 2.0 * RM.SQRT3 / MAXS
seg = dt * F
t0v = nears_c + dt * noise


def march_at(nc):
    f = jax.jit(lambda ro, rd, nr, fr, ns: RM.march_hierarchical(
        ro, rd, nr, fr, occ, occ_coarse, ns,
        num_coarse=nc, fine_per_coarse=F, coarse_budget=BC, budget=B,
        max_steps=MAXS, grid_size=H, cascades=CAS, bound=BOUND,
        dt_gamma=0.0, occ_test_stride=STRIDE))
    return timeit(f, rays_o, rays_d, nears_c, fars_c, noise)


print(f"march_hierarchical NC={NC0:4d} (live) : {march_at(NC0):7.1f} ms", flush=True)
tuned = R.tuned_num_coarse(cfg, bbox)
for nc in sorted({48, 64, tuned or 48}):
    if nc < NC0:
        print(f"march_hierarchical NC={nc:4d}        : {march_at(nc):7.1f} ms", flush=True)

# ---- phase decomposition at the live NC -------------------------------------
def occ_lookup(grid_bool, pts, dts):
    return RM.occupancy_lookup(grid_bool, pts, dts, grid_size=H, cascades=CAS,
                               bound=BOUND)


def coarse(ro, rd, t0, far):
    kc = jnp.arange(NC0, dtype=ro.dtype)
    t_mid = t0[:, None] + seg * kc[None, :] + 0.5 * seg
    pts_c = jnp.clip(ro[:, None, :] + rd[:, None, :] * t_mid[..., None], -BOUND, BOUND)
    occ_c = occ_lookup(occ_coarse, pts_c, jnp.full_like(t_mid, dt))
    return occ_c & (t_mid - 0.5 * seg < far[:, None])


jc = jax.jit(coarse)
valid_c = jc(rays_o, rays_d, t0v, fars_c)
print(f"\nA coarse occ test ({N*NC0/1e6:.1f}M gathers): {timeit(jc, rays_o, rays_d, t0v, fars_c):7.1f} ms", flush=True)

jb = jax.jit(lambda v: RM.first_k_valid(v, BC, spread=True))
seg_idx, seg_mask, seg_stride = jb(valid_c)
print(f"B coarse select (lane-sort {NC0}-wide): {timeit(jb, valid_c):7.1f} ms", flush=True)


def fine(ro, rd, t0, far, sidx, smask):
    t_seg0 = t0[:, None] + seg * sidx.astype(ro.dtype)
    s = STRIDE
    n_probe = -(-F // s)
    kp = jnp.arange(n_probe, dtype=ro.dtype)
    t_p = t_seg0[..., None] + dt * (s * kp[None, None, :] + 0.5 * (s - 1))
    pts_p = jnp.clip(ro[:, None, None, :] + rd[:, None, None, :] * t_p[..., None], -BOUND, BOUND)
    occ_p = occ_lookup(occ, pts_p, jnp.full_like(t_p, dt))
    occ_f = jnp.repeat(occ_p, s, axis=-1)[..., :F]
    kf = jnp.arange(F, dtype=ro.dtype)
    t_f = t_seg0[..., None] + dt * kf[None, None, :]
    valid_f = occ_f & smask[..., None] & (t_f < far[:, None, None])
    return valid_f.reshape(N, BC * F), t_f.reshape(N, BC * F)


jf = jax.jit(fine)
valid_f, t_f = jf(rays_o, rays_d, t0v, fars_c, seg_idx, seg_mask)
nprobe = -(-F // STRIDE)
print(f"C fine probes ({N*BC*nprobe/1e6:.1f}M gathers)  : {timeit(jf, rays_o, rays_d, t0v, fars_c, seg_idx, seg_mask):7.1f} ms", flush=True)

jd = jax.jit(lambda v, tf: RM.first_k_valid(v, B, spread=True, payload=tf))
jd(valid_f, t_f)
print(f"D final select (lane-sort {BC*F}-wide + t ride): {timeit(jd, valid_f, t_f):7.1f} ms", flush=True)

# ---- stats cost: the per-step p99 quantile (one 32k sort) -------------------
demand = seg_mask.sum(-1).astype(jnp.float32)
jq = jax.jit(lambda d: (jnp.quantile(d, 0.99), (d > B).mean()))
jq(demand)
print(f"E p99 quantile + overflow stats    : {timeit(jq, demand):7.1f} ms", flush=True)

# ---- near/far + ray clip ----------------------------------------------------
jn = jax.jit(lambda ro, rd: RM.near_far_from_aabb(ro, rd, aabb, cfg.min_near))
print(f"F near_far_from_aabb               : {timeit(jn, rays_o, rays_d):7.1f} ms", flush=True)
