"""Occupancy-grid ray marching and volume compositing, TPU-style.

This is the TPU-native redesign of the reference CUDA extension
``aux_libs/raymarching`` (kernels: ``kernel_near_far_from_aabb``
raymarching.cu:92, ``kernel_march_rays_train`` :312, ``kernel_composite_rays_
train_forward/backward`` :501/:602, ``kernel_march_rays``/``kernel_composite_
rays`` :701/:819).

Architecture — CUDA vs TPU
--------------------------
The CUDA version gives each ray a thread that walks the occupancy bitfield
with a data-dependent while loop, skips empty space analytically, and compacts
surviving samples with an ``atomicAdd`` bump allocator. None of that maps to a
vector machine with static shapes. Instead we:

1. enumerate a *static* grid of candidate samples per ray (``Kc`` steps of
   ``dt`` starting at the perturbed near plane — the same positions the CUDA
   marcher can ever visit when ``dt_gamma == 0``; the closed-form
   ``dt_ladder`` builds the growing-``dt`` ladder otherwise),
2. test occupancy for every candidate with one big vectorized gather (this is
   the part the CUDA kernel does serially; here it is bandwidth-bound and
   fully parallel),
3. compact the valid candidates into a fixed-size ``[M]`` point buffer with a
   global ``cumsum`` + scatter — the deterministic XLA equivalent of the
   atomic bump allocator — so the expensive field MLP runs only on occupied
   samples,
4. composite in compact space with segmented prefix sums: transmittance is
   ``exp(-segmented_cumsum(sigma*dt))``, early termination is a mask on
   ``T < T_thresh``. JAX autodiff of this forward reproduces the reference's
   hand-written analytic backward (raymarching.cu:643-681).

Everything is static-shaped, differentiable, and shardable over the ray axis.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "near_far_from_aabb",
    "sph_from_ray",
    "march_candidates",
    "compact_samples",
    "composite_compact",
    "composite_dense",
    "sample_pdf",
    "MarchResults",
    "CompactSamples",
]

SQRT3 = 1.7320508075688772


# ---------------------------------------------------------------------------
# Ray <-> scene intersections
# ---------------------------------------------------------------------------

def near_far_from_aabb(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, aabb: jnp.ndarray, min_near: float = 0.2
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab test of rays against an axis-aligned box.

    rays_o/rays_d: (N, 3); aabb: (6,) = (xmin, ymin, zmin, xmax, ymax, zmax).
    Returns (nears, fars), each (N,). Missing rays get near == far == a huge
    value, matching the CUDA kernel (raymarching.cu:122).
    """
    eps = 1e-15
    rd = rays_d + jnp.where(jnp.abs(rays_d) < eps, eps, 0.0)
    inv_d = 1.0 / rd
    t0 = (aabb[:3] - rays_o) * inv_d  # (N, 3)
    t1 = (aabb[3:] - rays_o) * inv_d
    tmin = jnp.minimum(t0, t1).max(axis=-1)
    tmax = jnp.maximum(t0, t1).min(axis=-1)
    miss = tmin > tmax
    near = jnp.maximum(tmin, min_near)
    big = jnp.asarray(3.4e38, rays_o.dtype)
    near = jnp.where(miss, big, near)
    far = jnp.where(miss, big, tmax)
    return near, far


def sph_from_ray(rays_o: jnp.ndarray, rays_d: jnp.ndarray, radius: float) -> jnp.ndarray:
    """Intersect rays with a background sphere, return (theta, phi) normalized
    to [-1, 1] (kernel_sph_from_ray, raymarching.cu:163-198; y is up)."""
    a = (rays_d * rays_d).sum(-1)
    b = (rays_o * rays_d).sum(-1)
    c = (rays_o * rays_o).sum(-1) - radius * radius
    t = (-b + jnp.sqrt(jnp.maximum(b * b - a * c, 0.0))) / a
    p = rays_o + t[:, None] * rays_d
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    theta = jnp.arctan2(jnp.sqrt(x * x + z * z), y)  # [0, pi)
    phi = jnp.arctan2(z, x)  # [-pi, pi)
    return jnp.stack([2 * theta / math.pi - 1, phi / math.pi], axis=-1)


# ---------------------------------------------------------------------------
# Candidate marching
# ---------------------------------------------------------------------------

class MarchResults(NamedTuple):
    ts: jnp.ndarray      # (N, Kc) sample start distance along ray
    dts: jnp.ndarray     # (N, Kc) step size at each sample
    valid: jnp.ndarray   # (N, Kc) bool: occupied & in [near, far) & under cap


def _mip_level(pts: jnp.ndarray, dt: jnp.ndarray, grid_size: int, cascades: int) -> jnp.ndarray:
    """max(mip_from_pos, mip_from_dt) per candidate (raymarching.cu:43-55):
    frexp exponent of max|coord| and of dt*H/2, clamped to [0, C-1]."""
    mx = jnp.max(jnp.abs(pts), axis=-1)
    _, e_pos = jnp.frexp(jnp.maximum(mx, 1e-30))
    _, e_dt = jnp.frexp(jnp.maximum(dt * grid_size * 0.5, 1e-30))
    lvl = jnp.maximum(e_pos, e_dt)
    return jnp.clip(lvl, 0, cascades - 1).astype(jnp.int32)


def occupancy_lookup(
    grid_bool: jnp.ndarray,   # (CAS, H, H, H) or (CAS, H^3) bool
    pts: jnp.ndarray,         # (..., 3) world points
    dts: jnp.ndarray,         # (...) step size per point (mip selection)
    *,
    grid_size: int,
    cascades: int,
    bound: float,
    bricks: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Occupancy-grid test at arbitrary points — the exact cell-addressing
    law the march uses (raymarching.cu:43-55 mip selection + voxel quantize).
    One flat row gather; returns bool of pts' leading shape. With ``bricks``
    (pack_occ_bricks of the same grid) the gather reads 64 B brick rows from
    a 32x smaller table instead — identical bits, ~2.5x faster (PERF.md)."""
    lvl = _mip_level(pts, dts, grid_size, cascades)
    mip_bound = jnp.minimum(jnp.exp2(lvl.astype(pts.dtype)), bound)
    q = 0.5 * (pts / mip_bound[..., None] + 1.0) * grid_size
    q = jnp.clip(q, 0.0, grid_size - 1).astype(jnp.int32)
    if bricks is not None:
        return _occupancy_bits_from_bricks(bricks, lvl, q, grid_size)
    flat = ((lvl * grid_size + q[..., 0]) * grid_size + q[..., 1]) * grid_size + q[..., 2]
    return jnp.take(grid_bool.reshape(-1), flat.reshape(-1)).reshape(flat.shape)


def pack_occ_bricks(occ: jnp.ndarray) -> Optional[jnp.ndarray]:
    """Bit-pack a (CAS, H, H, H) bool occupancy grid into 8^3-cell bricks:
    (CAS * (H/8)^3, 16) uint32 rows of 512 bits each.

    Why: TPU gather cost is TABLE-SIZE dependent (cache residency) and
    row-take-shaped: measured ~3.9 ns per 64 B row from this 0.5 MB table vs
    ~8.8 ns per element from the 4 MB bool grid (and ~8 ns per SCALAR word
    even from the small table — the row form is what's fast;
    scripts/bench_brick_fetch.py). Packing 512 cells per 64 B row shrinks
    the occupancy tables 32x into the fast zone; the march gathers one brick
    row per probe and extracts the probe's bit with lanes-full vector ops —
    the same bit the bool gather would have returned, so this is a pure
    layout change (bit-equality tested). Returns None when H is not a
    multiple of 8 (tiny test grids fall back to the bool path)."""
    C, H = occ.shape[0], occ.shape[1]
    if H % 8 != 0:
        return None
    nb = H // 8
    x = occ.reshape(C, nb, 8, nb, 8, nb, 8)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6))  # (C, nb, nb, nb, 8, 8, 8)
    bits = x.reshape(C * nb * nb * nb, 16, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return (bits * weights).sum(axis=-1, dtype=jnp.uint32)  # (rows, 16)


# (128, 8) f32 constant summing each 16-lane group of a lanes-full row:
# column g sums lanes [16g, 16(g+1))
def _group_sum_matrix() -> jnp.ndarray:
    import numpy as _np

    return jnp.asarray(_np.kron(_np.eye(8), _np.ones((16, 1))), jnp.float32)


def _occupancy_bits_from_bricks(
    bricks: jnp.ndarray,  # (CAS * nb^3, 16) uint32
    lvl: jnp.ndarray,     # (...,) int32 cascade per probe
    q: jnp.ndarray,       # (..., 3) int32 cell coords in [0, H)
    grid_size: int,
) -> jnp.ndarray:
    """Per-probe occupancy bits: one 64 B brick-row gather per probe, then
    extraction entirely in a lanes-full (M/8, 128) layout.

    Layout care is the whole game here: naive per-word column slices of the
    fetched (M, 16) rows get tile-padded up to 170x by the TPU's (8, 128)
    tiling (a 17 GB OOM at bench scale), and elementwise ops on (M, 16)
    arrays pay 8x padded traffic. Reshaping the fetched rows to (M/8, 128)
    packs 8 probes' words per full vector register row; the word one-hot,
    variable shift, and bit mask all run compact, and the per-probe group
    sum is one tiny (M/8, 128) @ (128, 8) matmul. Measured 16.3 ms for the
    bench coarse phase vs 32.1 ms for the bool-grid gather
    (scripts/bench_brick_fetch.py v2 chain)."""
    nb = grid_size // 8
    b = q // 8
    i = q % 8
    brick = ((lvl * nb + b[..., 0]) * nb + b[..., 1]) * nb + b[..., 2]
    inbrick = (i[..., 0] * 8 + i[..., 1]) * 8 + i[..., 2]
    shape = brick.shape
    brick = brick.reshape(-1)
    inbrick = inbrick.reshape(-1)
    M0 = brick.shape[0]
    M = -(-M0 // 8) * 8
    if M != M0:
        brick = jnp.concatenate([brick, jnp.zeros((M - M0,), brick.dtype)])
        inbrick = jnp.concatenate([inbrick, jnp.zeros((M - M0,), inbrick.dtype)])
    word = inbrick // 32                        # (M,) in [0, 16)
    shift = (inbrick % 32).astype(jnp.uint32)   # (M,)
    rows = jnp.take(bricks, brick, axis=0)      # (M, 16) u32
    packed = rows.reshape(M // 8, 128)
    g8 = (M // 8, 8, 16)
    sh128 = jnp.broadcast_to(shift.reshape(M // 8, 8, 1), g8).reshape(M // 8, 128)
    w128 = jnp.broadcast_to(word.reshape(M // 8, 8, 1), g8).reshape(M // 8, 128)
    lane16 = jnp.broadcast_to(
        jnp.arange(16, dtype=jnp.int32)[None, None, :], g8).reshape(M // 8, 128)
    bits = ((packed >> sh128) & jnp.uint32(1)).astype(jnp.float32)
    bits = bits * (w128 == lane16).astype(jnp.float32)
    occ8 = jax.lax.dot_general(
        bits, _group_sum_matrix(), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (M/8, 8): each probe's one-hot-masked bit
    return (occ8.reshape(-1)[:M0] > 0.5).reshape(shape)


def dt_ladder(
    t0: jnp.ndarray, num_steps: int, dt_min: float, dt_max: float,
    dt_gamma: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closed form of the growing-step candidate ladder
    ``t_{k+1} = t_k + clamp(dt_gamma * t_k, dt_min, dt_max)``
    (the CUDA sampling law, raymarching.cu:345-399).

    The recurrence has three phases — constant ``dt_min`` while
    ``t < A = dt_min/gamma``, geometric ``t_{k+1} = t_k (1+gamma)`` while
    ``t < B = dt_max/gamma``, constant ``dt_max`` after — so ``t(k)`` is an
    explicit per-ray function of the step index and the whole (N, K) ladder
    vectorizes. The previous implementation ran a length-``num_steps``
    ``lax.scan`` (serial: ~8192 dependent steps at bound 8), which made the
    dt_gamma > 0 fallback path unusably slow on TPU.
    """
    g = dt_gamma
    A = dt_min / g
    B = dt_max / g
    lg = math.log1p(g)
    dtype = t0.dtype
    k = jnp.arange(num_steps, dtype=dtype)[None, :]
    t0 = t0[:, None]
    # phase 1 -> 2 boundary: first k with t0 + k*dt_min >= A
    k1 = jnp.ceil(jnp.maximum(A - t0, 0.0) / dt_min)
    s0 = t0 + k1 * dt_min
    # phase 2 -> 3 boundary: first j with s0*(1+g)^j >= B
    j2 = jnp.ceil(
        jnp.maximum(jnp.log(jnp.maximum(B, s0) / s0), 0.0) / lg)
    t2 = s0 * jnp.exp(j2 * lg)
    t_p1 = t0 + k * dt_min
    t_p2 = s0 * jnp.exp(jnp.maximum(k - k1, 0.0) * lg)
    t_p3 = t2 + (k - k1 - j2) * dt_max
    ts = jnp.where(k < k1, t_p1, jnp.where(k < k1 + j2, t_p2, t_p3))
    dts = jnp.clip(ts * g, dt_min, dt_max)
    return ts, dts


def worst_case_ladder_steps(
    span: float, t0: float, dt_min: float, dt_max: float, dt_gamma: float,
) -> int:
    """Static upper bound on how many ladder steps cross ``span`` starting at
    ``t0`` (host-side; sizes the candidate enumeration). For dt_gamma > 0 the
    growing step reaches the far plane in FAR fewer steps than the uniform
    ``span/dt_min`` the flat path previously allocated (e.g. ~620 vs 8192 at
    bound 8, max_steps 1024, dt_gamma 1/128)."""
    if dt_gamma <= 0.0:
        return int(math.ceil(span / dt_min))
    far = t0 + span
    A = dt_min / dt_gamma
    B = dt_max / dt_gamma
    k1 = max(0, int(math.ceil((min(A, far) - t0) / dt_min)))
    s0 = t0 + k1 * dt_min
    j2 = 0
    if far > s0 and B > s0:
        j2 = int(math.ceil(math.log(min(B, far) / s0) / math.log1p(dt_gamma)))
    t2 = s0 * (1.0 + dt_gamma) ** j2
    k3 = max(0, int(math.ceil((far - t2) / dt_max)))
    return k1 + j2 + k3 + 2


@partial(jax.jit, static_argnames=("num_steps", "max_steps", "grid_size", "cascades", "bound", "dt_gamma"))
def march_candidates(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    nears: jnp.ndarray,
    fars: jnp.ndarray,
    occ_grid: jnp.ndarray,          # (cascades, H, H, H) bool
    noise: jnp.ndarray,             # (N,) in [0, 1); zeros disables perturb
    *,
    num_steps: int,                 # Kc: number of candidate samples per ray
    max_steps: int,                 # cap on *occupied* samples per ray (and dt_min divisor)
    grid_size: int = 128,
    cascades: int = 1,
    bound: float = 1.0,
    dt_gamma: float = 0.0,
) -> MarchResults:
    """Enumerate candidate samples along rays and occupancy-test them all.

    Matches kernel_march_rays_train's sampling law (raymarching.cu:345-399):
    ``dt = clamp(t * dt_gamma, 2*sqrt3/max_steps, 2*sqrt3*2^(C-1)/H)``, start
    at ``near + dt(near)*noise``. Instead of skipping empty voxels serially,
    every candidate position is tested in parallel and invalid ones are masked.
    """
    N = rays_o.shape[0]
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 * (2 ** (cascades - 1)) / grid_size

    def step_size(t):
        return jnp.clip(t * dt_gamma, dt_min, dt_max)

    t0 = nears + step_size(nears) * noise
    if dt_gamma == 0.0:
        k = jnp.arange(num_steps, dtype=rays_o.dtype)
        ts = t0[:, None] + dt_min * k[None, :]
        dts = jnp.full_like(ts, dt_min)
    else:
        ts, dts = dt_ladder(t0, num_steps, dt_min, dt_max, dt_gamma)

    pts = rays_o[:, None, :] + rays_d[:, None, :] * ts[..., None]
    pts = jnp.clip(pts, -bound, bound)

    lvl = _mip_level(pts, dts, grid_size, cascades)
    mip_bound = jnp.minimum(jnp.exp2(lvl.astype(pts.dtype)), bound)
    # voxel coords in [0, H)
    q = 0.5 * (pts / mip_bound[..., None] + 1.0) * grid_size
    q = jnp.clip(q, 0.0, grid_size - 1).astype(jnp.int32)
    flat = ((lvl * grid_size + q[..., 0]) * grid_size + q[..., 1]) * grid_size + q[..., 2]
    occ = jnp.take(occ_grid.reshape(-1), flat.reshape(-1), axis=0).reshape(N, -1)

    in_range = ts < fars[:, None]
    valid = occ.astype(bool) & in_range
    if num_steps > max_steps:
        before = jnp.cumsum(valid.astype(jnp.int32), axis=1) - valid.astype(jnp.int32)
        valid = valid & (before < max_steps)
    return MarchResults(ts=ts, dts=dts, valid=valid)


# ---------------------------------------------------------------------------
# Compaction (static-shape equivalent of the CUDA atomic bump allocator)
# ---------------------------------------------------------------------------

class CompactSamples(NamedTuple):
    xyzs: jnp.ndarray     # (M, 3) sample positions (clamped to bound)
    dirs: jnp.ndarray     # (M, 3)
    ts: jnp.ndarray       # (M,) distance from perturbed ray start (t + dt - t0)
    dts: jnp.ndarray      # (M,) step size (0 on padding slots)
    ray_id: jnp.ndarray   # (M,) int32, N on padding slots
    offsets: jnp.ndarray  # (N,) int32 start of each ray's segment in [0, M]
    counts: jnp.ndarray   # (N,) int32 kept samples per ray
    num_valid: jnp.ndarray  # () int32 total kept samples (<= M)


def compact_samples(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    march: MarchResults,
    *,
    m_budget: int,
    bound: float,
) -> CompactSamples:
    """Pack valid candidates into fixed-size buffers, ray-major order.

    Deterministic alternative to the CUDA ``atomicAdd`` compaction
    (raymarching.cu:405-416); overflow beyond ``m_budget`` drops the tail
    (the reference drops whole rays at random when its buffer estimate is
    exceeded, raymarching.py:198-232).

    TPU note: implemented entirely with gathers — slot ``m`` locates its source
    candidate by binary search over the inclusive cumsum of the valid mask
    (``searchsorted``), then gathers per-candidate values. XLA TPU scatters
    serialize and were ~300x slower than this gather formulation.
    """
    N, Kc = march.valid.shape
    valid_flat = march.valid.reshape(-1)
    c = jnp.cumsum(valid_flat.astype(jnp.int32))
    total = c[-1]

    # source candidate index for each output slot (the m-th valid element)
    targets = jnp.arange(1, m_budget + 1, dtype=c.dtype)
    src = jnp.searchsorted(c, targets, side="left")
    src = jnp.minimum(src, N * Kc - 1)
    slot_valid = targets <= jnp.minimum(total, m_budget)

    n = (src // Kc).astype(jnp.int32)
    k = src % Kc
    t = jnp.take(march.ts.reshape(-1), src)
    dt = jnp.take(march.dts.reshape(-1), src)
    dt = jnp.where(slot_valid, dt, 0.0)
    t0 = jnp.take(march.ts[:, 0], n)

    o = jnp.take(rays_o, n, axis=0)
    d = jnp.take(rays_d, n, axis=0)
    pts = jnp.clip(o + d * t[:, None], -bound, bound)

    counts_full = march.valid.astype(jnp.int32).sum(axis=1)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts_full)[:-1].astype(jnp.int32)]
    )
    offsets = jnp.minimum(offsets, m_budget)
    counts = jnp.minimum(counts_full, jnp.maximum(m_budget - offsets, 0))

    return CompactSamples(
        xyzs=jnp.where(slot_valid[:, None], pts, 0.0),
        dirs=jnp.where(slot_valid[:, None], d, 0.0),
        ts=jnp.where(slot_valid, t + dt - t0, 0.0),
        dts=dt,
        ray_id=jnp.where(slot_valid, n, jnp.int32(2**30)),
        offsets=offsets,
        counts=counts,
        num_valid=jnp.minimum(total, m_budget),
    )


def compact_global_dense(
    rays_o: jnp.ndarray,   # (N, 3)
    rays_d: jnp.ndarray,   # (N, 3)
    t: jnp.ndarray,        # (N, B) absolute sample distances (0 on invalid)
    dt: jnp.ndarray,       # (N, B) per-slot step (stride-scaled, 0 on invalid)
    mask: jnp.ndarray,     # (N, B) bool
    t0: jnp.ndarray,       # (N,) perturbed ray start
    *,
    m_budget: int,
    bound: float,
    prefix_mask: bool = False,
) -> CompactSamples:
    """Second-stage GLOBAL compaction of the per-ray (N, B) budget layout.

    The dense layout evaluates the field at every one of the N*B slots, so its
    cost scales with the per-ray budget B (set by the p99 of demand). Mid
    training the live mean is far below the p99 (measured 2.6 vs 20 at the
    bench config) — compacting the valid slots into a shared ``m_budget``
    buffer makes the field/gather/scatter volume scale with the MEAN instead.

    Source selection for an arbitrary mask is ONE flat sort of int32 position
    keys (invalid slots pushed past the end), the same trick as
    :func:`first_k_valid` — NOT the cumsum+searchsorted binary search: ~20
    search iterations x m_budget serialized gather rows cost more than the
    dense layout they were meant to replace (measured: global slots=12 at
    258 ms vs dense B=20 at 228 ms, scripts/bench_compaction_ab.py).

    ``prefix_mask=True`` declares that each ray's valid slots are a PREFIX of
    its row (``mask[n, :k_n]`` all True, rest False) — guaranteed by
    :func:`first_k_valid`'s sorted selection, i.e. by every hierarchical-march
    caller. Then the flat sort (28 ms/M keys, PERF.md) is unnecessary: the
    destination->source map is recovered from one N-row boundary scatter-add
    plus a cumsum over the buffer (segment ids) and one N-table take of the
    ray offsets — O(N + m_budget) vector work instead of an O(N*B log) sort.
    Output is identical to the sort path (tested).

    Overflow beyond ``m_budget`` drops the tail — callers watch
    ``num_valid/m_budget`` and retune. Counterpart of the CUDA bump-allocator
    compaction (raymarching.cu:405-416) for the two-level march.
    """
    N, B = t.shape
    if prefix_mask:
        counts_pref = mask.astype(jnp.int32).sum(axis=1)
        cum = jnp.cumsum(counts_pref)
        total = cum[-1]
        offs = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum[:-1]])
        # segment boundaries: ray n (n>=1) starts at slot cum[n-1]; empty
        # rays collapse onto the same start and the adds accumulate, so the
        # cumsum skips them. Starts beyond the buffer are dropped (those
        # rays' samples overflow and their slots are masked below anyway).
        seg = jnp.zeros((m_budget,), jnp.int32).at[cum[:-1]].add(
            1, mode="drop")
        n_of = jnp.cumsum(seg)                                # ray id / slot
        i_of = jnp.arange(m_budget, dtype=jnp.int32)
        j_of = i_of - jnp.take(offs, n_of)                    # rank in ray
        slot_valid = i_of < jnp.minimum(total, m_budget)
        src = jnp.where(slot_valid, n_of * B + j_of, N * B - 1)
    else:
        valid_flat = mask.reshape(-1)
        total = valid_flat.sum().astype(jnp.int32)
        pos = jnp.arange(N * B, dtype=jnp.int32)
        key = jnp.where(valid_flat, pos, pos + N * B)
        src = jax.lax.sort(key)[:m_budget]
        slot_valid = src < N * B
        src = jnp.where(slot_valid, src, N * B - 1)

    # ONE fused gather: broadcast the per-ray [o | d | t0] rows across the B
    # slots and take [o | d | t0 | t | dt] 9-wide rows in a single pass —
    # takes are per-ROW latency-bound on this stack (PERF.md), so one
    # m_budget-row take beats two (the broadcast write is dense/vectorized)
    odt0 = jnp.concatenate([rays_o, rays_d, t0[:, None]], axis=-1)  # (N, 7)
    table = jnp.concatenate(
        [
            jnp.broadcast_to(odt0[:, None, :], (N, B, 7)).reshape(N * B, 7),
            t.reshape(-1, 1),
            dt.reshape(-1, 1),
        ],
        axis=-1,
    )  # (N*B, 9)
    rows = jnp.take(table, src, axis=0)
    n = (src // B).astype(jnp.int32)
    o, d, t0g = rows[:, 0:3], rows[:, 3:6], rows[:, 6]
    tg, dtg = rows[:, 7], jnp.where(slot_valid, rows[:, 8], 0.0)
    pts = jnp.clip(o + d * tg[:, None], -bound, bound)

    counts_full = mask.astype(jnp.int32).sum(axis=1)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts_full)[:-1].astype(jnp.int32)]
    )
    offsets = jnp.minimum(offsets, m_budget)
    counts = jnp.minimum(counts_full, jnp.maximum(m_budget - offsets, 0))
    return CompactSamples(
        xyzs=jnp.where(slot_valid[:, None], pts, 0.0),
        dirs=jnp.where(slot_valid[:, None], d, 0.0),
        ts=jnp.where(slot_valid, tg + dtg - t0g, 0.0),
        dts=dtg,
        ray_id=jnp.where(slot_valid, n, jnp.int32(2**30)),
        offsets=offsets,
        counts=counts,
        num_valid=jnp.minimum(total, m_budget),
    )


def first_k_valid(
    valid: jnp.ndarray, budget: int, spread: bool = False,
    payload: jnp.ndarray = None,
):
    """Per-row selection of ``budget`` True entries of ``valid`` (N, K).

    With ``spread=False`` takes the first ``budget`` valid entries. With
    ``spread=True`` and more than ``budget`` valid entries, takes evenly
    spaced ranks across ALL valid entries instead — critical for early
    training, when the occupancy grid is dense and truncating to the first B
    samples would confine supervision to a shell at the ray entry (the CUDA
    reference keeps up to max_steps samples; a static budget must subsample
    the whole span instead of clipping it).

    Implementation: a lane-wise sort of positions (invalid -> K, sorted last)
    makes the b-th valid position directly addressable, so selection costs ONE
    flat gather per kept sample. (The previous row-cumsum binary search issued
    log2(K) gathers per kept sample — ~6M serialized gathers/step at the bench
    config, a top-3 step cost.)

    With ``payload`` (N, K), its values ride the lane sort as an extra sort
    operand (~free, PERF.md) and the selected values are returned alongside —
    saving the caller a SECOND serialized row-take (e.g. the march's final
    ``t`` gather, ~655k rows/step at the bench config).

    Returns (idx (N, budget) int32, mask (N, budget) bool,
    stride (N,) float32 = #valid represented by each kept sample, >= 1
    [, payload_taken (N, budget) when ``payload`` is given]).
    """
    N, K = valid.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (N, K), 1)
    keys = jnp.where(valid, pos, K)
    if payload is None:
        sorted_pos = jax.lax.sort(keys, dimension=1)  # valid positions first
    else:
        sorted_pos, sorted_pl = jax.lax.sort(
            (keys, payload), dimension=1, num_keys=1
        )
    count = valid.astype(jnp.int32).sum(axis=1, keepdims=True)
    b1 = jnp.broadcast_to(jnp.arange(1, budget + 1, dtype=jnp.int32), (N, budget))
    if spread:
        over = count > budget
        even = jnp.ceil(b1.astype(jnp.float32) * count.astype(jnp.float32) / budget)
        tgt = jnp.where(over, even.astype(jnp.int32), b1)
        stride = jnp.where(
            over[:, 0], count[:, 0].astype(jnp.float32) / budget, 1.0
        )
    else:
        tgt = b1
        stride = jnp.ones((N,), jnp.float32)
    rowoff = (jnp.arange(N, dtype=jnp.int32) * K)[:, None]
    src = rowoff + jnp.clip(tgt - 1, 0, K - 1)
    mask = b1 <= count
    if payload is None:
        idx = jnp.take(sorted_pos.reshape(-1), src)
        return jnp.minimum(idx, K - 1), mask, stride
    # ONE flat row-take serves both the position and the payload: stack the
    # two sorted lanes channel-last into (N*K, 2) rows. Positions must ride
    # in a dtype that represents every 0..K integer exactly — at least f32
    # (exact for K < 2^24); a bf16/f16 payload dtype would corrupt positions
    # past 256/2048, so low-precision payloads are promoted for the ride and
    # cast back after the take.
    ride = jnp.promote_types(jnp.float32, payload.dtype)
    both = jnp.stack(
        [sorted_pos.astype(ride), sorted_pl.astype(ride)], axis=-1
    ).reshape(N * K, 2)
    rows = jnp.take(both, src.reshape(-1), axis=0).reshape(N, budget, 2)
    idx = rows[..., 0].astype(jnp.int32)
    return jnp.minimum(idx, K - 1), mask, stride, rows[..., 1].astype(payload.dtype)


@partial(
    jax.jit,
    static_argnames=(
        "num_coarse", "fine_per_coarse", "coarse_budget", "budget",
        "max_steps", "grid_size", "cascades", "bound", "dt_gamma",
        "occ_test_stride", "coarse_test_stride",
    ),
)
def march_hierarchical(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    nears: jnp.ndarray,
    fars: jnp.ndarray,
    occ: jnp.ndarray,          # (CAS, H, H, H) bool, fine grid
    occ_coarse: jnp.ndarray,   # (CAS, H, H, H) bool, 3^3 max-pooled fine grid
    noise: jnp.ndarray,
    occ_bricks: Optional[jnp.ndarray] = None,         # pack_occ_bricks(occ)
    occ_coarse_bricks: Optional[jnp.ndarray] = None,  # pack_occ_bricks(occ_coarse)
    *,
    num_coarse: int,           # coarse segments per ray
    fine_per_coarse: int,      # fine candidates per coarse segment
    coarse_budget: int,        # occupied coarse segments kept per ray
    budget: int,               # final samples per ray
    max_steps: int,
    grid_size: int = 128,
    cascades: int = 1,
    bound: float = 1.0,
    dt_gamma: float = 0.0,
    occ_test_stride: int = 1,
    coarse_test_stride: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two-level occupancy marching (TPU redesign of the CUDA voxel-skipping
    loop, raymarching.cu:384-399).

    Level 1 tests ``num_coarse`` segment midpoints against the *dilated*
    (max-pooled) grid — conservative: a segment is skipped only if no voxel
    within one cell of its midpoint is occupied, which covers the whole
    segment as long as segment length <= ~2 voxels. Level 2 enumerates
    ``fine_per_coarse`` candidates only inside the surviving segments and
    tests the exact fine grid. This cuts the random-gather volume ~10x vs
    flat candidate enumeration (the gathers are the TPU bottleneck).

    Only supports dt_gamma == 0 (constant dt; the Blender recipes). Returns
    (t (N, budget), dt scalar, mask (N, budget), stride (N,),
    seg_lastocc (N,) float32) where stride is the optical-depth multiplier
    for budget-exceeded rays (see first_k_valid) and seg_lastocc is the
    1-based index of each ray's LAST occupied coarse segment (0 when none) —
    the live demand-span signal for the num_coarse autotune (content beyond
    it is unoccupied, so probing further is pure gather waste).
    """
    assert dt_gamma == 0.0, "hierarchical march requires constant dt"
    N = rays_o.shape[0]
    dt = 2.0 * SQRT3 / max_steps
    seg = dt * fine_per_coarse
    t0 = nears + dt * noise

    def occ_lookup(grid_bool, pts, dts, bricks=None):
        return occupancy_lookup(grid_bool, pts, dts, grid_size=grid_size,
                                cascades=cascades, bound=bound, bricks=bricks)

    # ---- level 1: coarse segments
    kc = jnp.arange(num_coarse, dtype=rays_o.dtype)
    t_mid = t0[:, None] + seg * kc[None, :] + 0.5 * seg          # (N, Sc)
    if coarse_test_stride > 1:
        # strided coarse testing: probe one group-center point per
        # `coarse_test_stride` consecutive segments against the dilated grid
        # and broadcast the probe's occupancy to its group. The dilation
        # radius grows with the stride (coarse_dilation_radius) so the probe
        # still covers the whole group up to the radius cap; beyond the cap
        # this keeps the same partial-coverage behavior as the fine stride
        # (occupied-run endpoints jitter by up to +-stride/2 segments; the
        # hard-scene quality A/B gates the default). Halves/thirds the
        # coarse gather volume — the march's dominant phase (PERF.md).
        cs = coarse_test_stride
        n_probe = -(-num_coarse // cs)
        kp = jnp.arange(n_probe, dtype=rays_o.dtype)
        t_pm = t0[:, None] + seg * (cs * kp[None, :] + 0.5 * cs)
        pts_p = rays_o[:, None, :] + rays_d[:, None, :] * t_pm[..., None]
        pts_p = jnp.clip(pts_p, -bound, bound)
        occ_p = occ_lookup(occ_coarse, pts_p, jnp.full_like(t_pm, dt),
                           bricks=occ_coarse_bricks)
        occ_c = jnp.repeat(occ_p, cs, axis=-1)[:, :num_coarse]
    else:
        pts_c = rays_o[:, None, :] + rays_d[:, None, :] * t_mid[..., None]
        pts_c = jnp.clip(pts_c, -bound, bound)
        occ_c = occ_lookup(occ_coarse, pts_c, jnp.full_like(t_mid, dt),
                           bricks=occ_coarse_bricks)
    valid_c = occ_c & (t_mid - 0.5 * seg < fars[:, None])
    # 1-based index of the last occupied segment per ray (0 = none): the
    # autotuner's demand-span signal (cheap elementwise max, no sort)
    seg_pos = jax.lax.broadcasted_iota(jnp.int32, valid_c.shape, 1) + 1
    seg_lastocc = jnp.max(jnp.where(valid_c, seg_pos, 0), axis=1).astype(jnp.float32)
    seg_idx, seg_mask, seg_stride = first_k_valid(valid_c, coarse_budget, spread=True)

    # ---- level 2: fine candidates inside surviving segments
    t_seg0 = t0[:, None] + seg * seg_idx.astype(rays_o.dtype)     # (N, Bc)
    kf = jnp.arange(fine_per_coarse, dtype=rays_o.dtype)
    t_f = t_seg0[..., None] + dt * kf[None, None, :]              # (N, Bc, F)
    if occ_test_stride > 1:
        # strided occupancy testing: consecutive dt-spaced candidates mostly
        # share a grid cell (dt ~ cell/5 at the Blender recipes), so test one
        # probe point per `stride` candidates against the exact fine grid and
        # broadcast the probe's cell occupancy to its group (nearest-probe
        # assignment). Cuts the fine gather volume (the march bottleneck) by
        # `stride`x. While stride*dt < cell the probe sits within half a cell
        # of every candidate it stands for, so only candidates in the
        # boundary half-cell of an occupied run can be mislabeled — a
        # symmetric +-(stride/2)-sample jitter of run endpoints, with no
        # systematic demand inflation (testing the dilated grid instead
        # would be a strict superset but grows every occupied run by ~1 cell
        # per side, inflating field-eval volume far beyond the gather
        # savings).
        s = occ_test_stride
        n_probe = -(-fine_per_coarse // s)
        kp = jnp.arange(n_probe, dtype=rays_o.dtype)
        t_p = t_seg0[..., None] + dt * (s * kp[None, None, :] + 0.5 * (s - 1))
        pts_p = rays_o[:, None, None, :] + rays_d[:, None, None, :] * t_p[..., None]
        pts_p = jnp.clip(pts_p, -bound, bound)
        occ_p = occ_lookup(occ, pts_p, jnp.full_like(t_p, dt),
                           bricks=occ_bricks)
        occ_f = jnp.repeat(occ_p, s, axis=-1)[..., :fine_per_coarse]
    else:
        pts_f = rays_o[:, None, None, :] + rays_d[:, None, None, :] * t_f[..., None]
        pts_f = jnp.clip(pts_f, -bound, bound)
        occ_f = occ_lookup(occ, pts_f, jnp.full_like(t_f, dt),
                           bricks=occ_bricks)
    valid_f = occ_f & seg_mask[..., None] & (t_f < fars[:, None, None])
    valid_f = valid_f.reshape(N, coarse_budget * fine_per_coarse)
    t_f = t_f.reshape(N, coarse_budget * fine_per_coarse)

    # ---- final compaction to the sample budget (evenly spread when over);
    # t rides the selection sort as a payload: one fused row-take instead of
    # a select-idx take followed by a t gather
    _, mask, fine_stride, t = first_k_valid(
        valid_f, budget, spread=True, payload=t_f
    )
    t = jnp.where(mask, t, 0.0)
    # each kept sample stands in for stride-many occupied steps of optical depth
    stride = seg_stride * fine_stride
    return t, jnp.asarray(dt, rays_o.dtype), mask, stride, seg_lastocc


def compact_per_ray(march: MarchResults, budget: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray compaction: indices of each ray's first ``budget`` valid
    candidates, as a dense (N, B) layout.

    This is the TPU-friendliest equivalent of the CUDA per-ray sample list:
    fixed stride per ray, so downstream compositing is a plain masked cumprod
    along axis 1 — no segment bookkeeping, no scatters, no global cumsum.
    Returns (k_idx (N, B) int32, mask (N, B) bool, stride (N,) float32).
    """
    return first_k_valid(march.valid, budget, spread=True)


# ---------------------------------------------------------------------------
# Compositing
# ---------------------------------------------------------------------------

def composite_compact(
    sigmas: jnp.ndarray,     # (M,)
    rgbs: jnp.ndarray,       # (M, 3)
    samples: CompactSamples,
    num_rays: int,
    T_thresh: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Alpha-composite compacted samples back into per-ray outputs.

    Forward math identical to kernel_composite_rays_train_forward
    (raymarching.cu:534-567): w_i = alpha_i * T_i with sequential early exit at
    T < T_thresh; implemented with segmented prefix sums so XLA autodiff yields
    the reference's analytic backward.

    Returns (weights_sum (N,), depth (N,), image (N, 3)).
    """
    M = sigmas.shape[0]
    sd = (sigmas * samples.dts).astype(jnp.float32)
    c = jnp.cumsum(sd)
    ce = c - sd  # exclusive cumsum
    rid = jnp.minimum(samples.ray_id, num_rays)  # padding -> segment num_rays
    base = jnp.take(ce, jnp.clip(samples.offsets, 0, M - 1), axis=0)
    base = jnp.where(samples.counts > 0, base, 0.0)
    seg_excl = ce - jnp.take(jnp.concatenate([base, jnp.zeros((1,), base.dtype)]), rid)
    T_before = jnp.exp(-seg_excl)
    alive = T_before >= T_thresh
    alpha = 1.0 - jnp.exp(-sd)
    w = jnp.where(alive & (samples.ray_id < num_rays), alpha * T_before, 0.0)

    # Segment sums as cumsum + boundary gathers: segments are contiguous and
    # sorted after compaction, so sum(seg n) = cumsum[end_n] - cumsum[start_n].
    # (jax.ops.segment_sum lowers to a scatter-add, which serializes on TPU.)
    end = samples.offsets + samples.counts

    def seg(x):
        cs = jnp.cumsum(x, axis=0)
        zero = jnp.zeros((1,) + x.shape[1:], cs.dtype)
        cs = jnp.concatenate([zero, cs], axis=0)
        return jnp.take(cs, end, axis=0) - jnp.take(cs, samples.offsets, axis=0)

    weights_sum = seg(w)
    depth = seg(w * samples.ts)
    image = seg(w[:, None] * rgbs)
    # z-variance (reference nerfacc_utils z_variance output): E[z^2] - E[z]^2
    # under the per-ray weight distribution, as one more segment sum
    z2 = seg(w * samples.ts * samples.ts)
    mean_z = depth / jnp.maximum(weights_sum, 1e-8)
    z_var = jnp.maximum(z2 / jnp.maximum(weights_sum, 1e-8) - mean_z**2, 0.0)
    return weights_sum, depth, image, z_var


def composite_dense(
    sigmas: jnp.ndarray,   # (N, T)
    rgbs: jnp.ndarray,     # (N, T, 3)
    deltas: jnp.ndarray,   # (N, T)
    ts: jnp.ndarray,       # (N, T) depth coordinate to accumulate
    mask: Optional[jnp.ndarray] = None,  # (N, T) bool
    t_thresh: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense [N, T] exclusive-cumprod compositing (the reference's pure-tensor
    path, renderer.py:206-230; with ``t_thresh`` also the per-ray layout of
    the CUDA training compositor's early exit, raymarching.cu:557).
    Returns (weights_sum, depth, image)."""
    sd = sigmas * deltas
    if mask is not None:
        sd = jnp.where(mask, sd, 0.0)
    alphas = 1.0 - jnp.exp(-sd)
    # T_i = prod_{j<i} (1 - alpha_j + 1e-15)
    trans = jnp.cumprod(1.0 - alphas + 1e-15, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    weights = alphas * trans
    if t_thresh > 0.0:
        weights = jnp.where(trans >= t_thresh, weights, 0.0)
    weights_sum = weights.sum(-1)
    depth = (weights * ts).sum(-1)
    image = (weights[..., None] * rgbs).sum(-2)
    return weights_sum, depth, image, weights


# ---------------------------------------------------------------------------
# Importance sampling (reference renderer.py:12-46)
# ---------------------------------------------------------------------------

def sample_pdf(bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int, u: jnp.ndarray) -> jnp.ndarray:
    """Inverse-CDF sampling of new depths from bin weights.

    bins: (B, T); weights: (B, T-1); u: (B, n_samples) uniforms in [0, 1)
    (pass a deterministic linspace for det mode). Returns (B, n_samples).
    """
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # (B, T)

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)
    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g0 = jnp.take_along_axis(bins, below, axis=-1)
    bins_g1 = jnp.take_along_axis(bins, above, axis=-1)
    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)
