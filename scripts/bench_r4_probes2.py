"""Round-4 probe set for the next driver-bench / 2048-regime cuts.

  1. IDWT synthesis as TAP-SHIFT (polyphase pad+slice+fma, bandwidth-bound)
     vs the banded-operator matmul backend. The dense (n, ~2n) operator
     costs O(n^3 C) MXU FLOPs — fine at 512, ~8x worse at every doubling —
     while the true work is L taps of elementwise fma (O(n^2 C L) traffic).
  2. sortops reorder for the factored outer scatter: ride the (K+C) bf16
     payload columns through lax.sort instead of sort+row-take.
  3. Quad-forward row split: the (N, 4C=64ch) bf16 takes are 128 B rows
     (PERF.md collapse zone); try (2N, 32ch) and (4N, 16ch) splits.
  4. 2048^2/32ch corner backward: ONE factored outer scatter (N rows,
     K=4 x C=32) + dense quad-unpack vs the live scatter_add_rows on
     (4N, 32ch) f32 rows.
  5. gather locality probe (same-row / clustered / uniform).

Run: cd /root/repo && nohup python -u -m scripts.bench_r4_probes2 > /tmp/probes2.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from trinerflet_tpu.ops import wavelets as wv


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
    print(f"{label:58s}: {ms:9.2f} ms", flush=True)
    return ms


# ---------------------------------------------------------------------------
# 1. tap-shift synthesis
# ---------------------------------------------------------------------------

def synth_tap_1d(lo, hi, axis, name):
    """out = lo @ S0 + hi @ S1 via polyphase pad+slice+fma (no matmul)."""
    _, _, rec_lo, rec_hi = wv.filter_bank(name)
    L = len(rec_lo)
    pl, pr = wv.synthesis_pads(name)
    ax = lo.ndim - 2 + axis  # axis 0 -> H (dim -2), axis 1 -> W (dim -1)
    n = lo.shape[ax]
    n_out = 2 * n - L + pl + pr
    c = pl - L + 1
    PAD = L  # covers every shift
    dtype = lo.dtype

    def one(x, g):
        import ml_dtypes
        # quantize taps like _apply_operator quantizes the operator (numpy)
        gq = np.asarray(g, np.float64)
        if dtype == jnp.bfloat16:
            gq = gq.astype(ml_dtypes.bfloat16).astype(np.float64)
        elif dtype == jnp.float32:
            gq = gq.astype(np.float32).astype(np.float64)
        pads = [(0, 0)] * x.ndim
        pads[ax] = (PAD, PAD)
        xp = jnp.pad(x, pads)
        outs = []
        m = (n_out + 1) // 2
        for p in (0, 1):
            len_p = (n_out - p + 1) // 2
            acc = None
            for t in range(L):
                s = c + t
                if (s - p) % 2:
                    continue
                sh = (s - p) // 2  # out_p[k] += g[t] * x[k - sh]
                sl = jax.lax.slice_in_dim(xp, PAD - sh, PAD - sh + len_p, axis=ax)
                term = jnp.asarray(gq[t], dtype) * sl
                acc = term if acc is None else acc + term
            if len_p < m:  # pad to common length for interleave
                pads2 = [(0, 0)] * x.ndim
                pads2[ax] = (0, m - len_p)
                acc = jnp.pad(acc, pads2)
            outs.append(acc)
        inter = jnp.stack(outs, axis=ax + 1)  # (..., m, 2, ...)
        shape = list(lo.shape)
        shape[ax] = 2 * m
        inter = inter.reshape(shape)
        return jax.lax.slice_in_dim(inter, 0, n_out, axis=ax)

    return one(lo, rec_lo) + one(hi, rec_hi)


def idwt2d_tap(yl, yh, name="bior6.8"):
    if yl.shape[-2] > yh.shape[-2]:
        yl = yl[..., :-1, :]
    if yl.shape[-1] > yh.shape[-1]:
        yl = yl[..., :-1]
    lo_h = synth_tap_1d(yl, yh[:, :, 1], axis=1, name=name)   # W axis: ll+hl? see below
    hi_h = synth_tap_1d(yh[:, :, 0], yh[:, :, 2], axis=1, name=name)
    return synth_tap_1d(lo_h, hi_h, axis=0, name=name)


def idwt2d_ref(yl, yh, name="bior6.8"):
    return wv.idwt2d(yl, yh, name=name)


def probe_idwt():
    print("=== 1. IDWT tap-shift vs banded matmul ===", flush=True)
    rng = np.random.default_rng(0)
    name = "bior6.8"
    # correctness first, f32 small
    yl = jnp.asarray(rng.normal(size=(1, 4, 37, 41)).astype(np.float32))
    yh = jnp.asarray(rng.normal(size=(1, 4, 3, 37, 41)).astype(np.float32))
    a = wv.idwt2d(yl, yh, name=name)
    b = idwt2d_tap(yl, yh, name=name)
    err = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))
    print(f"correctness idwt tap vs matmul rel err: {err:.2e} "
          f"shapes {a.shape} {b.shape}", flush=True)

    for (C, n, dt) in ((16, 512, jnp.bfloat16), (32, 1024, jnp.bfloat16),
                       (16, 512, jnp.float32), (32, 1024, jnp.float32)):
        yl = jnp.asarray(rng.normal(size=(3, C, n, n)), dt)
        yh = jnp.asarray(rng.normal(size=(3, C, 3, n, n)), dt)
        fm = jax.jit(lambda a_, b_: wv.idwt2d(a_, b_, name=name))
        ft = jax.jit(lambda a_, b_: idwt2d_tap(a_, b_, name=name))
        timeit(f"matmul idwt ({n}->{2*n-2}) C={C} {dt.__name__} fwd", fm, yl, yh)
        timeit(f"tap    idwt ({n}->{2*n-2}) C={C} {dt.__name__} fwd", ft, yl, yh)
        gm = jax.jit(jax.grad(lambda a_, b_: jnp.sum(
            wv.idwt2d(a_, b_, name=name).astype(jnp.float32) ** 2), argnums=(0, 1)))
        gt = jax.jit(jax.grad(lambda a_, b_: jnp.sum(
            idwt2d_tap(a_, b_, name=name).astype(jnp.float32) ** 2), argnums=(0, 1)))
        timeit(f"matmul idwt C={C} {dt.__name__} fwd+bwd", gm, yl, yh)
        timeit(f"tap    idwt C={C} {dt.__name__} fwd+bwd", gt, yl, yh)


# ---------------------------------------------------------------------------
# 2. sortops outer reorder
# ---------------------------------------------------------------------------

def probe_sortops():
    print("=== 2. sortops vs sort+take reorder (outer scatter shape) ===", flush=True)
    N, K, C = 655360, 4, 16
    rng = np.random.default_rng(1)
    HW = 1024 * 1024
    idx = rng.integers(int(0.3 * HW), int(0.65 * HW), N).astype(np.int32)
    idx[rng.random(N) > 0.55] = HW
    idx = jnp.asarray(idx)
    w = jnp.asarray(rng.random((N, K)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    iota = jnp.arange(N, dtype=jnp.int32)

    def take_reorder(i, wl, gl):
        packed = jnp.concatenate([wl.astype(jnp.bfloat16), gl.astype(jnp.bfloat16)], 1)
        sidx, order = jax.lax.sort((i, iota), num_keys=1)
        return sidx, jnp.take(packed, order, axis=0)

    def sortops_reorder(i, wl, gl):
        cols = ([wl[:, k].astype(jnp.bfloat16) for k in range(K)]
                + [gl[:, c].astype(jnp.bfloat16) for c in range(C)])
        out = jax.lax.sort((i,) + tuple(cols), num_keys=1)
        return out[0], jnp.stack(out[1:], axis=1)

    timeit("take reorder (sort keys + 40B row take)", jax.jit(take_reorder), idx, w, g)
    timeit("sortops reorder (21-operand lax.sort)", jax.jit(sortops_reorder), idx, w, g)
    # f32 operand variant (exact path)
    def sortops_f32(i, wl, gl):
        cols = ([wl[:, k] for k in range(K)] + [gl[:, c] for c in range(C)])
        out = jax.lax.sort((i,) + tuple(cols), num_keys=1)
        return out[0], jnp.stack(out[1:], axis=1)
    timeit("sortops reorder f32 operands", jax.jit(sortops_f32), idx, w, g)


# ---------------------------------------------------------------------------
# 3. quad-forward row split
# ---------------------------------------------------------------------------

def probe_quadsplit():
    print("=== 3. quad fwd take: 128B rows vs 64B/32B splits ===", flush=True)
    N, C = 655360, 16
    HW = 1024 * 1024
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.normal(size=(HW, 4 * C)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(int(0.3 * HW), int(0.65 * HW), N, dtype=np.int64)
                      .astype(np.int32))

    t1 = table
    f1 = jax.jit(lambda i: jnp.take(t1, i, axis=0).astype(jnp.float32).sum())
    timeit("one take (N, 64ch bf16 = 128B)", f1, idx)

    t2 = table.reshape(HW * 2, 2 * C)
    def split2(i):
        i2 = jnp.stack([2 * i, 2 * i + 1], axis=1).reshape(-1)
        return jnp.take(t2, i2, axis=0).astype(jnp.float32).sum()
    timeit("split take (2N, 32ch bf16 = 64B)", jax.jit(split2), idx)

    def split2b(i):
        a = jnp.take(t2, 2 * i, axis=0)
        b = jnp.take(t2, 2 * i + 1, axis=0)
        return (a.astype(jnp.float32) + b.astype(jnp.float32)).sum()
    timeit("two takes (N each, 32ch bf16)", jax.jit(split2b), idx)

    t4 = table.reshape(HW * 4, C)
    def split4(i):
        i4 = (4 * i)[:, None] + jnp.arange(4, dtype=jnp.int32)[None, :]
        return jnp.take(t4, i4.reshape(-1), axis=0).astype(jnp.float32).sum()
    timeit("split take (4N, 16ch bf16 = 32B)", jax.jit(split4), idx)


# ---------------------------------------------------------------------------
# 4. 2048 corner backward: factored outer vs 4N-row scatter
# ---------------------------------------------------------------------------

def probe_2048_bwd():
    print("=== 4. 2048^2/32ch corner backward ===", flush=True)
    from trinerflet_tpu.ops.grid_sample import _quad_unpack_grad
    from trinerflet_tpu.ops.scatter import (blocked_scatter_add,
                                            blocked_scatter_add_outer)
    N, C, RES = 655360, 32, 2048
    HW = RES * RES
    rng = np.random.default_rng(3)
    idx = rng.integers(int(0.3 * HW), int(0.65 * HW), N).astype(np.int32)
    idx[rng.random(N) > 0.55] = HW
    idx = jnp.asarray(idx)
    w = jnp.asarray(rng.random((N, 4)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))

    fo = jax.jit(lambda i, wl, gl: _quad_unpack_grad(
        blocked_scatter_add_outer(i, wl, gl, HW, precision="default")
        .reshape(RES, RES, 4 * C)))
    timeit("outer K=4 C=32 + quad-unpack (N rows)", fo, idx, w, g)

    idx4 = np.repeat(np.asarray(idx), 4)
    live = idx4 < HW
    idx4[live] += rng.integers(0, 2, live.sum())
    idx4 = jnp.asarray(idx4.astype(np.int32))
    pay = jnp.asarray(rng.normal(size=(4 * N, C)).astype(np.float32))
    fr = jax.jit(lambda i, p: blocked_scatter_add(
        i, p, HW, precision="default", trip="dynamic"))
    timeit("scatter_add rows (4N, 32ch f32) [live path]", fr, idx4, pay)


# ---------------------------------------------------------------------------
# 5. gather locality
# ---------------------------------------------------------------------------

def probe_locality():
    print("=== 5. gather locality ===", flush=True)
    N, HW = 655360, 1024 * 1024
    rng = np.random.default_rng(4)
    table = jnp.asarray(rng.normal(size=(HW, 32)), jnp.bfloat16)
    gfn = jax.jit(lambda i: jnp.take(table, i, axis=0).astype(jnp.float32).sum())
    timeit("uniform-random idx", gfn,
           jnp.asarray(rng.integers(0, HW, N, dtype=np.int64).astype(np.int32)))
    timeit("ALL same row", gfn, jnp.zeros((N,), jnp.int32))
    timeit("2%-window clustered", gfn,
           jnp.asarray(rng.integers(int(0.49 * HW), int(0.51 * HW), N,
                                    dtype=np.int64).astype(np.int32)))
    timeit("sorted uniform idx", gfn,
           jnp.sort(jnp.asarray(rng.integers(0, HW, N, dtype=np.int64)
                                .astype(np.int32))))


if __name__ == "__main__":
    probe_idwt()
    probe_sortops()
    probe_quadsplit()
    probe_2048_bwd()
    probe_locality()
