"""Isolate the wavelet-conv layout cost: time the IDWT plane build (fwd and
fwd+bwd) at bench scale with (a) the channels-folded single-channel layout
(commit e2a42d2, current) and (b) the original feature_group_count=C grouped
layout, plus the full bench-scale triplane build via models.triplane.

Run on TPU: cd /root/repo && nohup python -u -m scripts.bench_idwt_layout > /tmp/idwt_layout.log 2>&1 &
"""
import functools
import time

import jax
import jax.numpy as jnp

from trinerflet_tpu.ops import wavelets as wv


def grouped_conv_restore():
    """Return analysis/synthesis variants using feature_group_count (pre-e2a42d2)."""

    def _analysis_1d_grouped(x, lo, hi, axis):
        from math import floor
        B, C, H, W = x.shape
        L = lo.shape[0]
        n = x.shape[2 + axis]
        outsize = floor((n + L - 1) / 2)
        p_total = 2 * outsize - n + L - 2
        front = p_total // 2
        back = p_total - front
        pads = [(0, 0), (0, 0), (0, 0), (0, 0)]
        pads[2 + axis] = (front, back)
        xp = jnp.pad(x, pads)
        strides = (2, 1) if axis == 0 else (1, 2)
        dtype = x.dtype
        lo_r = jnp.asarray(lo[::-1], dtype)
        hi_r = jnp.asarray(hi[::-1], dtype)
        klo = wv._depthwise_kernel(lo_r, C, axis)
        khi = wv._depthwise_kernel(hi_r, C, axis)
        dn = jax.lax.conv_dimension_numbers(xp.shape, klo.shape, ("NCHW", "OIHW", "NCHW"))
        conv = functools.partial(
            jax.lax.conv_general_dilated,
            window_strides=strides, padding="VALID", dimension_numbers=dn,
            feature_group_count=C, precision=jax.lax.Precision.HIGHEST,
        )
        return conv(xp, klo), conv(xp, khi)

    def _synthesis_1d_grouped(lo, hi, g0, g1, axis, name):
        B, C = lo.shape[:2]
        dtype = lo.dtype
        pl, pr = wv.synthesis_pads(name)
        lhs_dil = (2, 1) if axis == 0 else (1, 2)
        pads = [(pl, pr), (0, 0)] if axis == 0 else [(0, 0), (pl, pr)]
        g0_f = jnp.asarray(g0[::-1], dtype)
        g1_f = jnp.asarray(g1[::-1], dtype)
        k0 = wv._depthwise_kernel(g0_f, C, axis)
        k1 = wv._depthwise_kernel(g1_f, C, axis)
        dn = jax.lax.conv_dimension_numbers(lo.shape, k0.shape, ("NCHW", "OIHW", "NCHW"))
        conv = functools.partial(
            jax.lax.conv_general_dilated,
            window_strides=(1, 1), padding=pads, lhs_dilation=lhs_dil,
            dimension_numbers=dn, feature_group_count=C,
            precision=jax.lax.Precision.HIGHEST,
        )
        return conv(lo, k0) + conv(hi, k1)

    return _analysis_1d_grouped, _synthesis_1d_grouped


def _force(out):
    """Device->host copy of a scalar reduction (the only reliable sync here)."""
    leaves = jax.tree_util.tree_leaves(out)
    total = sum(jnp.sum(x).astype(jnp.float32) for x in leaves)
    return float(total)


def time_fn(f, *args, reps=10):
    _force(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _force(out)
    return (time.perf_counter() - t0) / reps * 1e3


def build_ladder(name, levels, base, yh_list):
    """IDWT ladder exactly as triplane build_planes: yl = 2*x, pad, idwt."""
    pad = wv.idwt_pad(name)
    x = base
    for yh in yh_list:
        yl = 2.0 * x
        if pad > 0:
            yl = jnp.pad(yl, [(0, 0), (0, 0), (pad, pad), (pad, pad)])
            yh = jnp.pad(yh, [(0, 0), (0, 0), (0, 0), (pad, pad), (pad, pad)])
        x = wv.idwt2d(yl, yh, name)
    return x


def main():
    print("devices:", jax.devices(), flush=True)
    name = "bior6.8"
    C = 16
    resolution, levels_scale = 1024, 16  # bench config: scale 16 -> 4 levels
    import math
    nlev = int(math.log2(levels_scale))
    base_res, yh_sizes = wv.wavelet_pyramid_shapes(resolution, nlev, name)
    print("base", base_res, "yh", yh_sizes, flush=True)
    key = jax.random.PRNGKey(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        base = jax.random.normal(key, (3, C, base_res, base_res), dtype)
        yhs = [jax.random.normal(jax.random.PRNGKey(i + 1), (3, C, 3, s, s), dtype)
               for i, s in enumerate(yh_sizes)]

        def run_current(base, yhs):
            return build_ladder(name, nlev, base, yhs)

        def loss_current(base, yhs):
            return jnp.sum(jnp.square(build_ladder(name, nlev, base, yhs)).astype(jnp.float32))

        ref_out = None
        for backend in ("matmul", "conv_folded", "conv_grouped"):
            if backend == "conv_grouped":
                ana, syn = grouped_conv_restore()
                orig = (wv._analysis_1d, wv._synthesis_1d)
                wv._analysis_1d, wv._synthesis_1d = ana, syn
                wv.BACKEND = "conv"
            else:
                wv.BACKEND = "matmul" if backend == "matmul" else "conv"
            try:
                fwd = jax.jit(run_current)
                bwd = jax.jit(jax.grad(loss_current, argnums=(0, 1)))
                t_f = time_fn(fwd, base, yhs)
                t_b = time_fn(bwd, base, yhs)
                out = fwd(base, yhs)
                if ref_out is None:
                    ref_out = out
                d = float(jnp.max(jnp.abs((out - ref_out).astype(jnp.float32))))
                print(f"{dtype.__name__:9s} {backend:13s} fwd {t_f:8.2f} ms  "
                      f"fwd+bwd {t_b:8.2f} ms  dev {d:.2e}", flush=True)
            finally:
                if backend == "conv_grouped":
                    wv._analysis_1d, wv._synthesis_1d = orig
        wv.BACKEND = "matmul"


if __name__ == "__main__":
    main()
