"""Direction / position encoders as pure, fusable jnp math.

TPU-native replacements for the reference CUDA extensions:
  * spherical harmonics (aux_libs/shencoder/src/shencoder.cu:28 — real SH,
    hard-coded polynomial expansion, degree <= 8, out dim = degree^2),
  * frequency encoding (aux_libs/freqencoder/src/freqencoder.cu:30 —
    [x, sin(2^k x), cos(2^k x)], out dim = D + 2*D*degree).

On TPU these fuse straight into the surrounding MLP matmuls; no kernels needed.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["sh_encode", "sh_dim", "freq_encode", "freq_dim"]


def sh_dim(degree: int) -> int:
    return degree**2


def freq_dim(input_dim: int, degree: int) -> int:
    return input_dim + 2 * input_dim * degree


def freq_encode(x: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """[x, sin(2^0 x), cos(2^0 x), ..., sin(2^{d-1} x), cos(2^{d-1} x)].

    x: (..., D) -> (..., D + 2*D*degree)
    """
    outs = [x]
    for k in range(degree):
        s = x * (2.0**k)
        outs.append(jnp.sin(s))
        outs.append(jnp.cos(s))
    return jnp.concatenate(outs, axis=-1)


def sh_encode_general(d: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Real spherical harmonics of arbitrary degree via the associated
    Legendre recurrence (differentiable, vectorized). Convention matches the
    closed-form table above: Condon–Shortley phase included, z as the polar
    axis, order (m = 0..-l..+l interleaved as [-l..+l])."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    L = degree
    # associated Legendre P_l^m(z) for unit-ish directions (|d| ~ 1), using
    # sin(theta)^m absorbed into the (x, y) azimuthal factors:
    # define A_m = Re[(x + iy)^m], B_m = Im[(x + iy)^m]
    A = [jnp.ones_like(x), x]
    B = [jnp.zeros_like(x), y]
    for m in range(2, L):
        A.append(x * A[m - 1] - y * B[m - 1])
        B.append(x * B[m - 1] + y * A[m - 1])
    # "semi-normalized" P~_l^m with sin^m factored out: P~_m^m recurrence
    import math as _m

    out = [None] * (L * L)

    def K(l, m):
        return _m.sqrt((2 * l + 1) / (4 * _m.pi) * _m.factorial(l - m) / _m.factorial(l + m))

    # P~ tables
    P = {}
    for m in range(0, L):
        if m == 0:
            pmm = jnp.ones_like(z)
        else:
            pmm = P[(m - 1, m - 1)] * (-(2 * m - 1))
        P[(m, m)] = pmm
        if m + 1 < L:
            P[(m + 1, m)] = z * (2 * m + 1) * pmm
        for l in range(m + 2, L):
            P[(l, m)] = ((2 * l - 1) * z * P[(l - 1, m)] - (l + m - 1) * P[(l - 2, m)]) / (l - m)

    sqrt2 = _m.sqrt(2.0)
    for l in range(L):
        out[l * l + l] = K(l, 0) * P[(l, 0)]
        for m in range(1, l + 1):
            base = sqrt2 * K(l, m) * P[(l, m)]
            out[l * l + l - m] = base * B[m]
            out[l * l + l + m] = base * A[m]
    return jnp.stack(out, axis=-1)


def sh_encode(d: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Real spherical harmonics of a (not necessarily unit) direction.

    Matches the instant-ngp / shencoder closed-form expansion up to degree 8.
    d: (..., 3) -> (..., degree^2)
    """
    if not 1 <= degree <= 8:
        raise ValueError(f"sh degree must be in [1, 8], got {degree}")
    if degree == 8:
        # closed forms above stop at l=6; use the recurrence path for parity
        # with shencoder's degree-8 support (shencoder.cu covers degree<=8)
        return sh_encode_general(d, degree)
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z
    x4, y4, z4 = x2 * x2, y2 * y2, z2 * z2
    x6, y6, z6 = x4 * x2, y4 * y2, z4 * z2  # noqa: F841 (used by higher degrees)

    out = [jnp.full_like(x, 0.28209479177387814)]
    if degree >= 2:
        out += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree >= 3:
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * x2 - 0.54627421529603959 * y2,
        ]
    if degree >= 4:
        out += [
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ]
    if degree >= 5:
        out += [
            2.5033429417967046 * xy * (x2 - y2),
            1.7701307697799304 * yz * (-3.0 * x2 + y2),
            0.94617469575756008 * xy * (7.0 * z2 - 1.0),
            0.66904654355728921 * yz * (3.0 - 7.0 * z2),
            -3.1735664074561294 * z2 + 3.7024941420321507 * z4 + 0.31735664074561293,
            0.66904654355728921 * xz * (3.0 - 7.0 * z2),
            0.47308734787878004 * (x2 - y2) * (7.0 * z2 - 1.0),
            1.7701307697799304 * xz * (-x2 + 3.0 * y2),
            -3.7550144126950569 * x2 * y2 + 0.62583573544917614 * x4 + 0.62583573544917614 * y4,
        ]
    if degree >= 6:
        out += [
            0.65638205684017015 * y * (10.0 * x2 * y2 - 5.0 * x4 - y4),
            8.3026492595241645 * xy * z * (x2 - y2),
            -0.48923829943525038 * y * (3.0 * x2 - y2) * (9.0 * z2 - 1.0),
            4.7935367849733241 * xy * z * (3.0 * z2 - 1.0),
            0.45294665119569694 * y * (14.0 * z2 - 21.0 * z4 - 1.0),
            0.1169503224534236 * z * (-70.0 * z2 + 63.0 * z4 + 15.0),
            0.45294665119569694 * x * (14.0 * z2 - 21.0 * z4 - 1.0),
            2.3967683924866621 * z * (x2 - y2) * (3.0 * z2 - 1.0),
            -0.48923829943525038 * x * (x2 - 3.0 * y2) * (9.0 * z2 - 1.0),
            2.0756623148810411 * z * (-6.0 * x2 * y2 + x4 + y4),
            0.65638205684017015 * x * (10.0 * x2 * y2 - x4 - 5.0 * y4),
        ]
    if degree >= 7:
        out += [
            1.3663682103838286 * xy * (-10.0 * x2 * y2 + 3.0 * x4 + 3.0 * y4),
            2.3666191622317521 * yz * (10.0 * x2 * y2 - 5.0 * x4 - y4),
            2.0182596029148963 * xy * (x2 - y2) * (11.0 * z2 - 1.0),
            -0.92120525951492349 * yz * (3.0 * x2 - y2) * (11.0 * z2 - 3.0),
            0.92120525951492349 * xy * (-18.0 * z2 + 33.0 * z4 + 1.0),
            0.58262136251873131 * yz * (30.0 * z2 - 33.0 * z4 - 5.0),
            6.6747662381009842 * z2 - 20.024298714302954 * z4 + 14.684485723822165 * z6 - 0.31784601133814211,
            0.58262136251873131 * xz * (30.0 * z2 - 33.0 * z4 - 5.0),
            0.46060262975746175 * (x2 - y2) * (11.0 * z2 * (3.0 * z2 - 1.0) - 7.0 * z2 + 1.0),
            -0.92120525951492349 * xz * (x2 - 3.0 * y2) * (11.0 * z2 - 3.0),
            0.50456490072872406 * (11.0 * z2 - 1.0) * (-6.0 * x2 * y2 + x4 + y4),
            2.3666191622317521 * xz * (10.0 * x2 * y2 - x4 - 5.0 * y4),
            10.247761577878714 * x2 * y4 - 10.247761577878714 * x4 * y2 + 0.6831841051919143 * x6 - 0.6831841051919143 * y6,
        ]
    return jnp.stack(out, axis=-1)
