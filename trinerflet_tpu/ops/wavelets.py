"""2D discrete wavelet transforms (DWT/IDWT) for the wavelet-triplane encoder.

TPU-native reimplementation of the biorthogonal wavelet machinery the reference
uses through ``pytorch_wavelets`` (see reference
``reconstruction/triplaneencoder/triplane_encoder.py:167-204,364-405``): the
encoder stores a low-resolution base plane plus per-level detail coefficients
and reconstructs full-resolution triplanes by repeated single-level inverse
DWTs, with a wavelet-dependent pad so each inverse level exactly doubles the
spatial resolution (``pad_dict`` at ``triplane_encoder.py:174-180``).

Everything here is pure JAX: the transforms lower to (separable, depthwise)
``lax.conv_general_dilated`` calls which XLA maps onto the TPU convolution
units; no dynamic shapes anywhere.

Filter banks
------------
The filter coefficients are *derived* at import time (float64) instead of being
hard-coded:

* ``haar`` and the spline family (``bior2.2``, ``bior2.6``) come from the CDF
  B-spline construction.
* ``bior4.4`` and ``bior6.8`` come from factoring the order-``p`` Daubechies
  half-band polynomial and assigning one conjugate root pair to the synthesis
  filter (this reproduces, to 12+ significant digits, the classic CDF 9/7
  coefficients for ``bior4.4`` and the standard 17/11 table for ``bior6.8``).

Perfect reconstruction of every generated bank is asserted in the test-suite
(``tests/test_wavelets.py``).
"""

from __future__ import annotations

import functools
from math import comb, sqrt, floor
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "filter_bank",
    "idwt_pad",
    "dwt2d",
    "idwt2d",
    "dwt_output_size",
    "idwt_output_size",
    "wavelet_pyramid_shapes",
    "SUPPORTED_WAVELETS",
]

SUPPORTED_WAVELETS = ("haar", "bior2.2", "bior2.6", "bior4.4", "bior6.8")

# Extra spatial pad applied before each inverse level so one IDWT maps an
# R x R input to exactly 2R x 2R (reference pad_dict, triplane_encoder.py:174).
# For a length-L (even) filter: out = 2*(R + 2*pad) - L + 2 == 2R  <=>  pad = (L - 2) / 4.
_IDWT_PAD = {"bior6.8": 4, "bior2.6": 3, "bior4.4": 2, "bior2.2": 1, "haar": 0}


# ---------------------------------------------------------------------------
# Filter construction (numpy, float64, import-time)
# ---------------------------------------------------------------------------

def _y_poly_to_z(p_y: np.ndarray) -> np.ndarray:
    """Convert a polynomial in y = sin^2(w/2) = (2 - z - 1/z)/4 into a
    symmetric Laurent polynomial in z, returned as a centered coefficient array."""
    y = np.array([-0.25, 0.5, -0.25], dtype=complex)
    out = np.array([p_y[0]], dtype=complex)
    acc = np.array([1.0 + 0j])
    for k in range(1, len(p_y)):
        acc = np.convolve(acc, y)
        term = p_y[k] * acc
        n = max(len(out), len(term))

        def _pad(a, n=n):
            d = (n - len(a)) // 2
            return np.pad(a, (d, d))

        out = _pad(out) + _pad(term)
    return out


def _poly_from_roots(roots: Sequence[complex]) -> np.ndarray:
    p = np.array([1.0 + 0j])
    for r in roots:
        p = np.convolve(p, np.array([-r, 1.0 + 0j]))
    return p


def _cos_window(n: int) -> np.ndarray:
    return np.array([comb(n, k) for k in range(n + 1)], dtype=float) / 2.0**n


def _spline_pair(n_syn: int, n_ana: int) -> Tuple[np.ndarray, np.ndarray]:
    """CDF B-spline biorthogonal pair: synthesis lowpass = binomial spline of
    order ``n_syn``; analysis lowpass from the complementary half-band poly."""
    rec_lo = _cos_window(n_syn) * sqrt(2.0)
    q = (n_syn + n_ana) // 2
    p_y = np.array([comb(q - 1 + k, k) for k in range(q)], dtype=float)
    qa = _y_poly_to_z(p_y.astype(complex))
    dec_lo = sqrt(2.0) * np.convolve(_cos_window(n_ana), qa.real)
    return dec_lo, rec_lo


def _factored_pair(p: int, n_syn: int, n_ana: int, syn_pair_idx: int) -> Tuple[np.ndarray, np.ndarray]:
    """Near-orthogonal biorthogonal pair (bior4.4 / bior6.8 style): factor the
    order-p half-band polynomial's roots between analysis and synthesis."""
    half_band = np.array([comb(p - 1 + k, k) for k in range(p)], dtype=float)
    roots = np.roots(half_band[::-1])
    real = sorted((r for r in roots if abs(r.imag) < 1e-9), key=lambda r: r.real)
    pairs: List[Tuple[complex, complex]] = []
    used = set()
    croots = [r for r in roots if abs(r.imag) >= 1e-9]
    for i, r in enumerate(croots):
        if i in used:
            continue
        for j in range(i + 1, len(croots)):
            if j not in used and abs(croots[j] - np.conj(r)) < 1e-8:
                pairs.append((r, croots[j]))
                used.add(i)
                used.add(j)
                break
    if real:  # bior4.4: single real root goes to synthesis
        syn_roots = [real[0]]
    else:  # bior6.8: one conjugate pair goes to synthesis
        pairs.sort(key=lambda pr: pr[0].real)
        syn_roots = list(pairs[syn_pair_idx])
    ana_roots = [r for r in roots if not any(abs(r - s) < 1e-9 for s in syn_roots)]
    qs = _y_poly_to_z(_poly_from_roots(syn_roots))
    qa = _y_poly_to_z(_poly_from_roots(ana_roots))
    rec_lo = np.convolve(_cos_window(n_syn), qs.real)
    dec_lo = np.convolve(_cos_window(n_ana), qa.real)
    rec_lo = rec_lo / rec_lo.sum() * sqrt(2.0)
    dec_lo = dec_lo / dec_lo.sum() * sqrt(2.0)
    return dec_lo, rec_lo


def _pad_to_common_even(dec_lo: np.ndarray, rec_lo: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Zero-pad both lowpass filters to a common even length, keeping their
    symmetry centers aligned (zeros split front/back; odd remainder in front)."""
    L = max(len(dec_lo), len(rec_lo))
    if L % 2:
        L += 1

    def _pad(f):
        extra = L - len(f)
        front = (extra + 1) // 2
        return np.pad(f, (front, extra - front))

    return _pad(dec_lo), _pad(rec_lo)


def _shift(f: np.ndarray, s: int) -> np.ndarray:
    """Shift right by ``s`` (negative = left) with zero fill; same length.
    Asserts no nonzero tap falls off the edge."""
    out = np.zeros_like(f)
    if s >= 0:
        out[s:] = f[: len(f) - s]
    elif s < 0:
        out[:s] = f[-s:]
    assert abs(np.abs(out).sum() - np.abs(f).sum()) < 1e-12, "filter shift dropped taps"
    return out


@functools.lru_cache(maxsize=None)
def filter_bank(name: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Return ``(dec_lo, dec_hi, rec_lo, rec_hi)`` as float64 arrays of one
    common even length L.

    Conventions (self-consistent; PR verified by an import-time 1D self-check
    and the round-trip tests):
      * analysis = zero-pad, true convolution with the dec filters, stride-2
        downsample at phase 0,
      * synthesis = stride-2 transposed convolution with the rec filters,
      * the high-pass channel needs an odd delay relative to the low-pass one;
        when the natural (unpadded) dec_lo length is odd (all bior wavelets)
        this is realised by a one-tap intra-array shift of the high-pass
        filters plus an asymmetric synthesis crop (see ``synthesis_pads``):
          dec_hi[n] = (-1)^n rec_lo[n-1],  rec_hi[n] = (-1)^n dec_lo[n+1]
        for even natural length (haar) no shift is needed:
          dec_hi[n] = (-1)^n rec_lo[n],    rec_hi[n] = -(-1)^n dec_lo[n]
    """
    if name not in SUPPORTED_WAVELETS:
        raise ValueError(f"unsupported wavelet {name!r}; options: {SUPPORTED_WAVELETS}")
    if name == "haar":
        dec_lo = rec_lo = np.array([1.0, 1.0]) / sqrt(2.0)
    elif name == "bior2.2":
        dec_lo, rec_lo = _spline_pair(2, 2)
    elif name == "bior2.6":
        dec_lo, rec_lo = _spline_pair(2, 6)
    elif name == "bior4.4":
        dec_lo, rec_lo = _factored_pair(4, 4, 4, 0)
    elif name == "bior6.8":
        dec_lo, rec_lo = _factored_pair(7, 6, 8, 1)
    odd_support = len(dec_lo) % 2 == 1
    dec_lo, rec_lo = _pad_to_common_even(dec_lo, rec_lo)
    L = len(dec_lo)
    signs = (-1.0) ** np.arange(L)
    if odd_support:
        dec_hi = signs * _shift(rec_lo, 1)
        rec_hi = signs * _shift(dec_lo, -1)
    else:
        dec_hi = signs * rec_lo
        rec_hi = -signs * dec_lo
    _verify_pr(dec_lo, dec_hi, rec_lo, rec_hi, synthesis_pads(name))
    return dec_lo, dec_hi, rec_lo, rec_hi


@functools.lru_cache(maxsize=None)
def synthesis_pads(name: str) -> Tuple[int, int]:
    """(left, right) padding of the lhs-dilated synthesis convolution; sums to
    2 so that out = 2N - L + 2. Asymmetric for the shifted (bior) convention."""
    if name == "haar":
        return (1, 1)
    return (0, 2)


def _verify_pr(dec_lo, dec_hi, rec_lo, rec_hi, pads) -> None:
    """1D numpy perfect-reconstruction self-check of the full pipeline."""
    L = len(dec_lo)
    rng = np.random.default_rng(0)
    N = 16 * L
    x = np.zeros(N)
    x[3 * L : N - 3 * L] = rng.standard_normal(N - 6 * L)

    def _ana(f):
        outsize = floor((N + L - 1) / 2)
        p_total = 2 * outsize - N + L - 2
        xp = np.pad(x, (p_total // 2, p_total - p_total // 2))
        return np.convolve(xp, f, mode="valid")[::2]

    lo, hi = _ana(dec_lo), _ana(dec_hi)

    def _up(a):
        u = np.zeros(2 * len(a) - 1)
        u[::2] = a
        return u

    y = np.convolve(_up(lo), rec_lo) + np.convolve(_up(hi), rec_hi)
    a = (L - 2) + (1 - pads[0])  # front crop implied by synthesis padding
    y = y[a : a + 2 * len(lo) - L + 2]
    m = min(len(y), N)
    yc = y[(len(y) - m) // 2 :][:m]
    xc = x[(N - m) // 2 :][:m]
    err = np.abs(yc[3 * L : m - 3 * L] - xc[3 * L : m - 3 * L]).max()
    assert err < 1e-8, f"filter bank failed perfect reconstruction (err={err})"


def idwt_pad(name: str) -> int:
    """Per-side pad that makes one inverse level exactly double resolution."""
    pad = (len(filter_bank(name)[0]) - 2) // 4
    assert pad == _IDWT_PAD[name]
    return pad


# ---------------------------------------------------------------------------
# Size arithmetic
# ---------------------------------------------------------------------------

def dwt_output_size(n: int, name: str) -> int:
    L = len(filter_bank(name)[0])
    return floor((n + L - 1) / 2)


def idwt_output_size(n: int, name: str) -> int:
    L = len(filter_bank(name)[0])
    return 2 * n - L + 2


def wavelet_pyramid_shapes(
    resolution: int,
    levels: int,
    name: str,
    base_resolution_gate: int = 0,
) -> Tuple[int, List[int]]:
    """Shape arithmetic of the reference's "dummy forward DWT" init
    (triplane_encoder.py:188-206): starting from ``resolution``, apply
    ``levels`` forward DWTs; after each, crop ``pad`` per side whenever the
    lowpass is still larger than ``base_resolution_gate``.

    Returns ``(base_resolution, yh_sizes)`` where ``yh_sizes`` is ordered
    coarsest-first (the order the inverse pyramid consumes them).
    """
    pad = idwt_pad(name)
    sizes = []
    n = resolution
    for _ in range(levels):
        n_out = dwt_output_size(n, name)
        if pad > 0 and n_out > base_resolution_gate:
            n_out -= 2 * pad
        sizes.append(n_out)
        n = n_out
    return n, sizes[::-1]


# ---------------------------------------------------------------------------
# Transforms (separable depthwise convolutions)
# ---------------------------------------------------------------------------

def _depthwise_kernel(filt: jnp.ndarray, channels: int, axis: int) -> jnp.ndarray:
    """Kernel of shape (C, 1, kh, kw) replicating ``filt`` per channel."""
    L = filt.shape[0]
    if axis == 0:  # filter along H
        k = filt.reshape(1, 1, L, 1)
    else:  # filter along W
        k = filt.reshape(1, 1, 1, L)
    return jnp.broadcast_to(k, (channels,) + k.shape[1:])


def _single_channel(conv_fn):
    """Run a (B, C, H, W) depthwise conv as (B*C, 1, H, W) with a
    single-channel kernel. XLA TPU lowers ``feature_group_count=C`` grouped
    convs with a pathological blocked layout (a 6 GB / 4x-padded intermediate
    at 2048^2x32ch, the base-light stage-3 OOM); folding channels into the
    batch gives the same math with a clean layout."""

    def run(x, k):
        B, C, H, W = x.shape
        y = conv_fn(x.reshape(B * C, 1, H, W), k[:1])
        return y.reshape(B, C, *y.shape[2:])

    return run


# ---------------------------------------------------------------------------
# Banded-matrix (MXU) backend
# ---------------------------------------------------------------------------
# Depthwise separable filters are a terrible fit for the TPU conv units
# (C=1 grouped convs leave the MXU idle: measured 417 ms fwd for the bench
# ladder vs ~10 ms of equivalent matmul FLOPs). Each 1-D analysis/synthesis
# pass IS a multiplication by a constant banded operator matrix, so we build
# those matrices once (numpy, compile-time constants) and run the transform
# as dense dot_generals on the MXU. >99% of the operator entries are zeros,
# but MXU peak is ~3 orders above the achieved conv throughput, so the
# wasted FLOPs win decisively (measured 8.9 ms fwd / 30 ms fwd+bwd for the
# same bench ladder in f32).

@functools.lru_cache(maxsize=None)
def _analysis_operator(n: int, name: str) -> Tuple[np.ndarray, np.ndarray]:
    """(A_lo, A_hi), each (n, n_out): analysis as ``out = x @ A``.

    Matches _analysis_1d exactly: zero-pad by ``front`` then correlate with
    the reversed dec filter at stride 2:
        out[j] = sum_i x[i] * f_rev[i + front - 2j] = sum_i x[i] * f[L-1-i-front+2j]
    """
    dec_lo, dec_hi, _, _ = filter_bank(name)
    L = len(dec_lo)
    n_out = floor((n + L - 1) / 2)
    p_total = 2 * n_out - n + L - 2
    front = p_total // 2

    def build(f):
        A = np.zeros((n, n_out), np.float64)
        j = np.arange(n_out)
        for t in range(L):
            i = 2 * j + t - front
            m = (i >= 0) & (i < n)
            A[i[m], j[m]] += f[L - 1 - t]
        return A

    return build(dec_lo), build(dec_hi)


@functools.lru_cache(maxsize=None)
def _synthesis_operator(n: int, name: str) -> Tuple[np.ndarray, np.ndarray]:
    """(S0, S1), each (n, n_out): synthesis as ``out = lo @ S0 + hi @ S1``.

    Matches _synthesis_1d exactly: stride-2 lhs dilation, pad (pl, pr),
    correlation with the reversed rec filter:
        out[j] = sum_i x[i] * g[L-1-2i-pl+j]
    """
    _, _, rec_lo, rec_hi = filter_bank(name)
    L = len(rec_lo)
    pl, pr = synthesis_pads(name)
    n_out = 2 * n - L + pl + pr

    def build(g):
        S = np.zeros((n, n_out), np.float64)
        i = np.arange(n)
        for t in range(L):
            j = 2 * i + pl - L + 1 + t
            m = (j >= 0) & (j < n_out)
            S[i[m], j[m]] += g[t]
        return S

    return build(rec_lo), build(rec_hi)


def _apply_operator(x: jnp.ndarray, A: np.ndarray, axis: int) -> jnp.ndarray:
    """Contract a (B, C, H, W) tensor with an (n, n_out) operator along H or W
    with f32 accumulation on the MXU (bf16 inputs stay bf16 on TPU; the CPU
    thunk runtime rejects bf16 dots, so the 8-device virtual-mesh/test path
    computes in f32 and rounds back per level — with the operator quantized
    to bf16 FIRST, so both backends multiply the same rounded coefficients).

    Backend note: the fallback keys off ``jax.default_backend()`` at trace
    time, which matches this repo's two execution modes (TPU process / the
    conftest-forced CPU mesh). A bf16 ladder explicitly device_put onto CPU
    from a TPU-default process would still trace a bf16 dot and be rejected
    by the CPU runtime — acceptable here; key off the in-scope mesh if that
    mixed mode ever becomes real."""
    dtype = x.dtype
    compute = dtype
    if dtype == jnp.bfloat16 and jax.default_backend() == "cpu":
        compute = jnp.float32
    # quantize the operator at the same point on every backend (bf16 planes
    # -> bf16 operator entries), then upcast to the compute dtype
    op = jnp.asarray(A, dtype).astype(compute)
    prec = (jax.lax.Precision.HIGHEST if compute == jnp.float32
            else jax.lax.Precision.DEFAULT)
    eq = "bchw,hk->bckw" if axis == 0 else "bchw,wk->bchk"
    out = jnp.einsum(eq, x.astype(compute), op, precision=prec,
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


# "matmul": banded operators on the MXU (fast path, any size);
# "conv": depthwise convs folded into the batch (kept for cross-checks)
BACKEND = "matmul"


def _analysis_1d(x: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray, axis: int, name: str = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-axis analysis: zero-pad, convolve (true convolution with the dec
    filters == correlation with their reversal), downsample by 2.

    x: (B, C, H, W); axis 0 => along H, axis 1 => along W.
    """
    if BACKEND == "matmul" and name is not None:
        A_lo, A_hi = _analysis_operator(x.shape[2 + axis], name)
        return _apply_operator(x, A_lo, axis), _apply_operator(x, A_hi, axis)
    B, C, H, W = x.shape
    L = lo.shape[0]
    n = x.shape[2 + axis]
    outsize = floor((n + L - 1) / 2)
    p_total = 2 * outsize - n + L - 2
    front = p_total // 2
    back = p_total - front
    pad = [(0, 0), (0, 0)]
    pad.insert(axis, (front, back))  # pad -> [(h), (w)] ordering below
    pads = [(0, 0), (0, 0), (0, 0), (0, 0)]
    pads[2 + axis] = (front, back)
    xp = jnp.pad(x, pads)
    strides = (2, 1) if axis == 0 else (1, 2)
    dtype = x.dtype
    lo_r = jnp.asarray(lo[::-1], dtype)
    hi_r = jnp.asarray(hi[::-1], dtype)
    klo = _depthwise_kernel(lo_r, C, axis)
    khi = _depthwise_kernel(hi_r, C, axis)
    dn = jax.lax.conv_dimension_numbers(xp.shape, klo.shape, ("NCHW", "OIHW", "NCHW"))
    conv = _single_channel(functools.partial(
        jax.lax.conv_general_dilated,
        window_strides=strides,
        padding="VALID",
        dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST,
    ))
    return conv(xp, klo), conv(xp, khi)


def _synthesis_1d(lo: jnp.ndarray, hi: jnp.ndarray, g0: jnp.ndarray, g1: jnp.ndarray, axis: int, name: str) -> jnp.ndarray:
    """Single-axis synthesis: transposed convolution with stride 2 and torch
    ``conv_transpose`` padding of (L - 2): out = 2*N - L + 2.

    Implemented as an lhs-dilated convolution; the kernel is *not* flipped
    relative to the correlation the dilated conv computes, which matches
    transposed-convolution semantics for the analysis correlation above.
    """
    if BACKEND == "matmul":
        S0, S1 = _synthesis_operator(lo.shape[2 + axis], name)
        return _apply_operator(lo, S0, axis) + _apply_operator(hi, S1, axis)
    B, C = lo.shape[:2]
    L = g0.shape[0]
    dtype = lo.dtype
    pl, pr = synthesis_pads(name)
    lhs_dil = (2, 1) if axis == 0 else (1, 2)
    pads = [(pl, pr), (0, 0)] if axis == 0 else [(0, 0), (pl, pr)]
    g0_f = jnp.asarray(g0[::-1], dtype)
    g1_f = jnp.asarray(g1[::-1], dtype)
    k0 = _depthwise_kernel(g0_f, C, axis)
    k1 = _depthwise_kernel(g1_f, C, axis)
    dn = jax.lax.conv_dimension_numbers(lo.shape, k0.shape, ("NCHW", "OIHW", "NCHW"))
    conv = _single_channel(functools.partial(
        jax.lax.conv_general_dilated,
        window_strides=(1, 1),
        padding=pads,
        lhs_dilation=lhs_dil,
        dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST,
    ))
    return conv(lo, k0) + conv(hi, k1)


def dwt2d(x: jnp.ndarray, name: str = "bior6.8") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-level 2D analysis with zero padding.

    Args:
      x: (B, C, H, W)
    Returns:
      yl: (B, C, H', W') lowpass; yh: (B, C, 3, H', W') detail bands ordered
      (LH, HL, HH) = (high along H, high along W, high along both).
    """
    dec_lo, dec_hi, _, _ = filter_bank(name)
    lo_h, hi_h = _analysis_1d(x, dec_lo, dec_hi, axis=0, name=name)
    ll, lh = _analysis_1d(lo_h, dec_lo, dec_hi, axis=1, name=name)
    hl, hh = _analysis_1d(hi_h, dec_lo, dec_hi, axis=1, name=name)
    yh = jnp.stack([hl, lh, hh], axis=2)  # band 0: high-H, band 1: high-W
    return ll, yh


def idwt2d(yl: jnp.ndarray, yh: jnp.ndarray, name: str = "bior6.8") -> jnp.ndarray:
    """Single-level 2D synthesis; inverse of :func:`dwt2d` (exact perfect
    reconstruction away from the zero-padded borders).

    Args:
      yl: (B, C, H, W); yh: (B, C, 3, H, W)
    Returns:
      (B, C, 2H - L + 2, 2W - L + 2)
    """
    _, _, rec_lo, rec_hi = filter_bank(name)
    # Lowpass/detail sizes can disagree by one: a forward DWT of an ODD-sized
    # input yields floor((n+L-1)/2) and the inverse then reconstructs n+1, so
    # the next ladder level sees a lowpass one larger than its stored detail
    # bands. pytorch_wavelets' DWTInverse silently crops the trailing lowpass
    # row/col in exactly this case, and the reference leans on that behaviour
    # (triplane_encoder.py:186 builds the inverse with mode='zero' and feeds
    # pad-gated yl/yh straight in); replicate it here for both backends.
    if yl.shape[-2] > yh.shape[-2]:
        yl = yl[..., :-1, :]
    if yl.shape[-1] > yh.shape[-1]:
        yl = yl[..., :-1]
    if yl.shape[-2:] != yh.shape[-2:]:
        raise ValueError(
            f"idwt2d: lowpass {yl.shape[-2:]} and detail {yh.shape[-2:]} "
            "spatial sizes differ by more than one — the wavelet pyramid "
            "arithmetic (wavelet_pyramid_shapes) and the coefficients passed "
            "in are inconsistent (check wavelet_base_resolution gating)")
    hl, lh, hh = yh[:, :, 0], yh[:, :, 1], yh[:, :, 2]
    lo = _synthesis_1d(yl, lh, rec_lo, rec_hi, 1, name)
    hi = _synthesis_1d(hl, hh, rec_lo, rec_hi, 1, name)
    return _synthesis_1d(lo, hi, rec_lo, rec_hi, 0, name)
