"""Loss library.

Parity with the reference loss zoo:
* ``mape_loss`` / ``huber_loss`` (reconstruction/loss.py:7-26),
* O(N) distortion loss (loss.py:30-76 EffDistLoss — the reference implements
  a custom autograd op; JAX autodiff of the same O(N) forward suffices),
* ``z_variance`` regularizer support lives in the renderer (weighted depth
  variance per ray, reference nerfacc_utils.py:40-183 extension).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["mape_loss", "huber_loss", "eff_distortion_loss"]


def mape_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute percentage error (loss.py:7-14)."""
    d = pred - target
    return (jnp.abs(d) / (jnp.abs(target) + 1e-2)).mean()


def huber_loss(pred: jnp.ndarray, target: jnp.ndarray, delta: float = 0.1) -> jnp.ndarray:
    d = jnp.abs(pred - target)
    q = jnp.minimum(d, delta)
    return (0.5 * q * q + delta * (d - q)).mean()


def eff_distortion_loss(weights: jnp.ndarray, mids: jnp.ndarray, intervals: jnp.ndarray) -> jnp.ndarray:
    """O(N) mip-NeRF-360 distortion loss over per-ray sample weights.

    weights/mids/intervals: (N, T). Uses the prefix-sum identity
    sum_{i,j} w_i w_j |m_i - m_j| = 2 * sum_i w_i (m_i * W_{<i} - S_{<i})
    with W = cumsum(w), S = cumsum(w*m) (same O(N) trick as EffDistLoss).
    """
    w = weights
    wm = w * mids
    cw = jnp.cumsum(w, axis=-1) - w
    cwm = jnp.cumsum(wm, axis=-1) - wm
    cross = 2.0 * (wm * cw - w * cwm).sum(-1)
    intra = (w * w * intervals).sum(-1) / 3.0
    return (cross + intra).mean()
