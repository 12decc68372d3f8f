"""Density activation: exp with clamped gradient.

Mirrors the reference ``trunc_exp`` (reconstruction/activation.py:5-18): the
forward is a plain exp; the backward uses exp(clamp(x, -15, 15)) so fp16/bf16
training cannot blow up through the density head. Forward math is done in
float32 regardless of input dtype (the reference forces fp32 via
``custom_fwd(cast_inputs=torch.float32)``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["trunc_exp"]


@jax.custom_vjp
def trunc_exp(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(x.astype(jnp.float32))


def _fwd(x):
    x32 = x.astype(jnp.float32)
    # zero-size marker carries the primal dtype so the cotangent matches it
    return jnp.exp(x32), (x32, jnp.zeros((0,), x.dtype))


def _bwd(res, g):
    x32, marker = res
    return ((g * jnp.exp(jnp.clip(x32, -15.0, 15.0))).astype(marker.dtype),)


trunc_exp.defvjp(_fwd, _bwd)
