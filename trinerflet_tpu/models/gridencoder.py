"""Multiresolution hash / tiled grid encoder (instant-ngp style).

TPU-native replacement of the reference CUDA extension ``aux_libs/gridencoder``
(src/gridencoder.cu:88-507 + grid.py): L levels with geometric resolution
growth, dense ("tiled") storage while the level fits, spatial hashing beyond
``2^log2_hashmap_size``, trilinear interpolation, optional smoothstep. The
reference uses this as the default position encoding for non-triplane runs and
as the background encoder (network.py:35,82).

Pure JAX: embeddings live in per-level tables (a dict pytree), lookups are
gathers and the backward is XLA's scatter-add — functional everywhere; see
PERF.md for the TPU gather cost profile.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["GridEncoderConfig", "init_grid_params", "grid_encode"]

_PRIMES = (1, 2654435761, 805459861)  # instant-ngp spatial hash primes


@dataclasses.dataclass(frozen=True)
class GridEncoderConfig:
    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    desired_resolution: int = 2048
    gridtype: str = "hash"        # "hash" | "tiled" (tiled never hashes -> dense modulo)
    interpolation: str = "linear"  # "linear" | "smoothstep"

    @property
    def per_level_scale(self) -> float:
        if self.num_levels == 1:
            return 1.0
        return math.exp(
            math.log(self.desired_resolution / self.base_resolution)
            / (self.num_levels - 1)
        )

    def level_resolution(self, level: int) -> int:
        return int(math.ceil(self.base_resolution * self.per_level_scale**level))

    def level_size(self, level: int) -> int:
        res = self.level_resolution(level) + 1
        dense = res**self.input_dim
        return min(dense, 2**self.log2_hashmap_size)

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim


def init_grid_params(rng: jax.Array, cfg: GridEncoderConfig, std: float = 1e-4) -> Dict:
    keys = jax.random.split(rng, cfg.num_levels)
    return {
        f"level_{l}": std * jax.random.uniform(
            keys[l], (cfg.level_size(l), cfg.level_dim), jnp.float32, -1.0, 1.0
        )
        for l in range(cfg.num_levels)
    }


def _index(coords: jnp.ndarray, res: int, size: int, cfg: GridEncoderConfig) -> jnp.ndarray:
    """Integer grid coords (..., D) -> table index, hashing iff the dense
    level would exceed the table (gridencoder.cu get_grid_index)."""
    D = cfg.input_dim
    dense = (res + 1) ** D
    if dense <= size or cfg.gridtype == "tiled":
        stride = jnp.asarray(
            [(res + 1) ** d for d in range(D)], jnp.uint32
        )
        idx = (coords.astype(jnp.uint32) * stride).sum(-1)
        return (idx % jnp.uint32(size)).astype(jnp.int32)
    h = jnp.zeros(coords.shape[:-1], jnp.uint32)
    for d in range(D):
        h = h ^ (coords[..., d].astype(jnp.uint32) * jnp.uint32(_PRIMES[d % 3]))
    return (h % jnp.uint32(size)).astype(jnp.int32)


@jax.custom_vjp
def _gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(table, idx, axis=0)


def _gather_rows_fwd(table, idx):
    return jnp.take(table, idx, axis=0), (idx, table.shape[0])


def _gather_rows_bwd(res, g):
    # table gradient via the sort+one-hot-matmul scatter (ops/scatter.py) —
    # XLA's native scatter-add serializes per row on TPU (PERF.md); this is
    # the CUDA atomicAdd counterpart (gridencoder.cu:249) reformulated as MXU
    # work. ~3.5x the XLA scatter at bench sizes.
    idx, n = res
    from ..ops.scatter import scatter_add_rows

    # bf16 cotangents: a 1-pass matmul (terms rounded to bf16) loses nothing
    prec = "default" if g.dtype == jnp.bfloat16 else "highest"
    return scatter_add_rows(idx, g.astype(jnp.float32), n, precision=prec), None


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def grid_encode(
    params: Dict, x: jnp.ndarray, cfg: GridEncoderConfig, bound: float = 1.0
) -> jnp.ndarray:
    """x: (N, D) in [-bound, bound] -> (N, L * C) multi-level interpolated
    features.

    All 2^D corner lookups of a level run as ONE row-gather (and their
    backward as ONE blocked scatter-add) instead of 2^D separate ops."""
    N, D = x.shape
    u = (x / bound + 1.0) * 0.5  # [0, 1]
    u = jnp.clip(u, 0.0, 1.0)
    outs = []
    corners = np.stack(
        np.meshgrid(*([np.array([0, 1])] * D), indexing="ij"), -1
    ).reshape(-1, D)  # (2^D, D)
    cc = jnp.asarray(corners, jnp.int32)  # (K, D)
    for l in range(cfg.num_levels):
        res = cfg.level_resolution(l)
        size = cfg.level_size(l)
        table = params[f"level_{l}"]
        pos = u * res
        p0 = jnp.floor(pos).astype(jnp.int32)
        frac = pos - p0
        if cfg.interpolation == "smoothstep":
            frac = frac * frac * (3.0 - 2.0 * frac)
        # (K, N) trilinear weights and table indices for every corner at once
        w = jnp.prod(
            jnp.where(cc[:, None, :] > 0, frac[None], 1.0 - frac[None]), axis=-1
        )
        idx = _index(jnp.clip(p0[None] + cc[:, None, :], 0, res), res, size, cfg)
        vals = _gather_rows(table, idx.reshape(-1)).reshape(
            len(corners), N, cfg.level_dim
        )
        outs.append((w[..., None] * vals).sum(0))
    return jnp.concatenate(outs, axis=-1)
