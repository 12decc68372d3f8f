"""Morton (Z-order) codes and occupancy bit packing.

TPU note: the CUDA reference indexes its density bitfield by morton code purely
for GPU cache locality (aux_libs/raymarching/src/raymarching.cu:57-83,214-260).
On TPU the occupancy grid is a dense row-major array and gathers don't care, so
the renderer uses plain ``x*H^2 + y*H + z`` indices; these ops exist for API
parity, for tests, and for checkpoint interchange with morton-ordered grids.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["morton3d", "morton3d_invert", "packbits"]


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords: jnp.ndarray) -> jnp.ndarray:
    """Interleave 10-bit x/y/z coords into a 30-bit morton code.

    coords: (..., 3) int32 in [0, 1024). Returns int32 (...,).
    """
    x = _expand_bits(coords[..., 0])
    y = _expand_bits(coords[..., 1])
    z = _expand_bits(coords[..., 2])
    return (x | (y << 1) | (z << 2)).astype(jnp.int32)


def _compact_bits(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.uint32) & jnp.uint32(0x49249249)
    x = (x | (x >> 2)) & jnp.uint32(0xC30C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0F00F00F)
    x = (x | (x >> 8)) & jnp.uint32(0xFF0000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x0000FFFF)
    return x


def morton3d_invert(indices: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`morton3d`. indices: (...,) int -> (..., 3) int32."""
    i = indices.astype(jnp.uint32)
    return jnp.stack(
        [_compact_bits(i), _compact_bits(i >> 1), _compact_bits(i >> 2)], axis=-1
    ).astype(jnp.int32)


def packbits(grid: jnp.ndarray, thresh) -> jnp.ndarray:
    """Pack ``grid > thresh`` into a uint8 bitfield, bit i of byte n covering
    element 8n+i (kernel_packbits, raymarching.cu:268-289).

    grid: (..., M) with M % 8 == 0 -> (..., M // 8) uint8.
    """
    occ = (grid > thresh).astype(jnp.uint8)
    occ = occ.reshape(*grid.shape[:-1], grid.shape[-1] // 8, 8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8)).astype(jnp.uint8)
    return (occ * weights).sum(axis=-1).astype(jnp.uint8)
