"""Iso-surface extraction + OBJ export.

Stands in for the reference's mesh exporter (``Trainer.save_mesh``,
reconstruction/nerf/utils.py:738-758: density grid -> mcubes -> trimesh
export). Neither ``mcubes`` nor ``trimesh`` is available offline, so this
implements **marching tetrahedra** (6-tet Kuhn decomposition per cube —
table-free, watertight) in vectorized numpy, plus a minimal OBJ writer.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np

__all__ = ["marching_tetrahedra", "extract_mesh", "write_obj"]

# Kuhn 6-tet decomposition of the unit cube (vertices = 3-bit (x, y, z) ids):
# every path 0 -> a -> b -> 7 along cube edges gives tet (0, a, b, 7).
_TETS = np.array(
    [(0, 1, 3, 7), (0, 1, 5, 7), (0, 2, 3, 7), (0, 2, 6, 7), (0, 4, 5, 7), (0, 4, 6, 7)],
    dtype=np.int32,
)
_CUBE_OFFSETS = np.array(
    [[(v >> 2) & 1, (v >> 1) & 1, v & 1] for v in range(8)], dtype=np.int32
)  # vertex id bits -> (x, y, z)

# tet edge ids: 0:(0,1) 1:(0,2) 2:(0,3) 3:(1,2) 4:(1,3) 5:(2,3)
_TET_EDGES = np.array([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)], dtype=np.int32)


def _case_triangles(mask: int):
    """Triangles (as triples of tet-edge ids) for an inside-mask in [0, 16)."""
    inside = [v for v in range(4) if mask >> v & 1]
    outside = [v for v in range(4) if not mask >> v & 1]
    edge_id = {tuple(sorted(e)): i for i, e in enumerate(map(tuple, _TET_EDGES))}

    def e(a, b):
        return edge_id[tuple(sorted((a, b)))]

    if len(inside) == 0 or len(inside) == 4:
        return []
    if len(inside) == 1:
        i = inside[0]
        a, b, c = outside
        return [(e(i, a), e(i, b), e(i, c))]
    if len(inside) == 3:
        o = outside[0]
        a, b, c = inside
        return [(e(o, a), e(o, c), e(o, b))]
    i, j = inside
    k, l = outside
    q = [e(i, k), e(i, l), e(j, l), e(j, k)]  # cyclic quad
    return [(q[0], q[1], q[2]), (q[0], q[2], q[3])]


_CASE_TRIS = [_case_triangles(m) for m in range(16)]


def marching_tetrahedra(
    grid: np.ndarray, threshold: float, origin=(0.0, 0.0, 0.0), spacing=1.0
) -> np.ndarray:
    """Extract the iso-surface of a dense (X, Y, Z) scalar field.

    Returns a triangle soup (T, 3, 3) of world-space vertices (apply
    ``np.unique`` on rounded vertices for an indexed mesh; see extract_mesh).
    Uses the OpenMP native kernel when built (trinerflet_tpu.native).
    """
    try:
        from .. import native

        soup = native.marching_tetrahedra(grid, threshold, origin, spacing)
        if soup is not None:
            return soup
    except Exception:
        pass
    X, Y, Z = grid.shape
    cx, cy, cz = X - 1, Y - 1, Z - 1
    base = np.stack(
        np.meshgrid(np.arange(cx), np.arange(cy), np.arange(cz), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)  # (M, 3) cube origins

    # cube corner values (M, 8) and positions (M, 8, 3)
    corners = base[:, None, :] + _CUBE_OFFSETS[None]  # (M, 8, 3)
    vals = grid[corners[..., 0], corners[..., 1], corners[..., 2]]  # (M, 8)

    tris_out = []
    for tet in _TETS:
        tv = vals[:, tet]                       # (M, 4)
        tp = corners[:, tet].astype(np.float64)  # (M, 4, 3)
        mask = ((tv > threshold) << np.arange(4)).sum(-1)  # (M,)
        for case in range(1, 15):
            tris = _CASE_TRIS[case]
            if not tris:
                continue
            sel = np.nonzero(mask == case)[0]
            if len(sel) == 0:
                continue
            v_sel = tv[sel]
            p_sel = tp[sel]
            # interpolated crossing point per tet edge
            def edge_point(eid):
                a, b = _TET_EDGES[eid]
                da, db = v_sel[:, a], v_sel[:, b]
                t = (threshold - da) / np.where(np.abs(db - da) < 1e-12, 1e-12, db - da)
                t = np.clip(t, 0.0, 1.0)[:, None]
                return p_sel[:, a] * (1 - t) + p_sel[:, b] * t

            pts = {eid: edge_point(eid) for tri in tris for eid in tri}
            for tri in tris:
                tris_out.append(np.stack([pts[tri[0]], pts[tri[1]], pts[tri[2]]], axis=1))
    if not tris_out:
        return np.zeros((0, 3, 3), np.float32)
    soup = np.concatenate(tris_out, axis=0)
    return (np.asarray(origin) + soup * spacing).astype(np.float32)


def extract_mesh(
    density_fn: Callable[[np.ndarray], np.ndarray],
    bound: float,
    resolution: int = 256,
    threshold: float = 10.0,
    chunk: int = 1 << 18,
) -> Tuple[np.ndarray, np.ndarray]:
    """Evaluate density on a grid (chunked, mirrors extract_fields
    utils.py:185-200) and extract an indexed (vertices, faces) mesh."""
    axis = np.linspace(-bound, bound, resolution, dtype=np.float32)
    pts = np.stack(np.meshgrid(axis, axis, axis, indexing="ij"), -1).reshape(-1, 3)
    dens = np.concatenate(
        [np.asarray(density_fn(pts[i : i + chunk])) for i in range(0, len(pts), chunk)]
    ).reshape(resolution, resolution, resolution)
    spacing = 2 * bound / (resolution - 1)
    soup = marching_tetrahedra(dens, threshold, origin=(-bound,) * 3, spacing=spacing)
    flat = soup.reshape(-1, 3)
    verts, inv = np.unique(np.round(flat / (spacing * 1e-4)).astype(np.int64),
                           axis=0, return_inverse=True)
    # representative positions
    order = np.argsort(inv, kind="stable")
    first = np.zeros(len(verts), np.int64)
    seen = np.full(len(verts), -1, np.int64)
    seen[inv[order]] = order  # last write wins; fine for representatives
    vpos = flat[seen]
    faces = inv.reshape(-1, 3)
    # drop degenerate faces
    ok = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) & (faces[:, 0] != faces[:, 2])
    return vpos.astype(np.float32), faces[ok].astype(np.int64)


def write_obj(path: str, vertices: np.ndarray, faces: np.ndarray) -> None:
    with open(path, "w") as f:
        for v in vertices:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for tri in faces + 1:
            f.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")
