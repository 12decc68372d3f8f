"""Multi-host (multi-process) evaluation collation.

Reference counterpart: the DDP eval all_gather in
``reconstruction/nerf/utils.py:1270-1289`` — every rank renders a shard of
the validation views, preds are all_gathered, and rank 0 reports/saves.

JAX multi-controller version: views are round-robin sharded by
``jax.process_index()``, each process renders + scores its own views locally
(PSNR/SSIM are cheap host math), and the per-view metric rows are exchanged
with ``multihost_utils.process_allgather`` so every process ends with the
full result table; only process 0 writes artifacts. With one process
(this environment, and any single-host run) every function degrades to the
identity, so the path is exercised by the regular test suite.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import numpy as np

__all__ = ["process_view_slice", "allgather_rows", "is_primary"]


def is_primary() -> bool:
    return jax.process_index() == 0


def process_view_slice(num_views: int) -> List[int]:
    """Round-robin shard of view indices for this process (matches the
    reference's DistributedSampler stride layout)."""
    return list(range(jax.process_index(), num_views, jax.process_count()))


def allgather_rows(rows: np.ndarray, total: int) -> np.ndarray:
    """Gather per-view metric rows from every process.

    rows: (n_local, D) float32 whose first column is the view id. Returns
    (total, D) sorted by view id. Single-process: returns rows unchanged
    (sorted).
    """
    rows = np.asarray(rows, np.float32).reshape(-1, rows.shape[-1] if rows.ndim > 1 else 1)
    if jax.process_count() == 1:
        return rows[np.argsort(rows[:, 0])]
    from jax.experimental import multihost_utils

    # pad to the max local count so the collective is uniform
    per = -(-total // jax.process_count())
    pad = np.full((per - len(rows), rows.shape[1]), np.nan, np.float32)
    stacked = np.concatenate([rows, pad]) if len(pad) else rows
    gathered = np.asarray(multihost_utils.process_allgather(stacked))
    gathered = gathered.reshape(-1, rows.shape[1])
    gathered = gathered[~np.isnan(gathered[:, 0])]
    return gathered[np.argsort(gathered[:, 0])]
