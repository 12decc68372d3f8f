"""Multi-chip parallelism over a `jax.sharding.Mesh`.

The reference's distributed story is NCCL data-parallelism only (DDP wrap +
eval all_gather, reconstruction/nerf/utils.py:412-415, 1270-1289; SURVEY §2.4).
The TPU-native equivalent — and its extension — is GSPMD over a 2-axis mesh:

* ``data`` axis: the ray batch is sharded across chips; every chip marches,
  evaluates the field, and composites its own rays; gradient psum is inserted
  automatically by XLA (this replaces DDP/all_reduce).
* ``model`` axis: the wavelet-triplane *channel* dimension is sharded. The
  plane reconstruction (IDWT ladder) is depthwise over channels, so the
  per-level convolutions parallelize with **zero halo exchange**; plane
  gathers likewise act per channel. The field's first sigma-MLP layer
  contracts over (plane, channel), producing a psum over the model axis.
  This gives genuine tensor parallelism for the memory/compute-heavy part of
  the model (2048^2 planes), which the reference cannot do at all.

PP/EP are not applicable to this model family (a 2-layer MLP has no pipeline
depth; there are no experts) — noted for parity with the survey's inventory.

No collectives are written by hand: parameters carry NamedShardings, batches
get sharding constraints, and XLA emits all_gathers/psums over ICI.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "param_shardings", "state_shardings", "DATA_AXIS",
           "MODEL_AXIS", "active_mesh", "current_data_mesh"]

DATA_AXIS = "data"
MODEL_AXIS = "model"

# Trace-time mesh context: ops that must be expressed per-data-shard (the
# blocked scatter-add — a sequential global sort+scan the SPMD partitioner
# cannot decompose; it emitted per-iteration collectives at data=8, a 13x
# backward blowup) consult this to wrap themselves in shard_map. Set by the
# step functions around THEIR OWN tracing, so interleaved meshed/unmeshed
# trainers in one process can't contaminate each other.
_ACTIVE_MESH: Optional[Mesh] = None


@contextlib.contextmanager
def active_mesh(mesh: Optional[Mesh]):
    """Scope ``mesh`` as the ambient mesh while tracing a step function."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield
    finally:
        _ACTIVE_MESH = prev


def current_data_mesh() -> Optional[Mesh]:
    """The ambient mesh, if it has a non-trivial data axis."""
    m = _ACTIVE_MESH
    if m is not None and m.shape.get(DATA_AXIS, 1) > 1:
        return m
    return None


def make_mesh(devices: Optional[Sequence] = None, model_parallel: int = 1) -> Mesh:
    """Create a (data, model) mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _is_channel_shardable(path_leaf_shape, model_size: int) -> bool:
    return model_size > 1


def param_shardings(mesh: Mesh, params: Dict) -> Dict:
    """NamedSharding tree for the model parameters.

    Triplane tensors are sharded on their channel dim over ``model``:
      base     (3, C, h, w)    -> P(None, 'model')
      wavelets (3, C, 3, s, s) -> P(None, 'model')
    MLP weights are small; they stay replicated (their first-layer contraction
    against channel-sharded features still psums over 'model').
    """
    model_size = mesh.shape[MODEL_AXIS]

    def enc_spec(leaf):
        if model_size > 1 and leaf.ndim >= 2 and leaf.shape[1] % model_size == 0:
            return NamedSharding(mesh, P(None, MODEL_AXIS))
        return NamedSharding(mesh, P())

    out = {}
    for k, v in params.items():
        if k == "encoder":
            out[k] = jax.tree.map(enc_spec, v)
        else:
            out[k] = jax.tree.map(lambda leaf: NamedSharding(mesh, P()), v)
    return out


def state_shardings(mesh: Mesh, state) -> Any:
    """Shardings for the full TrainState: params/ema/opt mirror the param
    sharding; occupancy state and scalars are replicated."""
    ps = param_shardings(mesh, state.params)
    rep = NamedSharding(mesh, P())

    def like_params(tree):
        # opt_state / ema contain arrays shaped like params plus scalars
        flat_ps = {}

        def build(path, leaf):
            return leaf

        # map over tree: if an array matches a param leaf shape in the encoder
        # subtree, reuse its sharding; else replicate.
        param_leaves = jax.tree.leaves_with_path(state.params)
        shard_leaves = jax.tree.leaves_with_path(ps)
        by_path = {jax.tree_util.keystr(p): s for (p, _), (_, s) in zip(param_leaves, shard_leaves)}

        def spec_for(path, leaf):
            key = jax.tree_util.keystr(path)
            for pk, s in by_path.items():
                if key.endswith(pk):
                    return s
            return rep

        return jax.tree_util.tree_map_with_path(spec_for, tree)

    return type(state)(
        params=ps,
        opt_state=like_params(state.opt_state),
        ema_params=like_params(state.ema_params),
        ema_count=rep,
        occ=jax.tree.map(lambda _: rep, state.occ),
        step=rep,
        rng=rep,
    )
