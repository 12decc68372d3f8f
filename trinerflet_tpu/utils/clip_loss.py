"""CLIP guidance interface (reference nerf/clip_utils.py: ViT-B/16 text-image
loss for the ``--rand_pose`` semi-supervised mode).

This offline environment ships no CLIP weights, so the loss is pluggable: pass
any callable mapping (images (B, H, W, 3) in [0,1], text embedding) -> scalar.
``CLIPLoss`` raises a clear error if constructed without one. When CLIP
weights are available, adapt them via ``from_torch_clip``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

__all__ = ["CLIPLoss"]


class CLIPLoss:
    def __init__(self, text: str, loss_fn: Optional[Callable] = None):
        self.text = text
        self.loss_fn = loss_fn
        if loss_fn is None:
            raise NotImplementedError(
                "CLIP guidance needs pretrained ViT weights, which are not "
                "available in this offline environment. Provide loss_fn="
                "callable(images, text) -> scalar (e.g. wrap a flax ViT with "
                "loaded CLIP weights) to enable --rand_pose training."
            )

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.loss_fn(images, self.text)
