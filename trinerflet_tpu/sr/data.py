"""Paired LR/HR multiview data for NeRF super-resolution.

Mirrors the reference SR datamodules (super_resolution/threestudio/data/
multiview_sr.py): the same Blender scene loaded at two scales (HR/LR ratio
asserted, :212), alpha-composited onto the background color (:296-306),
per-view ray grids, plus the globally shuffled LR ray stream consumed in
chunks during phase 1 (:357-387).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from ..data.blender import SceneData, load_blender
from ..data.synthetic import make_synthetic_scene

__all__ = ["SRSceneData", "load_sr_blender", "make_synthetic_sr_scene"]


@dataclasses.dataclass
class SRSceneData:
    lr: SceneData
    hr: SceneData

    def __post_init__(self):
        assert self.hr.H % self.lr.H == 0 and self.hr.W % self.lr.W == 0
        assert self.hr.H // self.lr.H == self.hr.W // self.lr.W
        assert self.lr.num_views == self.hr.num_views

    @property
    def scale(self) -> int:
        return self.hr.H // self.lr.H

    @property
    def num_views(self) -> int:
        return self.lr.num_views


def composite_bg(images: np.ndarray, bg: float) -> np.ndarray:
    if images.shape[-1] == 4:
        rgb = images[..., :3] * images[..., 3:] + bg * (1 - images[..., 3:])
        return rgb.astype(np.float32)
    return images


def load_sr_blender(
    root: str,
    split: str = "train",
    hr_downscale: int = 1,
    scale_ratio: int = 4,
    background_color: float = 0.0,
    data_scale: float = 0.33,
) -> SRSceneData:
    """Load one Blender scene at HR and LR (= HR downscaled by scale_ratio)."""
    hr = load_blender(root, split, downscale=hr_downscale, scale=data_scale)
    lr = load_blender(root, split, downscale=hr_downscale * scale_ratio, scale=data_scale)
    hr.images = composite_bg(hr.images, background_color)
    lr.images = composite_bg(lr.images, background_color)
    return SRSceneData(lr=lr, hr=hr)


def make_synthetic_sr_scene(
    num_views: int = 8, lr_size: int = 32, scale: int = 4, seed: int = 0,
    background_color: float = 0.0,
) -> SRSceneData:
    """Synthetic paired scene for tests: the same analytic field rendered at
    LR and at LR*scale with identical cameras."""
    hr = make_synthetic_scene(num_views, lr_size * scale, lr_size * scale, seed=seed)
    lr = make_synthetic_scene(num_views, lr_size, lr_size, seed=seed)
    lr.poses = hr.poses.copy()  # identical cameras (same seed ordering anyway)
    fx_l = hr.intrinsics[0] / scale
    lr.intrinsics = (fx_l, fx_l, lr_size / 2.0, lr_size / 2.0)
    hr.images = composite_bg(hr.images, background_color)
    lr.images = composite_bg(lr.images, background_color)
    return SRSceneData(lr=lr, hr=hr)
