"""Quality metrics: PSNR and SSIM meters.

Mirrors the reference meter protocol (PSNRMeter/SSIMMeter/LPIPSMeter,
reconstruction/nerf/utils.py:245-362): ``update(pred, truth)`` per image,
``measure()`` for the running mean, ``report2()`` for a dict.

SSIM is the standard gaussian-window (11x11, sigma 1.5) structural similarity
matching ``torchmetrics.structural_similarity_index_measure`` defaults. LPIPS
requires pretrained AlexNet/VGG weights which this offline environment does
not ship; ``LPIPSMeter`` degrades to reporting NaN and is excluded from
results unless a weights path is provided.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import convolve2d

__all__ = ["PSNRMeter", "SSIMMeter", "LPIPSMeter", "psnr", "ssim"]


def psnr(pred: np.ndarray, truth: np.ndarray) -> float:
    mse = float(np.mean((np.asarray(pred, np.float64) - np.asarray(truth, np.float64)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    r = np.arange(size) - size // 2
    g = np.exp(-(r**2) / (2 * sigma**2))
    k = np.outer(g, g)
    return k / k.sum()


def ssim(pred: np.ndarray, truth: np.ndarray, data_range: float = 1.0) -> float:
    """Mean SSIM over channels; inputs (H, W, C) in [0, 1]. Uses the OpenMP
    native kernel when built (trinerflet_tpu.native), scipy otherwise."""
    if data_range == 1.0:
        try:
            from .. import native

            if native.available():
                return native.ssim(np.asarray(pred, np.float32), np.asarray(truth, np.float32))
        except Exception:
            pass
    k = _gaussian_kernel()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    vals = []
    pred = np.asarray(pred, np.float64)
    truth = np.asarray(truth, np.float64)
    for c in range(pred.shape[-1]):
        x, y = pred[..., c], truth[..., c]
        mx = convolve2d(x, k, mode="valid")
        my = convolve2d(y, k, mode="valid")
        mxx = convolve2d(x * x, k, mode="valid")
        myy = convolve2d(y * y, k, mode="valid")
        mxy = convolve2d(x * y, k, mode="valid")
        vx = mxx - mx * mx
        vy = myy - my * my
        cov = mxy - mx * my
        s = ((2 * mx * my + c1) * (2 * cov + c2)) / ((mx**2 + my**2 + c1) * (vx + vy + c2))
        vals.append(s.mean())
    return float(np.mean(vals))


class _MeanMeter:
    name = "metric"

    def __init__(self):
        self.V = 0.0
        self.N = 0

    def clear(self):
        self.V, self.N = 0.0, 0

    def measure(self) -> float:
        return self.V / max(self.N, 1)

    def report(self) -> str:
        return f"{self.name} = {self.measure():.6f}"

    def report2(self):
        return {self.name: self.measure()}


class PSNRMeter(_MeanMeter):
    name = "PSNR"

    def update(self, preds, truths):
        self.V += psnr(preds, truths)
        self.N += 1


class SSIMMeter(_MeanMeter):
    name = "SSIM"

    def update(self, preds, truths):
        p = np.asarray(preds)
        t = np.asarray(truths)
        if p.ndim == 4:
            for pi, ti in zip(p, t):
                self.V += ssim(pi, ti)
                self.N += 1
        else:
            self.V += ssim(p, t)
            self.N += 1


class LPIPSMeter(_MeanMeter):
    """LPIPS meter (reference LPIPSMeter, utils.py:316-362), backed by the
    pure-JAX LPIPS network in utils/lpips.py. This offline image ships no
    pretrained backbone weights, so without ``fn``/weight paths the meter
    reports NaN and is excluded from results."""

    name = "LPIPS"

    def __init__(self, fn=None):
        super().__init__()
        self.fn = fn

    @classmethod
    def from_weights(cls, backbone_path: str, lin_path: str, net: str = "vgg"):
        from ..utils.lpips import make_lpips_fn

        return cls(fn=make_lpips_fn(backbone_path, lin_path, net=net))

    @classmethod
    def from_params(cls, params, net: str = "vgg"):
        from ..utils.lpips import make_lpips_fn

        return cls(fn=make_lpips_fn(params=params, net=net))

    @property
    def available(self) -> bool:
        return self.fn is not None

    def update(self, preds, truths):
        if self.fn is None:
            return
        self.V += float(self.fn(preds, truths))
        self.N += 1

    def measure(self) -> float:
        if self.N == 0:
            return float("nan")
        return self.V / self.N
