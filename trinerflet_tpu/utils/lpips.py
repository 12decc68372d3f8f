"""LPIPS perceptual distance (Zhang et al. 2018) in pure JAX.

TPU-native counterpart of the reference's two LPIPS uses:
* eval meter (reconstruction/nerf/utils.py:316-362, ``lpips.LPIPS(net='alex'|'vgg')``)
* LR-SR perceptual consistency loss
  (super_resolution/threestudio/systems/triplane_wavelet_sr.py:622-628)

Architecture matches the ``lpips`` package v0.1 exactly:
  scale input to [-1, 1] -> ImageNet-ish ScalingLayer -> backbone features at
  5 taps (alex: relu1..relu5; vgg16: relu1_2, relu2_2, relu3_3, relu4_3,
  relu5_3) -> channel-unit-normalize -> squared diff -> learned non-negative
  1x1 "lin" conv to 1 channel -> spatial mean -> sum over taps.

Weights: this offline image ships none, so ``load_torch_state_dict`` converts
a user-supplied torchvision backbone state dict (.pth via torch, or
.safetensors) plus the LPIPS lin checkpoint into the param pytree. Tests run
the full graph with ``init_lpips_params`` random weights (wiring/shapes), and
everything downstream treats LPIPS as unavailable when no weights are given.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "lpips",
    "init_lpips_params",
    "load_torch_state_dict",
    "make_lpips_fn",
    "ALEX_CHANNELS",
    "VGG_CHANNELS",
]

# channels of the 5 feature taps
ALEX_CHANNELS = (64, 192, 384, 256, 256)
VGG_CHANNELS = (64, 128, 256, 512, 512)

# (out_channels, kernel, stride, pad) per conv; "M" = 3x3/2 (alex) or 2x2/2
# (vgg) max pool; "|" marks a feature tap (after the preceding conv's ReLU)
_ALEX_LAYOUT = [
    (64, 11, 4, 2), "|", "M",
    (192, 5, 1, 2), "|", "M",
    (384, 3, 1, 1), "|",
    (256, 3, 1, 1), "|",
    (256, 3, 1, 1), "|",
]
_VGG_LAYOUT = [
    (64, 3, 1, 1), (64, 3, 1, 1), "|", "M",
    (128, 3, 1, 1), (128, 3, 1, 1), "|", "M",
    (256, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1), "|", "M",
    (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1), "|", "M",
    (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1), "|",
]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _layout(net: str):
    if net == "alex":
        return _ALEX_LAYOUT, ALEX_CHANNELS
    if net == "vgg":
        return _VGG_LAYOUT, VGG_CHANNELS
    raise ValueError(f"net must be 'alex' or 'vgg', got {net!r}")


def _conv(x, w, b, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


def _maxpool(x, k, s):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID"
    )


def _features(params: Dict, x: jnp.ndarray, net: str) -> List[jnp.ndarray]:
    layout, _ = _layout(net)
    pool_k = 3 if net == "alex" else 2
    taps = []
    ci = 0
    for item in layout:
        if item == "M":
            x = _maxpool(x, pool_k, 2)
        elif item == "|":
            taps.append(x)
        else:
            _, k, s, p = item
            c = params["backbone"][f"conv{ci}"]
            x = jax.nn.relu(_conv(x, c["w"], c["b"], s, p))
            ci += 1
    return taps


def lpips(
    params: Dict,
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    net: str = "vgg",
    normalize: bool = True,
) -> jnp.ndarray:
    """Perceptual distance between two image batches.

    img0/img1: (N, H, W, 3); in [0, 1] when ``normalize`` (default, matching
    ``lpips.LPIPS(...)(x, y, normalize=True)``), else already in [-1, 1].
    Returns (N,) distances.
    """
    if img0.ndim == 3:
        img0, img1 = img0[None], img1[None]
    x0 = img0.astype(jnp.float32)
    x1 = img1.astype(jnp.float32)
    # the backbone's stride/pool chain needs >= ~64 px to keep every tap
    # non-empty (alex: stride-4 conv + 3 pools); tiny crops get upsampled
    # (the torch lpips package would produce empty tensors / crash instead)
    h, w = x0.shape[1:3]
    if h < 64 or w < 64:
        s = max(-(-64 // h), -(-64 // w))  # ceil division
        new = (x0.shape[0], h * s, w * s, x0.shape[3])
        x0 = jax.image.resize(x0, new, "bilinear")
        x1 = jax.image.resize(x1, new, "bilinear")
    if normalize:
        x0 = 2.0 * x0 - 1.0
        x1 = 2.0 * x1 - 1.0
    x0 = (x0 - _SHIFT) / _SCALE
    x1 = (x1 - _SHIFT) / _SCALE

    f0 = _features(params, x0, net)
    f1 = _features(params, x1, net)
    total = 0.0
    for t0, t1, lin in zip(f0, f1, params["lins"]):
        n0 = t0 * jax.lax.rsqrt(jnp.sum(t0 * t0, -1, keepdims=True) + 1e-10)
        n1 = t1 * jax.lax.rsqrt(jnp.sum(t1 * t1, -1, keepdims=True) + 1e-10)
        d = (n0 - n1) ** 2
        # lin: non-negative per-channel weights, 1x1 conv to a scalar map
        total = total + jnp.mean(d @ jnp.abs(lin), axis=(1, 2, 3))
    return total


def init_lpips_params(rng: jax.Array, net: str = "vgg") -> Dict:
    """Random-weight params with the exact real shapes (tests / wiring)."""
    layout, tap_channels = _layout(net)
    backbone = {}
    cin, ci = 3, 0
    for item in layout:
        if isinstance(item, tuple):
            cout, k, _, _ = item
            rng, kw = jax.random.split(rng)
            fan = k * k * cin
            backbone[f"conv{ci}"] = {
                "w": jax.random.normal(kw, (k, k, cin, cout)) / math.sqrt(fan),
                "b": jnp.zeros((cout,)),
            }
            cin, ci = cout, ci + 1
    rng, kl = jax.random.split(rng)
    lins = [
        jax.random.uniform(k, (c, 1)) / c
        for k, c in zip(jax.random.split(kl, len(tap_channels)), tap_channels)
    ]
    return {"backbone": backbone, "lins": lins}


def load_torch_state_dict(
    backbone_sd: Dict[str, np.ndarray],
    lin_sd: Dict[str, np.ndarray],
    net: str = "vgg",
) -> Dict:
    """Convert torchvision backbone + lpips lin state dicts to the pytree.

    backbone_sd: torchvision ``alexnet``/``vgg16`` state dict — conv weights
    live at ``features.{idx}.weight`` (OIHW). lin_sd: the lpips package's
    ``lin{i}.model.1.weight`` entries, shape (1, C, 1, 1).
    Accepts dicts of numpy arrays (load .pth via torch, or .safetensors via
    ``safetensors.numpy.load_file``).
    """
    layout, tap_channels = _layout(net)
    # torchvision features indices: convs and pools interleaved with ReLUs
    feat_indices = []
    idx = 0
    for item in layout:
        if item == "M":
            idx += 1
        elif isinstance(item, tuple):
            feat_indices.append(idx)
            idx += 2  # conv + relu
    backbone = {}
    for ci, fi in enumerate(feat_indices):
        w = np.asarray(backbone_sd[f"features.{fi}.weight"], np.float32)
        b = np.asarray(backbone_sd[f"features.{fi}.bias"], np.float32)
        backbone[f"conv{ci}"] = {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # OIHW -> HWIO
            "b": jnp.asarray(b),
        }
    lins = []
    for i, c in enumerate(tap_channels):
        key = f"lin{i}.model.1.weight"
        if key not in lin_sd:  # older checkpoints: "lins.{i}.model.1.weight"
            key = f"lins.{i}.model.1.weight"
        w = np.asarray(lin_sd[key], np.float32).reshape(1, c, 1, 1)
        lins.append(jnp.asarray(w[0, :, 0, :]))  # (C, 1)
    return {"backbone": backbone, "lins": lins}


def _load_any(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch  # torch (cpu) is available in the image

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}


def make_lpips_fn(
    backbone_path: Optional[str] = None,
    lin_path: Optional[str] = None,
    net: str = "vgg",
    params: Optional[Dict] = None,
):
    """Build a jitted ``fn(img0, img1) -> float`` or return None when no
    weights are available (downstream treats LPIPS as absent, mirroring
    round-1 behavior)."""
    if params is None:
        if not (backbone_path and lin_path):
            return None
        params = load_torch_state_dict(_load_any(backbone_path), _load_any(lin_path), net)

    @jax.jit
    def dist(a, b):
        return lpips(params, a, b, net=net).mean()

    return lambda a, b: float(dist(jnp.asarray(a), jnp.asarray(b)))
