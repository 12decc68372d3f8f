"""Taming-transformers-style GAN/perceptual stack, TPU-native.

Counterpart of the reference's inherited VQGAN utilities
(``super_resolution/threestudio/utils/GAN/``: discriminator.py,
distribution.py, loss.py, vae.py, mobilenet.py) and the renderer that
consumes them (``models/renderers/gan_volume_renderer.py``). No TriNeRFLet
config uses this stack, but the SR fork ships it for the
``gan-volume-renderer`` path: a NeRF renders a low-resolution
RGB + latent map, a VQGAN-style decoder upsamples it to the target
resolution conditioned on a global image code, and a PatchGAN discriminator
supplies an adversarial loss.

TPU-native choices (no torch lineage):

* everything is a pure ``(init, apply)`` pair over plain dict pytrees in
  NHWC, reusing the SD-VAE building blocks from
  :mod:`trinerflet_tpu.sr.diffusion` (groupnorm/silu resnet blocks, nearest
  up + conv, strided down conv) — the taming VAE is the same architecture
  family (vae.py:80-138 ResnetBlock == diffusers ResnetBlock2D modulo
  naming).
* the discriminator's norm layer is batch-statistics normalization computed
  per call (the reference default ``nn.BatchNorm2d`` in train mode —
  discriminator.py:160-171; GAN discriminators are only ever run in train
  mode here, so no running stats are carried).
* the global image encoder is a compact strided-conv + squeeze-excite
  network rather than a line-for-line MobileNetV3 (mobilenet.py:95-180):
  the reference trains it FROM SCRATCH as a learned global-code extractor
  (gan_volume_renderer.py:65 ``GlobalEncoder(n_class=64)``), so the exact
  backbone is incidental — what matters is the contract (image -> (B, code)
  vector that conditions the decoder's resnet blocks).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..sr.diffusion import (_Init, _attention, _conv, _downsample,
                            _group_norm, _resnet_block, _upsample)

__all__ = [
    "DiagonalGaussian", "GANConfig",
    "init_discriminator", "discriminator_apply",
    "hinge_d_loss", "vanilla_d_loss", "generator_loss", "discriminator_loss",
    "adopt_weight",
    "init_taming_encoder", "taming_encoder_apply",
    "init_taming_decoder", "taming_decoder_apply",
    "init_global_encoder", "global_encoder_apply",
    "init_gan_stack", "gan_render",
]


# ---------------------------------------------------------------------------
# Diagonal Gaussian posterior (reference GAN/distribution.py:5-60)
# ---------------------------------------------------------------------------

class DiagonalGaussian:
    """Channel-last diagonal Gaussian over (B, H, W, 2C) = [mean | logvar]."""

    def __init__(self, parameters: jnp.ndarray, deterministic: bool = False):
        self.mean, logvar = jnp.split(parameters, 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        if self.deterministic:
            return self.mean
        return self.mean + self.std * jax.random.normal(
            rng, self.mean.shape, self.mean.dtype)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self, other: Optional["DiagonalGaussian"] = None) -> jnp.ndarray:
        """KL per batch element, summed over (H, W, C) — distribution.py:32-49."""
        if self.deterministic:
            return jnp.zeros((self.mean.shape[0],), self.mean.dtype)
        axes = (1, 2, 3)
        if other is None:
            return 0.5 * jnp.sum(self.mean**2 + self.var - 1.0 - self.logvar,
                                 axis=axes)
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var - 1.0 - self.logvar + other.logvar,
            axis=axes)

    def nll(self, sample: jnp.ndarray) -> jnp.ndarray:
        """Negative log likelihood per batch element (distribution.py:51-57)."""
        if self.deterministic:
            return jnp.zeros((sample.shape[0],), sample.dtype)
        logtwopi = math.log(2.0 * math.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var,
            axis=(1, 2, 3))


# ---------------------------------------------------------------------------
# PatchGAN discriminator (reference GAN/discriminator.py:141-217)
# ---------------------------------------------------------------------------

def _init_conv_n02(init: _Init, kh, kw, ci, co) -> Dict:
    """4x4 conv with the taming ``weights_init`` (normal std 0.02,
    discriminator.py:129-138)."""
    p = init.conv(kh, kw, ci, co)
    p["weight"] = 0.02 * jax.random.normal(
        init._k(), p["weight"].shape, jnp.float32)
    return p


def init_discriminator(rng: jax.Array, input_nc: int = 3, ndf: int = 64,
                       n_layers: int = 3) -> Dict:
    """PatchGAN: 4x4 stride-2 conv ladder -> 1-channel logits map."""
    init = _Init(rng)
    layers = {"0": _init_conv_n02(init, 4, 4, input_nc, ndf)}
    nf = ndf
    for n in range(1, n_layers + 1):
        nf_prev, nf = nf, min(ndf * 2**n, ndf * 8)
        layers[str(n)] = {
            "conv": _init_conv_n02(init, 4, 4, nf_prev, nf),
            "norm": {"weight": jnp.ones((nf,)), "bias": jnp.zeros((nf,))},
        }
    layers["out"] = _init_conv_n02(init, 4, 4, nf, 1)
    return {"layers": layers}


def _batch_norm(p: Dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-call batch-statistics norm (train-mode BatchNorm2d; no running
    stats — a GAN discriminator is never evaluated in eval mode here)."""
    mean = x.mean(axis=(0, 1, 2), keepdims=True)
    var = x.var(axis=(0, 1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def discriminator_apply(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """x (B, H, W, C) -> patch logits (B, H', W', 1)."""
    layers = params["layers"]
    # layer count from the pytree structure (jit-static), not a traced leaf
    n_layers = len([k for k in layers if k.isdigit()]) - 1
    h = jax.nn.leaky_relu(_conv(layers["0"], x, stride=2, pad=1), 0.2)
    for n in range(1, n_layers + 1):
        stride = 2 if n < n_layers else 1  # last inner layer is stride 1
        h = _conv(layers[str(n)]["conv"], h, stride=stride, pad=1)
        h = jax.nn.leaky_relu(_batch_norm(layers[str(n)]["norm"], h), 0.2)
    return _conv(layers["out"], h, stride=1, pad=1)


# ---------------------------------------------------------------------------
# GAN losses (reference GAN/loss.py + taming adopt_weight)
# ---------------------------------------------------------------------------

def hinge_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (jnp.mean(jax.nn.relu(1.0 - logits_real))
                  + jnp.mean(jax.nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def generator_loss(disc_params: Dict, reconstructions: jnp.ndarray,
                   cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """-E[D(recon)] (loss.py:5-14); gradients flow into the generator only
    (callers hold disc_params fixed in this branch)."""
    x = reconstructions if cond is None else jnp.concatenate(
        [reconstructions, cond], axis=-1)
    return -jnp.mean(discriminator_apply(disc_params, x))


def discriminator_loss(disc_params: Dict, inputs: jnp.ndarray,
                       reconstructions: jnp.ndarray,
                       cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Hinge loss on real/fake; both images are detached (loss.py:23-35)."""
    real = jax.lax.stop_gradient(inputs)
    fake = jax.lax.stop_gradient(reconstructions)
    if cond is not None:
        real = jnp.concatenate([real, cond], axis=-1)
        fake = jnp.concatenate([fake, cond], axis=-1)
    return hinge_d_loss(discriminator_apply(disc_params, real),
                        discriminator_apply(disc_params, fake))


def adopt_weight(weight: float, global_step: jnp.ndarray, threshold: int = 0,
                 value: float = 0.0) -> jnp.ndarray:
    """taming's GAN-loss warmup gate: ``value`` before ``threshold`` steps."""
    return jnp.where(global_step < threshold, value, weight)


# ---------------------------------------------------------------------------
# Taming encoder / decoder (reference GAN/vae.py:379-646)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class GANConfig:
    """The gan-volume-renderer instantiation (gan_volume_renderer.py:41-68)."""
    ch: int = 64                      # generator base width
    ch_enc: int = 32                  # local-encoder base width
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 1
    z_channels: int = 4
    in_channels: int = 7              # lr_rgb (3) + z_map (4)
    out_ch: int = 3
    global_code_dim: int = 64         # GlobalEncoder(n_class=64)
    disc_ndf: int = 64
    disc_layers: int = 3
    groups: int = 32


def _g(c: int, groups: int) -> int:
    return min(groups, c) if c % min(groups, c) == 0 else 1


def init_taming_encoder(rng: jax.Array, cfg: GANConfig,
                        in_channels: int = 3) -> Dict:
    init = _Init(rng)
    ch = cfg.ch_enc
    p = {"conv_in": init.conv(3, 3, in_channels, ch)}
    widths = [ch * m for m in cfg.ch_mult]
    c = ch
    for i, w in enumerate(widths):
        blocks = {}
        for b in range(cfg.num_res_blocks):
            blocks[str(b)] = init.resnet(c, w)
            c = w
        lvl = {"blocks": blocks}
        if i < len(widths) - 1:
            lvl["down"] = {"conv": init.conv(3, 3, c, c)}
        p[f"down_{i}"] = lvl
    p["mid"] = {"block_1": init.resnet(c, c), "attn": init.attention(c),
                "attn_norm": init.norm(c), "block_2": init.resnet(c, c)}
    p["norm_out"] = init.norm(c)
    p["conv_out"] = init.conv(3, 3, c, 2 * cfg.z_channels)
    return p


def _mid_apply(p: Dict, h: jnp.ndarray, groups: int) -> jnp.ndarray:
    h = _resnet_block(p["block_1"], h, None, groups, eps=1e-6)
    B, H, W, C = h.shape
    a = _group_norm(p["attn_norm"], h, _g(C, groups), eps=1e-6)
    h = h + _attention(p["attn"], a.reshape(B, H * W, C), heads=1).reshape(h.shape)
    return _resnet_block(p["block_2"], h, None, groups, eps=1e-6)


def taming_encoder_apply(params: Dict, cfg: GANConfig,
                         x: jnp.ndarray) -> jnp.ndarray:
    """x (B, H, W, C) -> posterior moments (B, H/2^(L-1), W/2^(L-1), 2z)."""
    h = _conv(params["conv_in"], x)
    for i in range(len(cfg.ch_mult)):
        lvl = params[f"down_{i}"]
        for b in range(cfg.num_res_blocks):
            h = _resnet_block(lvl["blocks"][str(b)], h, None,
                              _g(h.shape[-1], cfg.groups), eps=1e-6)
        if "down" in lvl:
            h = _downsample(lvl["down"], h)
    h = _mid_apply(params["mid"], h, cfg.groups)
    h = _group_norm(params["norm_out"], h, _g(h.shape[-1], cfg.groups), eps=1e-6)
    return _conv(params["conv_out"], jax.nn.silu(h))


def init_taming_decoder(rng: jax.Array, cfg: GANConfig) -> Dict:
    """Decoder/Generator: latent+RGB map -> upsampled RGB, with every resnet
    block conditioned on the global code (the reference Decoder threads the
    global encoder output through as ``temb``, vae.py:608-646)."""
    init = _Init(rng)
    widths = [cfg.ch * m for m in cfg.ch_mult]
    c = widths[-1]
    p = {"conv_in": init.conv(3, 3, cfg.in_channels, c)}
    p["mid"] = {"block_1": init.resnet(c, c, cfg.global_code_dim),
                "attn": init.attention(c), "attn_norm": init.norm(c),
                "block_2": init.resnet(c, c, cfg.global_code_dim)}
    for i, w in enumerate(reversed(widths)):
        blocks = {}
        for b in range(cfg.num_res_blocks + 1):
            blocks[str(b)] = init.resnet(c, w, cfg.global_code_dim)
            c = w
        lvl = {"blocks": blocks}
        if i < len(widths) - 1:
            lvl["up"] = {"conv": init.conv(3, 3, c, c)}
        p[f"up_{i}"] = lvl
    p["norm_out"] = init.norm(c)
    p["conv_out"] = init.conv(3, 3, c, cfg.out_ch)
    return p


def taming_decoder_apply(params: Dict, cfg: GANConfig, z: jnp.ndarray,
                         global_code: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """z (B, h, w, in_channels) -> (B, h*2^(L-1), w*2^(L-1), out_ch)."""
    h = _conv(params["conv_in"], z)

    def res(p, h):
        return _resnet_block(p, h, global_code, _g(h.shape[-1], cfg.groups),
                             eps=1e-6)

    m = params["mid"]
    h = res(m["block_1"], h)
    B, H, W, C = h.shape
    a = _group_norm(m["attn_norm"], h, _g(C, cfg.groups), eps=1e-6)
    h = h + _attention(m["attn"], a.reshape(B, H * W, C), heads=1).reshape(h.shape)
    h = res(m["block_2"], h)
    for i in range(len(cfg.ch_mult)):
        lvl = params[f"up_{i}"]
        for b in range(cfg.num_res_blocks + 1):
            h = res(lvl["blocks"][str(b)], h)
        if "up" in lvl:
            h = _upsample(lvl["up"], h)
    h = _group_norm(params["norm_out"], h, _g(h.shape[-1], cfg.groups), eps=1e-6)
    return _conv(params["conv_out"], jax.nn.silu(h))


# ---------------------------------------------------------------------------
# Global image encoder (contract of GAN/mobilenet.py MobileNetV3; see module
# docstring for the substitution rationale)
# ---------------------------------------------------------------------------

def init_global_encoder(rng: jax.Array, n_class: int = 64,
                        width: int = 32) -> Dict:
    init = _Init(rng)
    p, c = {"conv_in": init.conv(3, 3, 3, width)}, width
    for i in range(4):  # 4 stride-2 stages with squeeze-excitation
        co = min(c * 2, 256)
        p[f"stage_{i}"] = {
            "conv": init.conv(3, 3, c, co),
            "norm": init.norm(co),
            "se_down": init.linear(co, max(co // 4, 8)),
            "se_up": init.linear(max(co // 4, 8), co),
        }
        c = co
    p["head"] = init.linear(c, n_class)
    return p


def global_encoder_apply(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """x (B, H, W, 3) -> global code (B, n_class)."""
    h = jax.nn.silu(_conv(params["conv_in"], x, stride=2, pad=1))
    for i in range(4):
        s = params[f"stage_{i}"]
        h = _conv(s["conv"], h, stride=2, pad=1)
        h = jax.nn.silu(_group_norm(s["norm"], h, _g(h.shape[-1], 8)))
        se = h.mean(axis=(1, 2))
        se = jax.nn.sigmoid(se @ params[f"stage_{i}"]["se_down"]["weight"].T
                            + s["se_down"]["bias"])
        se = jax.nn.sigmoid(se @ s["se_up"]["weight"].T + s["se_up"]["bias"])
        h = h * se[:, None, None, :]
    g = h.mean(axis=(1, 2))
    return g @ params["head"]["weight"].T + params["head"]["bias"]


# ---------------------------------------------------------------------------
# gan-volume-renderer counterpart (gan_volume_renderer.py:20-160)
# ---------------------------------------------------------------------------

def init_gan_stack(rng: jax.Array, cfg: GANConfig) -> Dict:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "generator": init_taming_decoder(k1, cfg),
        "local_encoder": init_taming_encoder(k2, cfg, in_channels=3),
        "global_encoder": init_global_encoder(k3, cfg.global_code_dim),
        "discriminator": init_discriminator(k4, input_nc=cfg.out_ch,
                                            ndf=cfg.disc_ndf,
                                            n_layers=cfg.disc_layers),
    }


def gan_render(
    params: Dict,
    cfg: GANConfig,
    comp_rgb_latent: jnp.ndarray,       # (B, h, w, 3 + 2*z) low-res render
    rng: jax.Array,
    gt_rgb: Optional[jnp.ndarray] = None,
    generator_level: int = 0,
    sample_posterior: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Decode a low-res NeRF render (RGB + latent moments) into a
    2^(L-1)-times upsampled GAN RGB (gan_volume_renderer.py:70-160).

    generator_level 0: global code from the low-res render itself;
    level 1: global code from gt_rgb; level 2: both the global code AND the
    latent come from gt_rgb (through the local encoder) — the reference's
    multi-level guidance curriculum.
    """
    lr_rgb = comp_rgb_latent[..., :3]
    posterior = DiagonalGaussian(comp_rgb_latent[..., 3:])
    k_z, k_z2 = jax.random.split(rng)
    z_map = posterior.sample(k_z) if sample_posterior else posterior.mode()

    if generator_level >= 1:
        assert gt_rgb is not None, "levels 1/2 need gt_rgb"
        code_src = gt_rgb
    else:
        code_src = lr_rgb
    B, h, w, _ = lr_rgb.shape
    code_in = jax.image.resize(code_src, (B, 224, 224, 3), "bilinear")
    g_code = global_encoder_apply(params["global_encoder"], code_in)

    if generator_level == 2:
        moments = taming_encoder_apply(params["local_encoder"], cfg, gt_rgb)
        posterior = DiagonalGaussian(moments)
        z_map = posterior.sample(k_z2)
        z_map = jax.image.resize(z_map, (B, h, w, z_map.shape[-1]), "bilinear")

    gan_rgb = taming_decoder_apply(
        params["generator"], cfg,
        jnp.concatenate([lr_rgb, z_map], axis=-1), g_code)
    return {
        "comp_lr_rgb": lr_rgb,
        "comp_gan_rgb": jnp.clip(gan_rgb, 0.0, 1.0),
        "posterior_mean": posterior.mean,
        "posterior_logvar": posterior.logvar,
        "posterior_kl": posterior.kl(),
    }
