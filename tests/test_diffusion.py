"""SD x4-upscaler networks: shapes, conditioning, safetensors round-trip, and
the FULL generate_sr SDEdit loop through a real (tiny, random-weight) UNet+VAE
— the wiring the reference gets from StableDiffusionUpscalePipeline
(stable_diffusion_guidance_sr.py:94-97, 692-849)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trinerflet_tpu.sr.diffusion import (
    SD_X4_UPSCALER_UNET,
    SD_X4_UPSCALER_VAE,
    UNetConfig,
    VAEConfig,
    init_unet_params,
    init_vae_params,
    load_safetensors_params,
    make_unet_denoiser,
    unet_apply,
    unet_config_from_json,
    vae_decode,
    vae_encode,
)
from trinerflet_tpu.sr.guidance import GuidanceConfig, UpscalerGuidance

TINY_UNET = UNetConfig(
    in_channels=7, out_channels=4,
    block_out_channels=(16, 32),
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
    layers_per_block=1, cross_attention_dim=24,
    attention_head_dim=(2, 2), norm_num_groups=8,
)
TINY_VAE = VAEConfig(block_out_channels=(8, 16), latent_channels=4,
                     layers_per_block=1, norm_num_groups=4)


def test_unet_forward_shapes_and_conditioning():
    params = init_unet_params(jax.random.PRNGKey(0), TINY_UNET)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 7))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 24))
    eps = unet_apply(params, TINY_UNET, x, jnp.asarray(10), ctx,
                     class_labels=jnp.asarray(20))
    assert eps.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(eps)).all()
    # timestep, noise level, and text context must all change the output
    eps_t = unet_apply(params, TINY_UNET, x, jnp.asarray(500), ctx,
                       class_labels=jnp.asarray(20))
    eps_n = unet_apply(params, TINY_UNET, x, jnp.asarray(10), ctx,
                       class_labels=jnp.asarray(300))
    eps_c = unet_apply(params, TINY_UNET, x, jnp.asarray(10), 2.0 * ctx,
                       class_labels=jnp.asarray(20))
    for other in (eps_t, eps_n, eps_c):
        assert float(jnp.abs(eps - other).max()) > 1e-5


def test_vae_roundtrip_shapes():
    params = init_vae_params(jax.random.PRNGKey(0), TINY_VAE)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3), minval=-1, maxval=1)
    z = vae_encode(params, TINY_VAE, img)
    assert z.shape == (1, 16, 16, 4)  # spatial_scale = 2 for 2 blocks
    out = vae_decode(params, TINY_VAE, z)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    # stochastic encode differs from mode
    z2 = vae_encode(params, TINY_VAE, img, sample_rng=jax.random.PRNGKey(2))
    assert float(jnp.abs(z - z2).max()) > 0


def test_safetensors_roundtrip(tmp_path):
    """Flat torch-layout state dict -> loader -> identical UNet output."""
    from safetensors.numpy import save_file

    params = init_unet_params(jax.random.PRNGKey(0), TINY_UNET)

    flat = {}

    def flatten(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                flatten(f"{prefix}.{k}" if prefix else k, v)
        else:
            a = np.asarray(node)
            if a.ndim == 4:  # back to torch OIHW
                a = np.transpose(a, (3, 2, 0, 1))
            # this env's safetensors silently corrupts non-contiguous views
            flat[prefix] = np.ascontiguousarray(a)

    flatten("", params)
    p = str(tmp_path / "unet.safetensors")
    save_file(flat, p)
    loaded = load_safetensors_params(p)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 7))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 24))
    a = unet_apply(params, TINY_UNET, x, jnp.asarray(3), ctx, jnp.asarray(20))
    b = unet_apply(loaded, TINY_UNET, x, jnp.asarray(3), ctx, jnp.asarray(20))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_unet_config_from_json(tmp_path):
    cfg = {"in_channels": 7, "out_channels": 4,
           "block_out_channels": [256, 512, 512, 1024],
           "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D",
                                "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"],
           "up_block_types": ["CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
                              "CrossAttnUpBlock2D", "UpBlock2D"],
           "layers_per_block": 2, "cross_attention_dim": 1024,
           "attention_head_dim": 8, "use_linear_projection": True,
           "class_embed_type": "timestep"}
    p = str(tmp_path / "config.json")
    with open(p, "w") as f:
        json.dump(cfg, f)
    c = unet_config_from_json(p)
    assert c.block_out_channels == (256, 512, 512, 1024)
    assert c.attention_head_dim == (8, 8, 8, 8)
    assert c.class_embed_type == "timestep"


def test_full_generate_sr_with_real_unet():
    """End-to-end SDEdit: NeRF HR render + LR GT -> VAE encode -> DDIM tail
    through the UNet with text CFG + noise-level conditioning -> VAE decode."""
    unet_params = init_unet_params(jax.random.PRNGKey(0), TINY_UNET)
    vae_params = init_vae_params(jax.random.PRNGKey(1), TINY_VAE)
    ctx_c = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 24))
    ctx_u = jnp.zeros((1, 5, 24))
    denoiser = make_unet_denoiser(unet_params, TINY_UNET, ctx_c, ctx_u)

    gcfg = GuidanceConfig(num_inference_steps=6, guidance_scale=7.5,
                          noise_level=20, latent_scale=TINY_VAE.spatial_scale)
    guidance = UpscalerGuidance(
        gcfg, denoiser,
        encode=lambda x: vae_encode(vae_params, TINY_VAE, 2.0 * x - 1.0),
        decode=lambda z: 0.5 * (vae_decode(vae_params, TINY_VAE, z) + 1.0),
    )
    lr = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 3))
    hr = jax.random.uniform(jax.random.PRNGKey(4), (1, 32, 32, 3))
    out = guidance.generate_sr(jax.random.PRNGKey(5), lr, hr, step=0)
    assert out.shape == (1, 32, 32, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= 0 and o.max() <= 1

    # image-CFG variant (guidance_scale_sr, sd_guidance_sr.py:781-798)
    gcfg2 = GuidanceConfig(num_inference_steps=4, guidance_scale=7.5,
                           guidance_scale_sr=5.0, noise_level=20)
    g2 = UpscalerGuidance(
        gcfg2, denoiser,
        encode=lambda x: vae_encode(vae_params, TINY_VAE, 2.0 * x - 1.0),
        decode=lambda z: 0.5 * (vae_decode(vae_params, TINY_VAE, z) + 1.0),
    )
    out2 = g2.generate_sr(jax.random.PRNGKey(6), lr, hr, step=0)
    assert np.isfinite(np.asarray(out2)).all()

    # SDS through the real UNet
    loss = guidance.sds_loss(jax.random.PRNGKey(7), lr, hr, step=0)
    assert np.isfinite(float(loss))


def test_flagship_config_builds():
    """The published x4-upscaler structure instantiates (shapes only; no
    forward at this size in CI)."""
    params = jax.eval_shape(
        lambda k: init_unet_params(k, SD_X4_UPSCALER_UNET), jax.random.PRNGKey(0)
    )
    # 7-channel input conv, 1024-wide mid block, 4-channel eps output
    assert params["conv_in"]["weight"].shape == (3, 3, 7, 256)
    assert params["mid_block"]["resnets"]["0"]["conv1"]["weight"].shape[-1] == 1024
    assert params["conv_out"]["weight"].shape == (3, 3, 256, 4)
    vae = jax.eval_shape(
        lambda k: init_vae_params(k, SD_X4_UPSCALER_VAE), jax.random.PRNGKey(0)
    )
    assert vae["encoder"]["conv_out"]["weight"].shape[-1] == 8  # 2 * latent(4)
    assert SD_X4_UPSCALER_VAE.spatial_scale == 4


@pytest.mark.slow
def test_sr_launcher_with_diffusion_guidance(tmp_path):
    """Full SR launch with guidance kind='diffusion' from an on-disk tiny
    checkpoint (unet+vae safetensors, configs, precomputed prompt embeds)."""
    from safetensors.numpy import save_file

    from trinerflet_tpu.sr.launch import build

    def dump(params, path):
        flat = {}

        def rec(prefix, node):
            if isinstance(node, dict):
                for k, v in node.items():
                    rec(f"{prefix}.{k}" if prefix else k, v)
            else:
                a = np.asarray(node)
                if a.ndim == 4:
                    a = np.transpose(a, (3, 2, 0, 1))
                flat[prefix] = np.ascontiguousarray(a)

        rec("", params)
        save_file(flat, path)

    root = tmp_path
    dump(init_unet_params(jax.random.PRNGKey(0), TINY_UNET), str(root / "unet.safetensors"))
    dump(init_vae_params(jax.random.PRNGKey(1), TINY_VAE), str(root / "vae.safetensors"))
    with open(root / "unet_config.json", "w") as f:
        json.dump({
            "in_channels": 7, "out_channels": 4, "block_out_channels": [16, 32],
            "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D"],
            "up_block_types": ["CrossAttnUpBlock2D", "UpBlock2D"],
            "layers_per_block": 1, "cross_attention_dim": 24,
            "attention_head_dim": 2, "norm_num_groups": 8,
            "use_linear_projection": True, "class_embed_type": "timestep",
        }, f)
    with open(root / "vae_config.json", "w") as f:
        json.dump({"in_channels": 3, "out_channels": 3, "latent_channels": 4,
                   "block_out_channels": [8, 16], "layers_per_block": 1,
                   "norm_num_groups": 4, "scaling_factor": 0.08333}, f)
    rngc = np.random.default_rng(0)
    np.savez(root / "embeds.npz",
             cond=rngc.standard_normal((1, 5, 24)).astype(np.float32),
             uncond=np.zeros((1, 5, 24), np.float32))

    cfg = {
        "data": {"synthetic": True, "num_views": 3, "lr_size": 16, "scale_ratio": 2},
        "triplane": {"channels": 4, "resolution": 32, "wavelet_scale": 2,
                     "low_res_scale": 2},
        "model": {"hidden_dim": 16, "hidden_dim_color": 16},
        "renderer": {"grid_size": 16, "max_steps": 64, "samples_per_ray_budget": 8},
        "system": {"total_steps": 4, "sr_start_step": 2, "crop_size_lr": 8,
                   "hr_fit_refresh_every": 1, "num_rays_lr": 256},
        "guidance": {
            "kind": "diffusion", "num_inference_steps": 3, "noise_level": 20,
            "weights": {
                "unet_path": str(root / "unet.safetensors"),
                "unet_config": str(root / "unet_config.json"),
                "vae_path": str(root / "vae.safetensors"),
                "vae_config": str(root / "vae_config.json"),
                "prompt_embeds": str(root / "embeds.npz"),
            },
        },
    }
    system, scene = build(cfg, str(root / "ws"))
    state = system.init_state()
    state = system.fit(state, scene, log_every=0)
    res = system.evaluate(state, scene)
    assert np.isfinite(res["PSNR_hr"]) and np.isfinite(res["PSNR_lr"])
