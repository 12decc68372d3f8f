"""Text-to-image prior for 3D generation (VERDICT r2 missing #4).

The reference generation system refines with a text-to-image diffusion model
(trinerflet_text_to_3d.py:42-140 via threestudio's DeepFloyd/SD guidance),
not the x4 upscaler: refinement must depend only on (render, prompt). These
tests pin that semantics with a tiny random-weight t2i UNet.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trinerflet_tpu.sr.diffusion import (
    SD2_TEXT2IMG_UNET, UNetConfig, init_unet_params, make_text2img_denoiser,
)
from trinerflet_tpu.sr.guidance import GuidanceConfig, Text2ImgGuidance

TINY_T2I = UNetConfig(
    in_channels=4, out_channels=4,
    block_out_channels=(16, 32),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1, cross_attention_dim=24,
    attention_head_dim=(2, 2), norm_num_groups=8,
    use_linear_projection=True, class_embed_type=None,
)


@pytest.fixture(scope="module")
def guidance():
    params = init_unet_params(jax.random.PRNGKey(0), TINY_T2I)
    ctx_c = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 24))
    ctx_u = jnp.zeros((1, 5, 24))
    den = make_text2img_denoiser(params, TINY_T2I, ctx_c, ctx_u)
    # identity encode/decode: "latents" = 4-ch; use rgb padded path instead —
    # keep it simple with a 4-channel pseudo-latent by repeating a channel
    enc = lambda x: jnp.concatenate([2.0 * x - 1.0, jnp.zeros_like(x[..., :1])], -1)
    dec = lambda z: 0.5 * (z[..., :3] + 1.0)
    cfg = GuidanceConfig(num_inference_steps=5, guidance_scale=7.5, noise_level=20)
    return Text2ImgGuidance(cfg, den, encode=enc, decode=dec)


class TestText2ImgGuidance:
    def test_generate_ignores_lr_conditioning(self, guidance):
        rng = jax.random.PRNGKey(3)
        hr = jax.random.uniform(jax.random.PRNGKey(4), (1, 16, 16, 3))
        lr_a = jnp.zeros((1, 4, 4, 3))
        lr_b = jnp.ones((1, 4, 4, 3))
        out_a = guidance.generate_sr(rng, lr_a, hr, step=0, ignore_t=600)
        out_b = guidance.generate_sr(rng, lr_b, hr, step=0, ignore_t=600)
        assert out_a.shape == (1, 16, 16, 3)
        o = np.asarray(out_a)
        assert np.isfinite(o).all() and o.min() >= 0 and o.max() <= 1
        # a text-to-image prior sees only (render, prompt)
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))

    def test_text_cfg_changes_output(self, guidance):
        import dataclasses

        rng = jax.random.PRNGKey(3)
        hr = jax.random.uniform(jax.random.PRNGKey(4), (1, 16, 16, 3))
        lr = jnp.zeros((1, 4, 4, 3))
        out_hi = guidance.generate_sr(rng, lr, hr, step=0, ignore_t=600)
        g2 = Text2ImgGuidance(
            dataclasses.replace(guidance.cfg, guidance_scale=1.0),
            guidance.denoiser, encode=guidance.encode, decode=guidance.decode)
        out_lo = g2.generate_sr(rng, lr, hr, step=0, ignore_t=600)
        assert float(jnp.abs(out_hi - out_lo).max()) > 1e-5

    def test_sds_loss_gradient(self, guidance):
        hr = jax.random.uniform(jax.random.PRNGKey(4), (1, 16, 16, 3))
        lr = jnp.zeros((1, 4, 4, 3))

        def f(x):
            return guidance.sds_loss(jax.random.PRNGKey(5), lr, x,
                                     t_bounds=jnp.asarray([100, 500]))

        val, g = jax.value_and_grad(f)(hr)
        assert np.isfinite(float(val))
        assert float(jnp.abs(g).max()) > 0

    def test_sd2_flagship_config_builds(self):
        params = jax.eval_shape(
            lambda k: init_unet_params(k, SD2_TEXT2IMG_UNET), jax.random.PRNGKey(0))
        assert params["conv_in"]["weight"].shape == (3, 3, 4, 320)
        assert "class_embedding" not in params
        assert params["conv_out"]["weight"].shape == (3, 3, 320, 4)


@pytest.mark.e2e
class TestTextTo3DWithT2IPrior:
    def test_generation_rounds_run(self, guidance, tmp_path):
        from trinerflet_tpu.models.nerf import NeRFConfig
        from trinerflet_tpu.models.triplane import TriplaneConfig
        from trinerflet_tpu.render.renderer import RenderConfig
        from trinerflet_tpu.sr.text_to_3d import TextTo3DConfig, TextTo3DSystem

        nerf_cfg = NeRFConfig(
            triplane=TriplaneConfig(channels=4, resolution=32, wavelet_scale=2),
            bound=1.0, hidden_dim=16, hidden_dim_color=16)
        render_cfg = RenderConfig(bound=1.0, grid_size=16, max_steps=32,
                                  samples_per_ray_budget=8)
        cfg = TextTo3DConfig(total_steps=6, views_per_refresh=2,
                             refresh_every=4, render_size=16, num_rays=64,
                             eval_chunk=1024)
        sys_ = TextTo3DSystem(nerf_cfg, render_cfg, cfg, guidance)
        state = sys_.init_state()
        losses = []
        state = sys_.fit(state, log_every=0,
                         callback=lambda s, a: losses.append(float(a["loss"])))
        assert len(losses) == 6
        assert np.isfinite(losses).all()


@pytest.mark.e2e
def test_generation_launcher_with_t2i_checkpoint(tmp_path):
    """Launcher 'system.kind: generation' + 'guidance.kind: text2img' builds a
    TextTo3DSystem from an on-disk tiny t2i checkpoint and runs rounds
    (reference launch.py --train with the trinerflet-generation system)."""
    import json

    from safetensors.numpy import save_file

    from trinerflet_tpu.sr.diffusion import VAEConfig, init_vae_params
    from trinerflet_tpu.sr.launch import build
    from trinerflet_tpu.sr.text_to_3d import TextTo3DSystem

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
    tiny_vae = VAEConfig(block_out_channels=(8, 16), latent_channels=4,
                         layers_per_block=1, norm_num_groups=4)
    dump(init_unet_params(jax.random.PRNGKey(0), TINY_T2I), str(root / "unet.safetensors"))
    dump(init_vae_params(jax.random.PRNGKey(1), tiny_vae), str(root / "vae.safetensors"))
    with open(root / "unet_config.json", "w") as f:
        json.dump({
            "in_channels": 4, "out_channels": 4, "block_out_channels": [16, 32],
            "down_block_types": ["CrossAttnDownBlock2D", "DownBlock2D"],
            "up_block_types": ["UpBlock2D", "CrossAttnUpBlock2D"],
            "layers_per_block": 1, "cross_attention_dim": 24,
            "attention_head_dim": 2, "norm_num_groups": 8,
            "use_linear_projection": True,
        }, f)
    with open(root / "vae_config.json", "w") as f:
        json.dump({"in_channels": 3, "out_channels": 3, "latent_channels": 4,
                   "block_out_channels": [8, 16], "layers_per_block": 1,
                   "norm_num_groups": 4, "scaling_factor": 0.18215}, f)
    rngc = np.random.default_rng(0)
    np.savez(root / "embeds.npz",
             cond=rngc.standard_normal((1, 5, 24)).astype(np.float32),
             uncond=np.zeros((1, 5, 24), np.float32))

    cfg = {
        "triplane": {"channels": 4, "resolution": 32, "wavelet_scale": 2,
                     "low_res_scale": 2},
        "model": {"hidden_dim": 16, "hidden_dim_color": 16},
        "renderer": {"grid_size": 16, "max_steps": 32,
                     "samples_per_ray_budget": 8},
        "system": {"kind": "generation", "total_steps": 5,
                   "views_per_refresh": 2, "refresh_every": 3,
                   "render_size": 16, "num_rays": 64, "eval_chunk": 1024},
        "guidance": {
            "kind": "text2img", "num_inference_steps": 3,
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
    assert isinstance(system, TextTo3DSystem)
    assert scene is None
    state = system.init_state()
    losses = []
    state = system.fit(state, log_every=0,
                       callback=lambda s, a: losses.append(float(a["loss"])))
    assert len(losses) == 5 and np.isfinite(losses).all()
