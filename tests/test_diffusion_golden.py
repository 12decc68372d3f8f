"""Golden fixtures for the SD x4-upscaler stack (VERDICT r2 item 7).

No pretrained weights ship in this offline image, so two guards protect the
loaders against real checkpoints:

1. **Pinned numerics**: a tiny config exercising every published x4-upscaler
   feature (linear transformer projection, noise-level class embedding,
   cross-attention down AND up blocks at >=2 scales, VAE mid-attention) is
   run with deterministic seeds/inputs and compared against committed
   constants. Any layout/arith change to the UNet/VAE/text forward — the
   kind a diffusers-weight mismatch would hide — fails here.
2. **Key-set manifest**: tests/fixtures/sd_x4_upscaler_manifest.json pins
   the full flagship param trees (690 UNet / 204 VAE / 372 text tensors,
   torch-layout shapes, diffusers state-dict names). The manifest must match
   `init_*_params` exactly (catches structural drift), and a synthesized
   state dict with exactly those keys must load and drive
   `jax.eval_shape(unet_apply)` at the published size.

Reference: stable_diffusion_guidance_sr.py:94-97 (pipeline components);
diffusers-0.16 state-dict layout.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trinerflet_tpu.sr.diffusion import (
    SD_X4_UPSCALER_UNET,
    SD_X4_UPSCALER_VAE,
    UNetConfig,
    VAEConfig,
    init_unet_params,
    init_vae_params,
    unet_apply,
    vae_decode,
    vae_encode,
)
from trinerflet_tpu.sr.text import TextConfig, init_text_params, text_encode

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "sd_x4_upscaler_manifest.json")

GOLDEN_UNET = UNetConfig(
    in_channels=7, out_channels=4,
    block_out_channels=(16, 24, 32),
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
    layers_per_block=1, cross_attention_dim=24,
    attention_head_dim=(2, 2, 2), norm_num_groups=8,
    use_linear_projection=True, class_embed_type="timestep",
)
GOLDEN_VAE = VAEConfig(block_out_channels=(8, 16), latent_channels=4,
                       layers_per_block=1, norm_num_groups=4, mid_attention=True)


class TestPinnedNumerics:
    def test_unet_golden(self):
        params = init_unet_params(jax.random.PRNGKey(42), GOLDEN_UNET)
        x = jnp.sin(jnp.arange(16 * 16 * 7, dtype=jnp.float32).reshape(1, 16, 16, 7) * 0.01)
        ctx = jnp.cos(jnp.arange(5 * 24, dtype=jnp.float32).reshape(1, 5, 24) * 0.1)
        eps = np.asarray(unet_apply(params, GOLDEN_UNET, x, jnp.asarray(17),
                                    ctx, jnp.asarray(20)))
        assert eps.shape == (1, 16, 16, 4)
        np.testing.assert_allclose(eps.mean(), 0.00306712, atol=1e-4)
        np.testing.assert_allclose(eps.std(), 0.28958881, atol=1e-4)
        probe = eps[0, ::6, ::6, 0].ravel()
        np.testing.assert_allclose(
            probe,
            [0.039277, 0.353449, 0.19665, 0.322213, 0.833767, -0.008001,
             0.338623, 0.534867, 0.283517],
            atol=1e-3)

    def test_vae_golden(self):
        params = init_vae_params(jax.random.PRNGKey(7), GOLDEN_VAE)
        img = jnp.sin(jnp.arange(32 * 32 * 3, dtype=jnp.float32).reshape(1, 32, 32, 3) * 0.01)
        z = vae_encode(params, GOLDEN_VAE, img)
        zn = np.asarray(z)
        np.testing.assert_allclose(zn.mean(), -0.00382482, atol=1e-5)
        np.testing.assert_allclose(zn.std(), 0.01618996, atol=1e-5)
        dec = np.asarray(vae_decode(params, GOLDEN_VAE, z))
        probe = dec[0, ::12, ::12, 0].ravel()
        np.testing.assert_allclose(
            probe,
            [-0.118719, -0.004287, -0.005527, -0.16355, 0.066849, 0.14313,
             -0.192323, -0.694318, 1.125405],
            atol=1e-3)

    def test_text_golden(self):
        tcfg = TextConfig(vocab_size=64, hidden_size=16, num_layers=2,
                          num_heads=2, intermediate_size=32, max_length=8,
                          hidden_act="gelu")
        params = init_text_params(jax.random.PRNGKey(3), tcfg)
        toks = jnp.asarray([[1, 5, 9, 63, 0, 0, 0, 0]], jnp.int32)
        h = np.asarray(text_encode(params, tcfg, toks))
        np.testing.assert_allclose(h.std(), 0.99994600, atol=1e-4)
        np.testing.assert_allclose(
            h[0, 3, :6],
            [0.763739, -1.810459, 0.413179, 1.46407, -0.765769, 1.207298],
            atol=1e-3)


def _flatten_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        name = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten_shapes(v, name))
        else:
            shape = list(v.shape)
            if len(shape) == 4:  # HWIO -> torch OIHW
                shape = [shape[3], shape[2], shape[0], shape[1]]
            out[name] = shape
    return out


@pytest.fixture(scope="module")
def manifest():
    with open(FIXTURE) as f:
        return json.load(f)


class TestManifest:
    @pytest.mark.parametrize("component,builder", [
        ("unet", lambda k: init_unet_params(k, SD_X4_UPSCALER_UNET)),
        ("vae", lambda k: init_vae_params(k, SD_X4_UPSCALER_VAE)),
        ("text_encoder", lambda k: init_text_params(k, TextConfig())),
    ])
    def test_flagship_tree_matches_manifest(self, manifest, component, builder):
        tree = jax.eval_shape(builder, jax.random.PRNGKey(0))
        flat = _flatten_shapes(tree)
        want = manifest[component]
        assert set(flat) == set(want), (
            sorted(set(flat) ^ set(want))[:10])
        for k, s in flat.items():
            assert s == want[k], (k, s, want[k])

    def test_synthesized_checkpoint_loads_and_runs(self, manifest):
        """A state dict with exactly the manifest's keys nests through the
        loader transform and drives the flagship UNet shape-correct."""
        def nest(flat_shapes):
            tree = {}
            for name, shape in flat_shapes.items():
                s = shape
                if len(s) == 4:  # loader transposes OIHW -> HWIO
                    s = [s[2], s[3], s[1], s[0]]
                node = tree
                parts = name.split(".")
                for p in parts[:-1]:
                    node = node.setdefault(p, {})
                node[parts[-1]] = jax.ShapeDtypeStruct(tuple(s), jnp.float32)
            return tree

        params = nest(manifest["unet"])
        out = jax.eval_shape(
            lambda p, x, ctx: unet_apply(p, SD_X4_UPSCALER_UNET, x,
                                         jnp.asarray(17), ctx, jnp.asarray(20)),
            params,
            jax.ShapeDtypeStruct((1, 64, 64, 7), jnp.float32),
            jax.ShapeDtypeStruct((1, 77, 1024), jnp.float32),
        )
        assert out.shape == (1, 64, 64, 4)

        vae = nest(manifest["vae"])
        z = jax.eval_shape(
            lambda p, x: vae_encode(p, SD_X4_UPSCALER_VAE, x),
            vae, jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32))
        assert z.shape == (1, 16, 16, 4)
        dec = jax.eval_shape(
            lambda p, x: vae_decode(p, SD_X4_UPSCALER_VAE, x), vae, z)
        assert dec.shape == (1, 64, 64, 3)
