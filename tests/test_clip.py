"""CLIP guidance (--rand_pose): golden parity vs transformers + train wiring.

The vision/text towers are pinned against a tiny RANDOM-weight
``transformers.CLIPModel`` — the same library that executes real published
ViT-B/16 checkpoints — so any layout mismatch (patch-embed flattening,
pre/post LN, pooled-output indexing, projection transpose) fails here
without shipping weights. Reference behavior: reconstruction/nerf/
clip_utils.py:11-63 + utils.py:500-552.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trinerflet_tpu.sr.text import TextConfig
from trinerflet_tpu.utils.clip_loss import (
    CLIPLoss, VisionConfig, image_features, init_clip_params,
    state_dict_to_tree, text_features, vision_encode,
)

VCFG = VisionConfig(image_size=32, patch_size=8, hidden_size=16, num_layers=2,
                    num_heads=2, intermediate_size=32, projection_dim=12,
                    hidden_act="quick_gelu")
TCFG = TextConfig(vocab_size=64, hidden_size=16, num_layers=2, num_heads=2,
                  intermediate_size=32, max_length=16, hidden_act="quick_gelu")


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    cfg = transformers.CLIPConfig(
        text_config=dict(vocab_size=TCFG.vocab_size, hidden_size=TCFG.hidden_size,
                         num_hidden_layers=TCFG.num_layers,
                         num_attention_heads=TCFG.num_heads,
                         intermediate_size=TCFG.intermediate_size,
                         max_position_embeddings=TCFG.max_length,
                         eos_token_id=TCFG.vocab_size - 1),
        vision_config=dict(hidden_size=VCFG.hidden_size,
                           num_hidden_layers=VCFG.num_layers,
                           num_attention_heads=VCFG.num_heads,
                           intermediate_size=VCFG.intermediate_size,
                           image_size=VCFG.image_size, patch_size=VCFG.patch_size),
        projection_dim=VCFG.projection_dim,
    )
    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg).eval()
    params = state_dict_to_tree({k: v.numpy() for k, v in model.state_dict().items()})
    return model, params


class TestGoldenParity:
    def test_image_features_match_transformers(self, hf_pair):
        import torch

        model, params = hf_pair
        rng = np.random.default_rng(1)
        imgs = rng.standard_normal((2, VCFG.image_size, VCFG.image_size, 3)).astype(np.float32)
        with torch.no_grad():
            ref = model.get_image_features(torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
        ref = ref / ref.norm(dim=-1, keepdim=True)
        ours = image_features(params, VCFG, jnp.asarray(imgs))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)

    def test_text_features_match_transformers(self, hf_pair):
        import torch

        model, params = hf_pair
        # EOS (= max id, vocab-1) mid-sequence: pooled output must index it
        toks = np.array([[5, 9, 3, 63, 0, 0, 0, 0],
                         [7, 63, 0, 0, 0, 0, 0, 0]], np.int64)
        with torch.no_grad():
            ref = model.get_text_features(torch.from_numpy(toks))
        ref = ref / ref.norm(dim=-1, keepdim=True)
        ours = text_features(params, TCFG, jnp.asarray(toks.astype(np.int32)))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)

    def test_vision_encode_jits(self, hf_pair):
        _, params = hf_pair
        f = jax.jit(lambda im: vision_encode(params, VCFG, im))
        out = f(jnp.zeros((1, 32, 32, 3)))
        assert out.shape == (1, 16) and bool(jnp.isfinite(out).all())


class TestCLIPLoss:
    def test_loss_and_gradient(self):
        params = init_clip_params(jax.random.PRNGKey(0), VCFG, TCFG)
        loss = CLIPLoss(params=params, vision_cfg=VCFG, text_cfg=TCFG)
        loss.prepare_text(["x"], tokens=np.array([[1, 4, 63, 0]], np.int32))
        imgs = jnp.full((1, 48, 48, 3), 0.5)
        val, g = jax.value_and_grad(lambda im: loss(im))(imgs)
        assert np.isfinite(float(val))
        assert float(jnp.abs(g).max()) > 0

    def test_requires_weights_or_fn(self):
        with pytest.raises(NotImplementedError):
            CLIPLoss()


@pytest.mark.e2e
class TestRandPoseTraining:
    def test_clip_step_updates_params(self):
        from trinerflet_tpu.models.nerf import NeRFConfig
        from trinerflet_tpu.models.triplane import TriplaneConfig
        from trinerflet_tpu.render.renderer import RenderConfig
        from trinerflet_tpu.train.trainer import Trainer, TrainConfig

        nerf_cfg = NeRFConfig(
            triplane=TriplaneConfig(channels=4, resolution=32, wavelet_scale=2),
            bound=1.0)
        render_cfg = RenderConfig(bound=1.0, grid_size=16, density_thresh=0.01,
                                  max_steps=32, samples_per_ray_budget=8)
        train_cfg = TrainConfig(lr=1e-2, iters=3, num_rays=256,
                                renderer="occgrid")
        trainer = Trainer(nerf_cfg, render_cfg, train_cfg)
        params = init_clip_params(jax.random.PRNGKey(0), VCFG, TCFG)
        clip = CLIPLoss(params=params, vision_cfg=VCFG, text_cfg=TCFG)
        clip.prepare_text(["x"], tokens=np.array([[1, 4, 63, 0]], np.int32))
        trainer.set_clip_guidance(clip, rand_pose_interval=1)
        assert trainer.clip_hw == (16, 16)

        state = trainer.init_state()
        state = trainer._update_grid(state, full=True)
        before = np.asarray(state.params["encoder"]["base"])
        state2, clip_l = trainer.clip_guidance_step(state)
        assert np.isfinite(float(clip_l))
        after = np.asarray(state2.params["encoder"]["base"])
        assert np.abs(after - before).max() > 0
        assert int(state2.step) == int(1)

    def test_fit_interleaves_clip_steps(self):
        from trinerflet_tpu.data.synthetic import make_synthetic_scene
        from trinerflet_tpu.models.nerf import NeRFConfig
        from trinerflet_tpu.models.triplane import TriplaneConfig
        from trinerflet_tpu.render.renderer import RenderConfig
        from trinerflet_tpu.train.trainer import Trainer, TrainConfig

        nerf_cfg = NeRFConfig(
            triplane=TriplaneConfig(channels=4, resolution=32, wavelet_scale=2),
            bound=1.0)
        render_cfg = RenderConfig(bound=1.0, grid_size=16, density_thresh=0.01,
                                  max_steps=32, samples_per_ray_budget=8)
        train_cfg = TrainConfig(lr=1e-2, iters=4, num_rays=256,
                                renderer="occgrid")
        trainer = Trainer(nerf_cfg, render_cfg, train_cfg)
        trainer.set_clip_guidance(
            CLIPLoss(loss_fn=lambda im: jnp.mean(im ** 2)), 1)
        scene = make_synthetic_scene(num_views=2, H=24, W=24, num_steps=16)
        state = trainer.init_state()
        state = trainer.fit(state, scene, log_every=0)
        # 4 iters at interval 1 -> clip steps on it = 1, 3; supervised and
        # clip steps both advance the counter: 4 + 2 = 6
        assert int(state.step) == 6
