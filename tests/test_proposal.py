import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from trinerflet_tpu.render.renderer import RenderConfig
from trinerflet_tpu.render.proposal import (
    ProposalConfig, init_proposal_params, proposal_density, render_proposal,
    interlevel_loss,
)
from tests.test_renderer import analytic_density, analytic_color, camera_rays


@pytest.mark.e2e
class TestProposal:
    def setup_method(self):
        self.cfg = RenderConfig(bound=1.0, num_steps=64)
        self.pcfg = ProposalConfig(num_proposal_samples=48, num_final_samples=24)
        self.params = init_proposal_params(jax.random.PRNGKey(0), self.pcfg)

    def test_render_shapes(self):
        o, d = camera_rays(16)
        out = render_proposal(analytic_density, analytic_color, self.params,
                              o, d, self.cfg, self.pcfg, bg_color=0.0)
        assert out["image"].shape == (16, 3)
        assert out["prop_weights"].shape == (16, 48)
        assert np.isfinite(np.asarray(out["image"])).all()

    def test_proposal_learns_and_concentrates_samples(self):
        """Train the proposal proxy with the interlevel loss; samples must
        concentrate around the sphere surface and the render must approach
        the dense reference."""
        o, d = camera_rays(32)
        opt = optax.adam(5e-3)
        params = self.params
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, rng):
            def loss_fn(p):
                out = render_proposal(analytic_density, analytic_color, p,
                                      o, d, self.cfg, self.pcfg,
                                      rng=rng, bg_color=0.0, perturb=True)
                return interlevel_loss(out)
            l, g = jax.value_and_grad(loss_fn)(params)
            up, opt_state2 = opt.update(g, opt_state)
            return optax.apply_updates(params, up), opt_state2, l

        rng = jax.random.PRNGKey(1)
        first = None
        for i in range(300):
            rng, k = jax.random.split(rng)
            params, opt_state, l = step(params, opt_state, k)
            if first is None:
                first = float(l)
        assert float(l) < 0.5 * first, (first, float(l))

        out = render_proposal(analytic_density, analytic_color, params,
                              o, d, self.cfg, self.pcfg, bg_color=0.0)
        from trinerflet_tpu.render.renderer import render_dense
        dense_cfg = RenderConfig(bound=1.0, num_steps=256)
        ref = render_dense(analytic_density, analytic_color, o, d, dense_cfg, bg_color=0.0)
        # center (sphere-crossing) rays must match the dense render closely
        xs = np.linspace(-0.9, 0.9, 32)
        core = np.abs(xs) < 0.4
        np.testing.assert_allclose(
            np.asarray(out["image"])[core], np.asarray(ref["image"])[core], atol=0.05
        )

    def test_density_proxy_gradients(self):
        pts = jax.random.uniform(jax.random.PRNGKey(2), (64, 3), minval=-1, maxval=1)
        g = jax.grad(lambda p: proposal_density(p, pts, self.pcfg, 1.0).sum())(self.params)
        assert float(jnp.abs(g["w"]).sum()) > 0


@pytest.mark.e2e
class TestProposalTrainerPath:
    def test_trainer_fits_with_proposal_renderer(self):
        import numpy as np
        from trinerflet_tpu.data.synthetic import make_synthetic_scene
        from trinerflet_tpu.models.nerf import NeRFConfig
        from trinerflet_tpu.models.triplane import TriplaneConfig
        from trinerflet_tpu.render.renderer import RenderConfig
        from trinerflet_tpu.train.trainer import Trainer, TrainConfig

        scene = make_synthetic_scene(num_views=6, H=32, W=32, num_steps=48)
        tr = Trainer(
            NeRFConfig(triplane=TriplaneConfig(channels=4, resolution=32,
                                               wavelet_scale=2),
                       bound=1.0, hidden_dim=16, hidden_dim_color=16),
            RenderConfig(bound=1.0, grid_size=16),
            TrainConfig(iters=60, num_rays=256, renderer="proposal",
                        proposal_samples=32, proposal_final=16,
                        wavelet_regularization=0.0, eval_chunk=1024),
        )
        state = tr.init_state()
        assert "proposal" in state.params
        losses = []
        tr_state = state
        data = tr.scene_to_device(scene)
        for _ in range(60):
            tr_state, aux = tr._train_step(tr_state, data)
            losses.append(float(aux["loss"]))
        assert "interlevel" in aux
        assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.7
        img, _ = tr.render_image(tr_state.params, tr_state.occ,
                                 scene.poses[0], scene.intrinsics, 32, 32)
        assert np.isfinite(img).all()

    def test_cli_estimator_mapping(self):
        from trinerflet_tpu.cli import build_configs, get_params

        opt = get_params(["--nerfacc_renderer", "--nerfacc_estimator", "proposal",
                          "--triplane_wavelet", "--iters", "1",
                          "--triplane_resolution", "32",
                          "--triplane_wavelet_levels", "2"])
        import copy
        o = copy.deepcopy(opt)
        for k in ("iters", "num_rays", "triplane_resolution",
                  "triplane_wavelet_levels", "downscale", "warmup_steps", "lr",
                  "wavelet_regularization", "upscale_ratio_bound",
                  "upscale_levels"):
            setattr(o, k, getattr(opt, k)[0])
        _, _, tc = build_configs(o)
        assert tc.renderer == "proposal"
