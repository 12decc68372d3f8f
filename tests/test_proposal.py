import numpy as np
import jax
import jax.numpy as jnp
import optax

from trinerflet_tpu.render.renderer import RenderConfig
from trinerflet_tpu.render.proposal import (
    ProposalConfig, init_proposal_params, proposal_density, render_proposal,
    interlevel_loss,
)
from tests.test_renderer import analytic_density, analytic_color, camera_rays


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
