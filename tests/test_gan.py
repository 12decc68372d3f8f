"""Taming-GAN stack (utils/gan.py) — counterpart of the reference's
super_resolution/threestudio/utils/GAN/ + gan_volume_renderer.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trinerflet_tpu.utils import gan as G


class TestDiagonalGaussian:
    def test_kl_closed_form_standard_normal(self):
        rng = np.random.default_rng(0)
        mean = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
        logvar = rng.uniform(-1, 1, (2, 4, 4, 3)).astype(np.float32)
        d = G.DiagonalGaussian(jnp.concatenate(
            [jnp.asarray(mean), jnp.asarray(logvar)], axis=-1))
        want = 0.5 * (mean**2 + np.exp(logvar) - 1.0 - logvar).sum(axis=(1, 2, 3))
        np.testing.assert_allclose(np.asarray(d.kl()), want, rtol=1e-5)

    def test_kl_self_is_zero_and_sample_stats(self):
        mean = jnp.ones((1, 2, 2, 2)) * 3.0
        logvar = jnp.zeros((1, 2, 2, 2))
        d = G.DiagonalGaussian(jnp.concatenate([mean, logvar], axis=-1))
        np.testing.assert_allclose(np.asarray(d.kl(d)), 0.0, atol=1e-6)
        s = jnp.stack([d.sample(jax.random.PRNGKey(i)) for i in range(200)])
        assert abs(float(s.mean()) - 3.0) < 0.1
        np.testing.assert_allclose(np.asarray(d.mode()), np.asarray(mean))

    def test_nll_matches_gaussian_formula(self):
        d = G.DiagonalGaussian(jnp.concatenate(
            [jnp.zeros((1, 2, 2, 1)), jnp.zeros((1, 2, 2, 1))], axis=-1))
        x = jnp.ones((1, 2, 2, 1))
        want = 0.5 * (np.log(2 * np.pi) + 1.0) * 4
        np.testing.assert_allclose(float(d.nll(x)[0]), want, rtol=1e-5)


class TestDiscriminator:
    def test_patch_logits_shape_and_grads(self):
        p = G.init_discriminator(jax.random.PRNGKey(0), input_nc=3,
                                 ndf=16, n_layers=3)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
        y = G.discriminator_apply(p, x)
        # torch NLayerDiscriminator law (4x4 convs, pad 1): stem s2 + 2
        # stride-2 + 1 stride-1 inner + stride-1 out:
        # 64 -> 32 -> 16 -> 8 -> 7 -> 6 patches
        assert y.shape == (2, 6, 6, 1)
        g = jax.grad(lambda pp: G.discriminator_apply(pp, x).sum())(p)
        assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(g))

    def test_loss_identities(self):
        lr = jnp.asarray([2.0, -1.0])
        lf = jnp.asarray([0.5, -3.0])
        # hinge: 0.5*(mean(relu(1-lr)) + mean(relu(1+lf)))
        want = 0.5 * ((0.0 + 2.0) / 2 + (1.5 + 0.0) / 2)
        np.testing.assert_allclose(float(G.hinge_d_loss(lr, lf)), want, rtol=1e-6)
        v = float(G.vanilla_d_loss(lr, lf))
        want_v = 0.5 * (np.mean(np.log1p(np.exp(-np.asarray(lr))))
                        + np.mean(np.log1p(np.exp(np.asarray(lf)))))
        np.testing.assert_allclose(v, want_v, rtol=1e-5)

    def test_generator_and_discriminator_losses_oppose(self):
        p = G.init_discriminator(jax.random.PRNGKey(0), ndf=8, n_layers=2)
        real = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
        fake = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
        gl = G.generator_loss(p, fake)
        dl = G.discriminator_loss(p, real, fake)
        assert np.isfinite(float(gl)) and np.isfinite(float(dl))
        # discriminator loss never backprops into the images (stop_gradient)
        gi = jax.grad(lambda f: G.discriminator_loss(p, real, f))(fake)
        np.testing.assert_allclose(np.asarray(gi), 0.0)
        # generator loss DOES
        gg = jax.grad(lambda f: G.generator_loss(p, f))(fake)
        assert float(jnp.abs(gg).sum()) > 0

    def test_adopt_weight_gate(self):
        assert float(G.adopt_weight(2.0, jnp.asarray(5), threshold=10)) == 0.0
        assert float(G.adopt_weight(2.0, jnp.asarray(15), threshold=10)) == 2.0


CFG = G.GANConfig(ch=16, ch_enc=8, ch_mult=(1, 2), num_res_blocks=1,
                  z_channels=2, in_channels=3 + 2, global_code_dim=8,
                  disc_ndf=8, disc_layers=2, groups=8)


class TestEncoderDecoder:
    def test_encoder_downsamples_to_moments(self):
        p = G.init_taming_encoder(jax.random.PRNGKey(0), CFG, in_channels=3)
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
        m = G.taming_encoder_apply(p, CFG, x)
        assert m.shape == (1, 16, 16, 2 * CFG.z_channels)

    def test_decoder_upsamples_with_global_code(self):
        p = G.init_taming_decoder(jax.random.PRNGKey(0), CFG)
        z = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, CFG.in_channels))
        code = jax.random.normal(jax.random.PRNGKey(2), (1, CFG.global_code_dim))
        y = G.taming_decoder_apply(p, CFG, z, code)
        assert y.shape == (1, 32, 32, 3)
        # the global code actually conditions the output
        y2 = G.taming_decoder_apply(p, CFG, z, code + 1.0)
        assert float(jnp.abs(y - y2).max()) > 1e-6

    def test_global_encoder_contract(self):
        p = G.init_global_encoder(jax.random.PRNGKey(0), n_class=8, width=8)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
        code = G.global_encoder_apply(p, x)
        assert code.shape == (2, 8)


class TestGanRender:
    @pytest.mark.parametrize("level", [0, 1, 2])
    def test_levels(self, level):
        params = G.init_gan_stack(jax.random.PRNGKey(0), CFG)
        lr = jax.random.uniform(jax.random.PRNGKey(1),
                                (1, 16, 16, 3 + 2 * CFG.z_channels))
        gt = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
        out = G.gan_render(params, CFG, lr, jax.random.PRNGKey(3),
                           gt_rgb=gt, generator_level=level)
        assert out["comp_gan_rgb"].shape == (1, 32, 32, 3)
        assert out["comp_lr_rgb"].shape == (1, 16, 16, 3)
        assert np.isfinite(np.asarray(out["comp_gan_rgb"])).all()
        assert float(out["posterior_kl"].sum()) >= 0

    def test_adversarial_roundtrip_trains(self):
        """One generator step + one discriminator step both produce finite,
        nonzero gradients through the full stack."""
        params = G.init_gan_stack(jax.random.PRNGKey(0), CFG)
        lr = jax.random.uniform(jax.random.PRNGKey(1),
                                (1, 16, 16, 3 + 2 * CFG.z_channels))
        gt = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))

        def g_loss(gen_params):
            p = dict(params, generator=gen_params)
            out = G.gan_render(p, CFG, lr, jax.random.PRNGKey(3), gt_rgb=gt)
            rec = jnp.abs(out["comp_gan_rgb"] - gt).mean()
            adv = G.generator_loss(params["discriminator"], out["comp_gan_rgb"])
            return rec + 1e-3 * adv

        gg = jax.grad(g_loss)(params["generator"])
        leaves = jax.tree.leaves(gg)
        assert all(np.isfinite(np.asarray(v)).all() for v in leaves)
        assert sum(float(jnp.abs(v).sum()) for v in leaves) > 0

        out = G.gan_render(params, CFG, lr, jax.random.PRNGKey(3), gt_rgb=gt)

        def d_loss(dp):
            return G.discriminator_loss(dp, gt, out["comp_gan_rgb"])

        gd = jax.grad(d_loss)(params["discriminator"])
        leaves = jax.tree.leaves(gd)
        assert all(np.isfinite(np.asarray(v)).all() for v in leaves)
        assert sum(float(jnp.abs(v).sum()) for v in leaves) > 0
