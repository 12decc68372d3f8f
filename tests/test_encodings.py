import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trinerflet_tpu.models.gridencoder import GridEncoderConfig, init_grid_params, grid_encode
from trinerflet_tpu.models.encodings import get_encoder, KPlanesConfig
from trinerflet_tpu.models.nerf import NeRFConfig, NeRFField, init_nerf_params
from trinerflet_tpu.models.triplane import TriplaneConfig


class TestGridEncoder:
    def test_shapes_and_level_sizes(self):
        cfg = GridEncoderConfig(num_levels=8, level_dim=2, base_resolution=16,
                                desired_resolution=512, log2_hashmap_size=15)
        assert cfg.level_resolution(0) == 16
        # torch-ngp's ceil arithmetic gives 512 or 513 at the top level
        assert cfg.level_resolution(7) in (512, 513)
        # early levels dense, late levels capped by the hashmap
        assert cfg.level_size(0) == 17**3
        assert cfg.level_size(7) == 2**15
        params = init_grid_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (100, 3), minval=-1, maxval=1)
        out = grid_encode(params, x, cfg)
        assert out.shape == (100, cfg.output_dim)
        assert np.isfinite(np.asarray(out)).all()

    def test_interpolation_continuity(self):
        """Features must vary continuously: nearby points -> nearby features."""
        cfg = GridEncoderConfig(num_levels=4, base_resolution=8, desired_resolution=64,
                                log2_hashmap_size=14)
        params = init_grid_params(jax.random.PRNGKey(0), cfg, std=1.0)
        x = jnp.asarray([[0.3, -0.2, 0.5]])
        d = grid_encode(params, x, cfg)
        d2 = grid_encode(params, x + 1e-4, cfg)
        assert float(jnp.abs(d - d2).max()) < 0.05

    def test_gradients_reach_tables(self):
        cfg = GridEncoderConfig(num_levels=4, base_resolution=8, desired_resolution=64,
                                log2_hashmap_size=12)
        params = init_grid_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1, maxval=1)
        g = jax.grad(lambda p: grid_encode(p, x, cfg).sum())(params)
        for lvl, gv in g.items():
            assert float(jnp.abs(gv).sum()) > 0, lvl

    def test_smoothstep(self):
        cfg = GridEncoderConfig(num_levels=2, base_resolution=8, desired_resolution=16,
                                interpolation="smoothstep", log2_hashmap_size=12)
        params = init_grid_params(jax.random.PRNGKey(0), cfg)
        out = grid_encode(params, jnp.zeros((4, 3)), cfg)
        assert np.isfinite(np.asarray(out)).all()


class TestFactory:
    @pytest.mark.parametrize("name,dim_check", [
        ("frequency", lambda d: d == 3 + 2 * 3 * 4),
        ("sphere_harmonics", lambda d: d == 16),
        ("hashgrid", lambda d: d == 32),
        ("k_planes", lambda d: d == 48),
        ("multiscale_k_planes_mul", lambda d: d == 48),
    ])
    def test_dispatch(self, name, dim_check):
        params, apply_fn, dim = get_encoder(name, jax.random.PRNGKey(0))
        assert dim_check(dim), dim
        x = jax.random.uniform(jax.random.PRNGKey(1), (10, 3), minval=-0.9, maxval=0.9)
        out = apply_fn(params, x)
        assert out.shape == (10, dim)

    def test_unknown_raises(self):
        with pytest.raises(ValueError, match="unknown encoding"):
            get_encoder("bogus", jax.random.PRNGKey(0))


class TestHashgridField:
    def test_field_with_hashgrid_trains(self):
        """NeRFField with encoding='hashgrid' (the reference's non-triplane
        default) must produce finite outputs and gradients."""
        cfg = NeRFConfig(
            encoding="hashgrid",
            grid=GridEncoderConfig(num_levels=8, desired_resolution=256,
                                   log2_hashmap_size=15),
            bound=1.0, hidden_dim=32, hidden_dim_color=32,
        )
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        field = NeRFField(cfg)
        planes = field.build_planes(params)
        assert planes == {}
        x = jax.random.uniform(jax.random.PRNGKey(1), (50, 3), minval=-1, maxval=1)
        d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)

        def loss(p):
            s, c = field(p, {}, x, d)
            return s.sum() + c.sum()

        g = jax.grad(loss)(params)
        assert float(jnp.abs(g["encoder"]["level_0"]).sum()) > 0
        assert float(jnp.abs(g["sigma_net"]["w0"]).sum()) > 0


class TestGridEncoderBackward:
    def test_blocked_backward_matches_xla_scatter(self):
        """The custom_vjp (batched-corner gather + blocked scatter-add) must
        reproduce plain jnp.take autodiff gradients exactly in fp32."""
        from trinerflet_tpu.models.gridencoder import (
            GridEncoderConfig, _index, grid_encode, init_grid_params,
        )

        cfg = GridEncoderConfig(num_levels=4, level_dim=2, base_resolution=4,
                                desired_resolution=32, log2_hashmap_size=10)
        params = init_grid_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3), minval=-1, maxval=1)

        def loss(p):
            return jnp.sum(jnp.sin(3.0 * grid_encode(p, x, cfg)))

        g = jax.grad(loss)(params)

        # reference: identical math with plain autodiff gathers
        import numpy as _np

        def ref_encode(p):
            N, D = x.shape
            u = jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)
            corners = _np.stack(_np.meshgrid(*([_np.array([0, 1])] * D),
                                             indexing="ij"), -1).reshape(-1, D)
            outs = []
            for l in range(cfg.num_levels):
                res = cfg.level_resolution(l)
                size = cfg.level_size(l)
                pos = u * res
                p0 = jnp.floor(pos).astype(jnp.int32)
                frac = pos - p0
                acc = 0.0
                for c in corners:
                    ci = jnp.asarray(c, jnp.int32)
                    w = jnp.prod(jnp.where(ci > 0, frac, 1.0 - frac), -1)
                    idx = _index(jnp.clip(p0 + ci, 0, res), res, size, cfg)
                    acc = acc + w[:, None] * jnp.take(p[f"level_{l}"], idx, axis=0)
                outs.append(acc)
            return jnp.concatenate(outs, -1)

        out_new = grid_encode(params, x, cfg)
        out_ref = ref_encode(params)
        np.testing.assert_allclose(np.asarray(out_new), np.asarray(out_ref),
                                   atol=1e-6)
        g_ref = jax.grad(lambda p: jnp.sum(jnp.sin(3.0 * ref_encode(p))))(params)
        for k in params:
            np.testing.assert_allclose(np.asarray(g[k]), np.asarray(g_ref[k]),
                                       atol=1e-5, err_msg=k)
