import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trinerflet_tpu.models.triplane import (
    TriplaneConfig, init_triplane_params, build_planes, sample_triplane,
    wavelet_l1, grow_params, get_levels,
)
from trinerflet_tpu.models.nerf import NeRFConfig, NeRFField, init_nerf_params


def small_cfg(**kw):
    d = dict(channels=4, resolution=64, wavelet_scale=4, wavelet_type="bior6.8")
    d.update(kw)
    return TriplaneConfig(**d)


class TestTriplane:
    def test_param_shapes_match_reference_arithmetic(self):
        """512-res, 8-scale (3 levels): base 64^2, yh 64/128/256 — the shapes
        the reference's dummy-DWT init produces (triplane_encoder.py:188-206)."""
        cfg = TriplaneConfig(channels=16, resolution=512, wavelet_scale=8)
        p = init_triplane_params(jax.random.PRNGKey(0), cfg)
        assert p["base"].shape == (3, 16, 64, 64)
        assert p["wavelets"]["level_0"].shape == (3, 16, 3, 64, 64)
        assert p["wavelets"]["level_1"].shape == (3, 16, 3, 128, 128)
        assert p["wavelets"]["level_2"].shape == (3, 16, 3, 256, 256)

    def test_build_planes_full_resolution(self):
        cfg = small_cfg()
        p = init_triplane_params(jax.random.PRNGKey(0), cfg)
        planes = build_planes(p, cfg)
        assert planes["full"].shape == (3, 64, 64, 4)

    def test_build_planes_max_resolution_truncates(self):
        cfg = small_cfg()
        p = init_triplane_params(jax.random.PRNGKey(0), cfg)
        planes = build_planes(p, cfg, max_resolution=32)
        assert planes["full"].shape[1] == 32

    def test_current_scale_freezes_finest_levels(self):
        cfg = small_cfg(current_scale=2)
        p = init_triplane_params(jax.random.PRNGKey(0), cfg)
        assert len(p["wavelets"]) == cfg.levels - get_levels(2)
        planes = build_planes(p, cfg)  # missing levels filled with zeros
        assert planes["full"].shape == (3, 64, 64, 4)

    def test_dual_resolution_snapshots(self):
        cfg = small_cfg(low_res_scale=4, high_res_scale=1)
        p = init_triplane_params(jax.random.PRNGKey(0), cfg)
        planes = build_planes(p, cfg)
        assert planes["low_res"].shape == (3, 16, 16, 4)
        assert planes["full"].shape == (3, 64, 64, 4)

    def test_sampling_shapes_and_gradients(self):
        cfg = small_cfg()
        p = init_triplane_params(jax.random.PRNGKey(1), cfg)

        def f(p):
            planes = build_planes(p, cfg)
            coords = jnp.asarray([[0.1, -0.5, 0.7], [0.0, 0.0, 0.0]], jnp.float32)
            return sample_triplane(planes, coords, cfg).sum()

        g = jax.grad(f)(p)
        # gradient must reach base plane AND every learnable wavelet level
        assert float(jnp.abs(g["base"]).sum()) > 0
        for k, v in g["wavelets"].items():
            assert float(jnp.abs(v).sum()) > 0, k

    def test_plane_projection_constant_along_normal(self):
        """Each plane's contribution must be invariant along its normal axis."""
        cfg = small_cfg()
        p = init_triplane_params(jax.random.PRNGKey(2), cfg)
        planes = build_planes(p, cfg)
        a = sample_triplane(planes, jnp.asarray([[0.3, -0.8, 0.2]]), cfg)
        b = sample_triplane(planes, jnp.asarray([[0.3, 0.5, 0.2]]), cfg)
        # plane 0 spans (x, z): its C features identical when only y changes
        C = cfg.channels
        np.testing.assert_allclose(np.asarray(a)[0, :C], np.asarray(b)[0, :C], atol=1e-6)

    def test_upscale_mode(self):
        cfg = small_cfg(upscale_ratio_bound=0.5, upscale_levels=2)
        p = init_triplane_params(jax.random.PRNGKey(0), cfg)
        assert p["upscale"]["level_0"].shape == (3, 4, 3, 32, 32)
        assert p["upscale"]["level_1"].shape == (3, 4, 3, 32, 32)
        planes = build_planes(p, cfg)
        assert planes["upscale_0"].shape == (3, 64, 64, 4)
        # inner point routed to finest nested plane; outer to base
        out = sample_triplane(
            planes, jnp.asarray([[0.05, 0.0, 0.0], [0.9, 0.9, 0.9]]), cfg
        )
        assert out.shape == (2, 12)

    def test_wavelet_l1_matches_reference_formula(self):
        cfg = small_cfg()
        p = init_triplane_params(jax.random.PRNGKey(0), cfg)
        p["wavelets"] = {k: jnp.ones_like(v) for k, v in p["wavelets"].items()}
        levels = [p["wavelets"][f"level_{i}"] for i in range(len(p["wavelets"]))]
        total = sum(v.size for v in levels)
        expect = sum(1.0 * v.size / total for v in levels) / len(levels)
        got = float(wavelet_l1(p, cfg))
        np.testing.assert_allclose(got, expect, rtol=1e-6)

    def test_grow_params_carries_overlapping_levels(self):
        """Stage 512/8 -> 1024/16 keeps base + levels 0..2 (utils.py:1482-1487)."""
        c1 = TriplaneConfig(channels=4, resolution=512, wavelet_scale=8)
        c2 = TriplaneConfig(channels=4, resolution=1024, wavelet_scale=16)
        p1 = init_triplane_params(jax.random.PRNGKey(0), c1)
        p1["wavelets"]["level_0"] = p1["wavelets"]["level_0"] + 3.0
        p2 = grow_params(p1, c1, c2, jax.random.PRNGKey(1))
        np.testing.assert_array_equal(np.asarray(p2["base"]), np.asarray(p1["base"]))
        np.testing.assert_array_equal(
            np.asarray(p2["wavelets"]["level_0"]), np.asarray(p1["wavelets"]["level_0"])
        )
        assert p2["wavelets"]["level_3"].shape == (3, 4, 3, 512, 512)


class TestNeRFField:
    def _field(self):
        cfg = NeRFConfig(triplane=small_cfg(), bound=1.0)
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        return NeRFField(cfg), params

    def test_forward_shapes_and_ranges(self):
        field, params = self._field()
        planes = field.build_planes(params)
        x = jax.random.uniform(jax.random.PRNGKey(1), (100, 3), minval=-1, maxval=1)
        d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        sigma, rgb = field(params, planes, x, d)
        assert sigma.shape == (100,)
        assert rgb.shape == (100, 3)
        assert (np.asarray(sigma) >= 0).all()
        assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()

    def test_density_blob(self):
        cfg = NeRFConfig(triplane=small_cfg(), density_blob_scale=5.0, density_blob_std=0.2)
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        field = NeRFField(cfg)
        planes = field.build_planes(params)
        s_center, _ = field.density(params, planes, jnp.zeros((1, 3)))
        s_edge, _ = field.density(params, planes, jnp.asarray([[0.95, 0.95, 0.95]]))
        assert np.isfinite(float(s_center[0])) and np.isfinite(float(s_edge[0]))

    def test_bfloat16_compute(self):
        cfg = NeRFConfig(triplane=small_cfg(), compute_dtype="bfloat16")
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        field = NeRFField(cfg)
        planes = field.build_planes(params)
        x = jnp.zeros((8, 3))
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (8, 1))
        sigma, rgb = field(params, planes, x, d)
        assert sigma.dtype == jnp.float32  # density always f32 out of trunc_exp
        assert np.isfinite(np.asarray(rgb)).all()

    def test_background_net(self):
        cfg = NeRFConfig(triplane=small_cfg(), bg_radius=1.5)
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        field = NeRFField(cfg)
        sph = jnp.zeros((4, 2))
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1))
        rgb = field.background(params, sph, d)
        assert rgb.shape == (4, 3)


class TestLearnedTransform:
    """Learned rotation + lbound zoom variants (reference
    triplane_encoder.py:335-362, :304-312)."""

    def _setup(self):
        from trinerflet_tpu.models.triplane import (
            TriplaneConfig, init_triplane_params, build_planes, sample_triplane)
        import jax, jax.numpy as jnp

        cfg = TriplaneConfig(channels=4, resolution=32, wavelet_scale=2,
                             learned_rotation=True, lbound_auto_scale=True)
        params = init_triplane_params(jax.random.PRNGKey(0), cfg)
        params["base"] = jax.random.normal(jax.random.PRNGKey(1),
                                           params["base"].shape)
        planes = build_planes(params, cfg)
        return cfg, params, planes, sample_triplane

    def test_identity_transform_matches_plain(self):
        import jax, jax.numpy as jnp
        import numpy as np
        import dataclasses

        cfg, params, planes, sample = self._setup()
        pts = jax.random.uniform(jax.random.PRNGKey(2), (64, 3), minval=-0.9,
                                 maxval=0.9)
        with_t = sample(planes, pts, cfg, enc_params=params)
        plain_cfg = dataclasses.replace(cfg, learned_rotation=False,
                                        lbound_auto_scale=False)
        plain = sample(planes, pts, plain_cfg)
        np.testing.assert_allclose(np.asarray(with_t), np.asarray(plain),
                                   atol=1e-5)

    def test_rotation_changes_features_and_gets_grads(self):
        import jax, jax.numpy as jnp
        import numpy as np

        cfg, params, planes, sample = self._setup()
        pts = jax.random.uniform(jax.random.PRNGKey(3), (64, 3), minval=-0.5,
                                 maxval=0.5)

        def loss(p):
            return (sample(planes, pts, cfg, enc_params=p) ** 2).sum()

        g = jax.grad(loss)(params)
        assert float(jnp.abs(g["rotation"]).max()) > 0
        assert float(jnp.abs(g["lbound_scale"])) > 0
        # a 90-degree z-rotation permutes the sampled field
        rot = dict(params)
        rot["rotation"] = jnp.asarray([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
        a = sample(planes, pts, cfg, enc_params=params)
        b = sample(planes, pts, cfg, enc_params=rot)
        assert float(jnp.abs(a - b).max()) > 1e-3

    def test_grow_preserves_transform_params(self):
        import jax
        import numpy as np
        import dataclasses
        from trinerflet_tpu.models.triplane import grow_params

        cfg, params, _, _ = self._setup()
        import jax.numpy as jnp
        params["rotation"] = jnp.asarray([0.9, 0.1, 0.2, 0.3])
        new_cfg = dataclasses.replace(cfg, resolution=64, wavelet_scale=4)
        newp = grow_params(params, cfg, new_cfg, jax.random.PRNGKey(4))
        np.testing.assert_allclose(np.asarray(newp["rotation"]),
                                   np.asarray(params["rotation"]))
        assert "lbound_scale" in newp


class TestCornerSampler:
    def test_matches_exact_sampler_and_grads(self):
        import jax, jax.numpy as jnp
        import numpy as np
        from trinerflet_tpu.ops.grid_sample import (
            grid_sample_2d, grid_sample_2d_corner, grid_sample_2d_quad)

        rng = np.random.default_rng(0)
        plane = jnp.asarray(rng.standard_normal((16, 24, 4)), jnp.float32)
        coords = jnp.asarray(rng.uniform(-1.1, 1.1, (300, 2)), jnp.float32)
        a = grid_sample_2d(plane, coords)
        b = grid_sample_2d_corner(plane, coords)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

        def loss(fn, p):
            return (fn(p, coords) ** 2).sum()

        ga = jax.grad(lambda p: loss(grid_sample_2d, p))(plane)
        gb = jax.grad(lambda p: loss(grid_sample_2d_corner, p))(plane)
        gq = jax.grad(lambda p: loss(grid_sample_2d_quad, p))(plane)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gq), atol=1e-4)

    def test_triplane_dispatch_by_resolution(self):
        import dataclasses
        import jax, jax.numpy as jnp
        import numpy as np
        from trinerflet_tpu.models.triplane import (
            TriplaneConfig, init_triplane_params, build_planes, sample_triplane)

        cfg = TriplaneConfig(channels=4, resolution=64, wavelet_scale=2,
                             quad_max_resolution=32)  # forces corner path
        params = init_triplane_params(jax.random.PRNGKey(0), cfg)
        params["base"] = jax.random.normal(jax.random.PRNGKey(1),
                                           params["base"].shape)
        planes = build_planes(params, cfg)
        pts = jax.random.uniform(jax.random.PRNGKey(2), (128, 3), minval=-0.9,
                                 maxval=0.9)
        a = sample_triplane(planes, pts, cfg)
        b = sample_triplane(planes, pts, dataclasses.replace(cfg, quad_max_resolution=4096))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestBf16PlaneLadder:
    """plane_dtype=bfloat16 runs the IDWT ladder itself in bf16 (PERF.md:
    f32 ladder 23.6 ms fwd+bwd vs 6.8 bf16 at bench scale) — pin that the
    cheap ladder stays numerically close to the f32 one and that gradients
    still reach the f32 master params."""

    def _field(self, dtype):
        cfg = NeRFConfig(
            triplane=small_cfg(wavelet_scale=2),
            bound=1.0, compute_dtype="bfloat16", plane_dtype=dtype,
        )
        field = NeRFField(cfg)
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        params["encoder"]["base"] = 0.5 * jax.random.normal(
            jax.random.PRNGKey(1), params["encoder"]["base"].shape)
        params["encoder"]["wavelets"]["level_0"] = 0.1 * jax.random.normal(
            jax.random.PRNGKey(2), params["encoder"]["wavelets"]["level_0"].shape)
        return field, params

    def test_bf16_ladder_matches_f32_ladder(self):
        fb, pb = self._field("bfloat16")
        ff, pf = self._field("float32")
        planes_b = fb.build_planes(pb)["full"].astype(jnp.float32)
        planes_f = ff.build_planes(pf)["full"]
        scale = float(jnp.abs(planes_f).max())
        err = float(jnp.abs(planes_b - planes_f).max())
        assert err <= 0.02 * scale, (err, scale)

    def test_bf16_ladder_grads_reach_f32_masters(self):
        field, params = self._field("bfloat16")

        def loss(p):
            return field.build_planes(p)["full"].astype(jnp.float32).sum()

        g = jax.grad(loss)(params)
        ge = g["encoder"]
        assert ge["base"].dtype == jnp.float32
        assert ge["wavelets"]["level_0"].dtype == jnp.float32
        assert float(jnp.abs(ge["base"]).max()) > 0
        assert float(jnp.abs(ge["wavelets"]["level_0"]).max()) > 0
