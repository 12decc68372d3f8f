"""Geometry/material/background registry (threestudio zoo counterparts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trinerflet_tpu.models.nerf import NeRFConfig, NeRFField
from trinerflet_tpu.models.registry import (
    RegistryField, VolumeGridConfig, make_field, sample_volume_grid,
    init_volume_grid, background_textured, init_textured_bg,
)
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.render import renderer as R

CFG = NeRFConfig(
    triplane=TriplaneConfig(channels=4, resolution=32, wavelet_scale=2),
    bound=1.0, geo_feat_dim=7, sh_degree=2, hidden_dim=16, hidden_dim_color=16,
)


def test_unknown_names_raise():
    with pytest.raises(ValueError):
        RegistryField(CFG, geometry="nope")
    with pytest.raises(ValueError):
        RegistryField(CFG, material="nope")
    with pytest.raises(ValueError):
        RegistryField(CFG, background="nope")


def test_default_triple_is_fused_nerf_field():
    init, field = make_field(CFG)
    assert isinstance(field, NeRFField)
    p = init(jax.random.PRNGKey(0))
    assert "sigma_net" in p and "color_net" in p


def test_volume_grid_trilinear_exact():
    cfg = VolumeGridConfig(resolution=8, feature_dim=3)
    params = init_volume_grid(jax.random.PRNGKey(1), cfg)
    grid = np.asarray(params["grid"])
    R_ = cfg.resolution
    # cell-center (= grid node) queries return the node value exactly
    ii = np.array([[0, 0, 0], [3, 5, 2], [7, 7, 7]])
    x = (ii / (R_ - 1) - 0.5) * 2.0  # node i -> world coord
    out = np.asarray(sample_volume_grid(params, jnp.asarray(x, jnp.float32), cfg, 1.0))
    ref = grid[ii[:, 0], ii[:, 1], ii[:, 2]]
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)
    # random points match a manual trilinear blend
    rng = np.random.default_rng(0)
    xr = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    q = np.clip((xr * 0.5 + 0.5) * (R_ - 1), 0, R_ - 1 - 1e-6)
    q0 = np.floor(q).astype(int)
    f = q - q0
    ref = np.zeros((64, 4), np.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (np.where(dx, f[:, 0], 1 - f[:, 0])
                     * np.where(dy, f[:, 1], 1 - f[:, 1])
                     * np.where(dz, f[:, 2], 1 - f[:, 2]))
                ref += w[:, None] * grid[np.minimum(q0[:, 0] + dx, R_ - 1),
                                         np.minimum(q0[:, 1] + dy, R_ - 1),
                                         np.minimum(q0[:, 2] + dz, R_ - 1)]
    out = np.asarray(sample_volume_grid(params, jnp.asarray(xr), cfg, 1.0))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_textured_background_constant_texture():
    params = init_textured_bg(jax.random.PRNGKey(0), height=8, width=16)
    params["bg_texture"] = jnp.full((8, 16, 3), 0.5)
    d = jnp.asarray(np.random.default_rng(0).standard_normal((32, 3)), jnp.float32)
    out = np.asarray(background_textured(params, d))
    np.testing.assert_allclose(out, jax.nn.sigmoid(0.5), rtol=1e-5)


def test_env_map_background_is_view_dependent():
    field = RegistryField(CFG, background="neural-environment-map-background")
    p = field.init_params(jax.random.PRNGKey(2))
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]], jnp.float32)
    out = np.asarray(field.background(p, d))
    assert out.shape == (2, 3)
    assert np.abs(out[0] - out[1]).max() > 1e-6


@pytest.mark.parametrize("background", [
    "solid-color-background", "textured-background"])
def test_volume_grid_field_trains_through_renderer(background):
    field = RegistryField(
        CFG, geometry="volume-grid", material="no-material",
        background=background,
        grid_cfg=VolumeGridConfig(resolution=16, feature_dim=7),
    )
    params = field.init_params(jax.random.PRNGKey(3))
    assert "sigma_net" not in params

    rcfg = R.RenderConfig(bound=1.0, grid_size=16, max_steps=64,
                          samples_per_ray_budget=8, dt_gamma=0.0,
                          march="flat", num_steps=64, bg_radius=2.0)
    occ = jnp.ones((1, 16, 16, 16), bool)
    rng = np.random.default_rng(1)
    o = jnp.asarray(np.tile([[0.0, 0.0, -0.9]], (32, 1)), jnp.float32)
    dd = rng.standard_normal((32, 3)) * 0.1 + np.array([0, 0, 1.0])
    dd = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True), jnp.float32)
    gt = jnp.asarray(rng.uniform(0.3, 0.7, (32, 3)), jnp.float32)

    def loss_fn(p):
        planes = field.build_planes(p)
        out = R.render_occgrid(
            lambda x, d: field(p, planes, x, d), o, dd, occ, rcfg,
            bg_fn=lambda sph, d: field.background(p, d))
        return jnp.mean((out["image"] - gt) ** 2)

    l0, g = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(l0))
    assert float(jnp.abs(g["encoder"]["grid"]).max()) > 0
    p2 = jax.tree.map(lambda a, b: a - 10.0 * b, params, g)
    l1 = float(loss_fn(p2))
    assert l1 < float(l0)


# ---------------------------------------------------------------------------
# Geometry normals (reference implicit_volume.py:48-51, :141-218)
# ---------------------------------------------------------------------------


class TestNormals:
    def _field(self, normal_type, **kw):
        return RegistryField(CFG, material="diffuse-with-point-light-material",
                             normal_type=normal_type, **kw)

    def test_fd_and_analytic_agree_on_smooth_field(self):
        """VERDICT done-criterion: finite-difference and analytic normals
        agree where the field is smooth. The triplane is piecewise-BILINEAR
        (texel cell = 2/(res-1)), so the comparison samples near cell centers
        with eps small enough that the forward difference never crosses a
        texel boundary — there the FD slope equals the exact-sampler gradient
        up to the MLP's (rare) ReLU kinks."""
        cell = 2.0 / (CFG.triplane.resolution - 1)
        fd = self._field("finite_difference", fd_normal_eps=0.05 * cell)
        an = self._field("analytic")
        params = fd.init_params(jax.random.PRNGKey(0))
        # non-trivial encoder: random base plane
        params["encoder"]["base"] = 0.5 * jax.random.normal(
            jax.random.PRNGKey(1), params["encoder"]["base"].shape)
        planes = fd.build_planes(params)
        rng = np.random.default_rng(2)
        centers = (rng.integers(5, CFG.triplane.resolution - 5, (256, 3))
                   + 0.5) * cell - 1.0
        x = jnp.asarray(
            centers + rng.uniform(-0.2, 0.2, (256, 3)) * cell, jnp.float32)
        n_fd = np.asarray(fd.normal(params, planes, x))
        n_an = np.asarray(an.normal(params, planes, x))
        cos = (n_fd * n_an).sum(-1)
        assert np.quantile(cos, 0.1) > 0.95, np.sort(cos)[:10]
        assert np.median(cos) > 0.99
        np.testing.assert_allclose(np.linalg.norm(n_an, axis=-1), 1.0, atol=1e-4)

    def test_laplacian_stencil_matches_fd_on_smooth_field(self):
        fd = self._field("finite_difference", fd_normal_eps=0.02)
        lp = self._field("finite_difference_laplacian", fd_normal_eps=0.02)
        params = fd.init_params(jax.random.PRNGKey(0))
        params["encoder"]["base"] = 0.5 * jax.random.normal(
            jax.random.PRNGKey(1), params["encoder"]["base"].shape)
        planes = fd.build_planes(params)
        x = jnp.asarray(
            np.random.default_rng(3).uniform(-0.7, 0.7, (128, 3)), jnp.float32)
        cos = (np.asarray(fd.normal(params, planes, x))
               * np.asarray(lp.normal(params, planes, x))).sum(-1)
        assert np.median(cos) > 0.95

    def test_pred_normals_shape_and_unit_norm(self):
        f = self._field("pred")
        params = f.init_params(jax.random.PRNGKey(0))
        assert "normal_net" in params
        planes = f.build_planes(params)
        x = jnp.zeros((16, 3))
        n = np.asarray(f.normal(params, planes, x))
        assert n.shape == (16, 3)
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)

    def test_analytic_normal_on_volume_grid(self):
        """volume-grid geometry: FD normals point away from a density bump."""
        f = RegistryField(CFG, geometry="volume-grid",
                          material="diffuse-with-point-light-material",
                          normal_type="finite_difference", fd_normal_eps=0.05)
        params = f.init_params(jax.random.PRNGKey(0))
        R_ = f.grid_cfg.resolution
        # radial density bump at the origin -> normals ~ +x_hat direction
        idx = np.stack(np.meshgrid(*[np.arange(R_)] * 3, indexing="ij"), -1)
        world = idx / (R_ - 1) * 2 - 1
        dens = 5.0 * np.exp(-(world**2).sum(-1) / 0.3)
        grid = np.array(params["encoder"]["grid"])
        grid[..., 0] = dens
        params["encoder"]["grid"] = jnp.asarray(grid)
        x = jnp.asarray([[0.5, 0.0, 0.0], [0.0, -0.5, 0.0]], jnp.float32)
        n = np.asarray(f.normal(params, {}, x))
        assert n[0, 0] > 0.9    # outward +x
        assert n[1, 1] < -0.9   # outward -y


class TestDiffuseMaterial:
    def test_shading_modes(self):
        from trinerflet_tpu.models.registry import material_diffuse_point_light

        feats = jnp.asarray([[2.0, 0.0, -2.0, 0.5]])
        x = jnp.asarray([[0.0, 0.0, 0.0]])
        n = jnp.asarray([[1.0, 0.0, 0.0]])
        light = jnp.asarray([2.0, 0.0, 0.0])  # straight along the normal
        albedo = np.asarray(material_diffuse_point_light(
            feats, x, n, light, shading="albedo"))
        np.testing.assert_allclose(
            albedo[0], [1 / (1 + np.exp(-2)), 0.5, 1 / (1 + np.exp(2))],
            rtol=1e-5)
        tex = np.asarray(material_diffuse_point_light(
            feats, x, n, light, shading="textureless"))
        np.testing.assert_allclose(tex[0], 0.9 + 0.1, rtol=1e-5)  # lambert=1
        dif = np.asarray(material_diffuse_point_light(
            feats, x, n, light, shading="diffuse"))
        np.testing.assert_allclose(dif[0], albedo[0] * 1.0, rtol=1e-5)
        # light orthogonal to the normal -> ambient only
        side = np.asarray(material_diffuse_point_light(
            feats, x, n, jnp.asarray([0.0, 2.0, 0.0]), shading="textureless"))
        np.testing.assert_allclose(side[0], 0.1, rtol=1e-5)

    def test_diffuse_field_renders_through_occgrid(self):
        f = RegistryField(CFG, material="diffuse-with-point-light-material",
                          normal_type="finite_difference")
        params = f.init_params(jax.random.PRNGKey(0))
        planes = f.build_planes(params)
        rcfg = R.RenderConfig(bound=1.0, grid_size=16, max_steps=64,
                              samples_per_ray_budget=8)
        occ = jnp.ones((1, 16, 16, 16), bool)
        o = jnp.asarray(np.tile([[0.0, 0.0, -0.9]], (16, 1)), jnp.float32)
        d = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (16, 1)), jnp.float32)
        out = R.render_occgrid(lambda x, dd: f(params, planes, x, dd),
                               o, d, occ, rcfg, bg_color=0.0)
        img = np.asarray(out["image"])
        assert img.shape == (16, 3) and np.isfinite(img).all()

    def test_color_without_positions_raises(self):
        f = RegistryField(CFG, material="diffuse-with-point-light-material")
        params = f.init_params(jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="positions"):
            f.color(params, jnp.zeros((4, 3)), jnp.zeros((4, CFG.geo_feat_dim)))


class TestImplicitSDF:
    """implicit-sdf geometry (reference implicit_sdf.py): sdf/feature heads,
    sphere bias, Laplace-density bridge, outward normals."""

    def _field(self, **kw):
        from trinerflet_tpu.models.registry import SDFConfig

        return RegistryField(CFG, geometry="implicit-sdf",
                             material="no-material",
                             sdf_cfg=SDFConfig(sdf_bias="sphere",
                                               sdf_bias_params=(0.5,)),
                             **kw)

    def test_sphere_bias_shapes_init_sdf(self):
        f = self._field()
        params = f.init_params(jax.random.PRNGKey(0))
        assert "sdf_net" in params and "feature_net" in params
        assert "sigma_net" not in params
        planes = f.build_planes(params)
        # at init the MLP output is near 0 -> sdf ~ |x| - 0.5
        x = jnp.asarray([[0.0, 0.0, 0.0], [0.9, 0.0, 0.0], [0.5, 0.0, 0.0]])
        s = np.asarray(f.sdf(params, planes, x))
        assert s[0] < -0.2          # deep inside
        assert s[1] > 0.2           # outside
        assert abs(s[2]) < 0.25     # near the surface
        # density follows: high inside, ~0 outside
        sig, feats = f.density(params, planes, x)
        sig = np.asarray(sig)
        assert sig[0] > 3.0 and sig[1] < 0.5
        assert feats.shape == (3, CFG.geo_feat_dim)

    def test_normals_point_outward(self):
        f = self._field(normal_type="finite_difference", fd_normal_eps=0.02)
        params = f.init_params(jax.random.PRNGKey(1))
        planes = f.build_planes(params)
        x = jnp.asarray([[0.5, 0.0, 0.0], [0.0, -0.5, 0.0], [0.0, 0.0, 0.5]])
        n = np.asarray(f.normal(params, planes, x))
        assert n[0, 0] > 0.9 and n[1, 1] < -0.9 and n[2, 2] > 0.9

    def test_fd_vs_analytic_sdf_normals(self):
        fd = self._field(normal_type="finite_difference", fd_normal_eps=0.005)
        an = self._field(normal_type="analytic")
        params = fd.init_params(jax.random.PRNGKey(2))
        params["encoder"]["base"] = 0.3 * jax.random.normal(
            jax.random.PRNGKey(3), params["encoder"]["base"].shape)
        planes = fd.build_planes(params)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.uniform(-0.6, 0.6, (128, 3)), jnp.float32)
        cos = (np.asarray(fd.normal(params, planes, x))
               * np.asarray(an.normal(params, planes, x))).sum(-1)
        assert np.median(cos) > 0.95

    def test_trains_through_renderer(self):
        f = self._field()
        params = f.init_params(jax.random.PRNGKey(5))
        rcfg = R.RenderConfig(bound=1.0, grid_size=16, max_steps=64,
                              samples_per_ray_budget=8, dt_gamma=0.0,
                              march="flat", num_steps=64)
        occ = jnp.ones((1, 16, 16, 16), bool)
        o = jnp.asarray(np.tile([[0.0, 0.0, -0.9]], (32, 1)), jnp.float32)
        rng = np.random.default_rng(6)
        dd = rng.standard_normal((32, 3)) * 0.1 + np.array([0, 0, 1.0])
        dd = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True),
                         jnp.float32)
        gt = jnp.asarray(rng.uniform(0.3, 0.7, (32, 3)), jnp.float32)

        def loss_fn(p):
            planes = f.build_planes(p)
            out = R.render_occgrid(lambda x, d: f(p, planes, x, d), o, dd,
                                   occ, rcfg)
            return jnp.mean((out["image"] - gt) ** 2)

        l0, g = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(l0))
        assert float(jnp.abs(g["sdf_net"]["w0"]).max()) > 0
        assert float(jnp.abs(g["log_beta"])) >= 0
        p2 = jax.tree.map(lambda a, b: a - 2.0 * b, params, g)
        assert float(loss_fn(p2)) < float(l0)
