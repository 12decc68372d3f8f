import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from trinerflet_tpu.render import renderer as R


def analytic_density(pts):
    """Soft sphere of radius 0.5 at origin, sigma ~ 30 inside."""
    d = jnp.linalg.norm(pts, axis=-1)
    sigma = 30.0 * jax.nn.sigmoid((0.5 - d) / 0.02)
    geo = jnp.zeros(pts.shape[:-1] + (1,))
    return sigma, geo


def analytic_color(dirs, geo):
    return jnp.broadcast_to(jnp.asarray([0.8, 0.4, 0.2]), dirs.shape[:-1] + (3,))


def analytic_field(xyzs, dirs):
    sigma, _ = analytic_density(xyzs)
    return sigma, analytic_color(dirs, None)


def camera_rays(n=64):
    """n rays from z=-2 toward +z; half hit the sphere, half miss."""
    xs = np.linspace(-0.9, 0.9, n).astype(np.float32)
    o = np.stack([xs, np.zeros(n, np.float32), np.full(n, -2.0, np.float32)], -1)
    d = np.broadcast_to(np.asarray([0, 0, 1.0], np.float32), (n, 3)).copy()
    return jnp.asarray(o), jnp.asarray(d)


class TestDensePath:
    def test_sphere_silhouette(self):
        cfg = R.RenderConfig(bound=1.0, num_steps=256, upsample_steps=0)
        o, d = camera_rays()
        out = R.render_dense(analytic_density, analytic_color, o, d, cfg, bg_color=0.0)
        ws = np.asarray(out["weights_sum"])
        xs = np.linspace(-0.9, 0.9, 64)
        assert (ws[np.abs(xs) < 0.4] > 0.95).all()   # through the sphere: opaque
        assert (ws[np.abs(xs) > 0.6] < 0.05).all()   # misses: transparent
        img = np.asarray(out["image"])
        np.testing.assert_allclose(img[32], [0.8, 0.4, 0.2], atol=0.02)

    def test_upsample_path_runs(self):
        cfg = R.RenderConfig(bound=1.0, num_steps=64, upsample_steps=64)
        o, d = camera_rays(16)
        out = R.render_dense(analytic_density, analytic_color, o, d, cfg,
                             rng=jax.random.PRNGKey(0), bg_color=0.0, perturb=True)
        assert np.isfinite(np.asarray(out["image"])).all()

    def test_background_blend(self):
        cfg = R.RenderConfig(bound=1.0, num_steps=64)
        o, d = camera_rays(8)
        out = R.render_dense(analytic_density, analytic_color, o, d, cfg, bg_color=1.0)
        img = np.asarray(out["image"])
        # miss rays = pure background
        np.testing.assert_allclose(img[0], [1, 1, 1], atol=0.02)

    def test_occ_mask_dense_suppresses_unoccupied_density(self):
        """occ_mask_dense zeroes sigma outside occupied cells: with an
        all-empty grid every ray composites to pure background; with the
        field-derived grid the render matches the unmasked dense render
        (diagnostic knob for the quality protocol's cross-render check)."""
        cfg = R.RenderConfig(bound=1.0, grid_size=32, num_steps=256,
                             density_thresh=0.5, occ_mask_dense=True)
        o, d = camera_rays(16)
        empty = jnp.zeros((cfg.cascades, 32, 32, 32), bool)
        out = R.render_dense(analytic_density, analytic_color, o, d, cfg,
                             bg_color=1.0, occ=empty)
        np.testing.assert_allclose(np.asarray(out["image"]),
                                   np.ones((16, 3)), atol=1e-5)
        state = R.init_occupancy(cfg)
        state = R.update_density_grid(
            state, lambda p: analytic_density(p)[0], jax.random.PRNGKey(0), cfg)
        masked = R.render_dense(analytic_density, analytic_color, o, d, cfg,
                                bg_color=0.0, occ=state.occ)
        plain = R.render_dense(analytic_density, analytic_color, o, d,
                               dataclasses.replace(cfg, occ_mask_dense=False),
                               bg_color=0.0)
        # the threshold clips the soft sphere's sub-thresh skirt, so
        # silhouette-edge rays differ slightly; interior/miss rays match
        np.testing.assert_allclose(np.asarray(masked["image"]),
                                   np.asarray(plain["image"]), atol=0.06)
        xs = np.linspace(-0.9, 0.9, 16)
        inner = np.abs(xs) < 0.3
        np.testing.assert_allclose(np.asarray(masked["image"])[inner],
                                   np.asarray(plain["image"])[inner], atol=0.005)


class TestOccgridPath:
    def _occ_from_field(self, cfg):
        state = R.init_occupancy(cfg)
        return R.update_density_grid(
            state, lambda p: analytic_density(p)[0], jax.random.PRNGKey(0), cfg
        )

    def test_matches_dense_path(self):
        """Occgrid render must closely match the dense reference on the same
        analytic field (quality-parity anchor for the fast path)."""
        cfg = R.RenderConfig(bound=1.0, grid_size=64, num_steps=512,
                             max_steps=512, samples_per_ray_budget=220,
                             density_thresh=0.5)
        occ = self._occ_from_field(cfg)
        assert float(occ.occ.sum()) > 0
        o, d = camera_rays(32)
        dense = R.render_dense(analytic_density, analytic_color, o, d, cfg, bg_color=0.0)
        fast = R.render_occgrid(analytic_field, o, d, occ.occ, cfg, bg_color=0.0)
        # occupancy culling legitimately drops the faint silhouette halo the
        # dense path integrates (density below the grid threshold), so the
        # edge rays may differ by up to the culled density's contribution.
        np.testing.assert_allclose(
            np.asarray(fast["image"]), np.asarray(dense["image"]), atol=0.05
        )
        # interior (fully opaque) and miss rays must agree tightly
        ws_d = np.asarray(dense["weights_sum"])
        core = (ws_d > 0.99) | (ws_d < 1e-3)
        assert core.sum() >= 24
        np.testing.assert_allclose(
            np.asarray(fast["image"])[core], np.asarray(dense["image"])[core], atol=2e-3
        )

    def test_empty_grid_renders_background(self):
        cfg = R.RenderConfig(bound=1.0, grid_size=32, samples_per_ray_budget=8)
        occ = R.init_occupancy(cfg)  # all empty
        o, d = camera_rays(8)
        out = R.render_occgrid(analytic_field, o, d, occ.occ, cfg, bg_color=0.5)
        np.testing.assert_allclose(np.asarray(out["image"]), 0.5, atol=1e-5)
        assert int(out["num_samples"]) == 0

    def test_budget_overflow_truncates_gracefully(self):
        cfg = R.RenderConfig(bound=1.0, grid_size=32, max_steps=256,
                             samples_per_ray_budget=4, density_thresh=0.5)
        occ = self._occ_from_field(cfg)
        o, d = camera_rays(16)
        out = R.render_occgrid(analytic_field, o, d, occ.occ, cfg, bg_color=0.0)
        assert np.isfinite(np.asarray(out["image"])).all()

    def test_hierarchical_matches_flat_march(self):
        """The two-level (coarse dilated + fine) march must reproduce the flat
        candidate enumeration's render when budgets are generous."""
        base = dict(bound=1.0, grid_size=64, num_steps=512, max_steps=512,
                    samples_per_ray_budget=220, density_thresh=0.5,
                    coarse_budget=48, fine_per_coarse=8)
        cfg_flat = R.RenderConfig(**base, march="flat")
        cfg_hier = R.RenderConfig(**base, march="hierarchical")
        occ = self._occ_from_field(cfg_flat)
        o, d = camera_rays(32)
        flat = R.render_occgrid(analytic_field, o, d, occ.occ, cfg_flat, bg_color=0.0)
        hier = R.render_occgrid(analytic_field, o, d, occ.occ, cfg_hier,
                                bg_color=0.0, occ_coarse=occ.occ_coarse)
        np.testing.assert_allclose(
            np.asarray(hier["image"]), np.asarray(flat["image"]), atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(hier["weights_sum"]), np.asarray(flat["weights_sum"]), atol=5e-3
        )

    def test_brick_occupancy_bit_identical(self):
        """The bit-packed 8^3-brick occupancy tables (pack_occ_bricks) are a
        pure LAYOUT change: every lookup and the full hierarchical march must
        return exactly the same bits/samples as the bool-grid path."""
        from trinerflet_tpu.ops import raymarch as RM
        rng = np.random.default_rng(7)
        G, CAS, N = 32, 2, 256
        occ = jnp.asarray(rng.random((CAS, G, G, G)) < 0.07)
        occ_coarse = R._dilate3(occ)
        bricks = RM.pack_occ_bricks(occ)
        cbricks = RM.pack_occ_bricks(occ_coarse)
        assert bricks.shape == (CAS * (G // 8) ** 3, 16)
        assert RM.pack_occ_bricks(jnp.zeros((1, 12, 12, 12), bool)) is None

        pts = jnp.asarray(rng.uniform(-1.9, 1.9, (N, 17, 3)), jnp.float32)
        dts = jnp.asarray(rng.uniform(1e-3, 0.1, (N, 17)), jnp.float32)
        a = RM.occupancy_lookup(occ, pts, dts, grid_size=G, cascades=CAS,
                                bound=2.0)
        b = RM.occupancy_lookup(occ, pts, dts, grid_size=G, cascades=CAS,
                                bound=2.0, bricks=bricks)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        o = jnp.asarray(rng.uniform(-0.5, 0.5, (N, 3)), jnp.float32)
        d = rng.standard_normal((N, 3))
        d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
        aabb = jnp.asarray([-2, -2, -2, 2, 2, 2], jnp.float32)
        nears, fars = RM.near_far_from_aabb(o, d, aabb, 0.05)
        nears = jnp.where(nears < 1e30, nears, 0.0)
        fars = jnp.where(fars < 1e30, fars, 0.0)
        noise = jnp.asarray(rng.random(N), jnp.float32)
        kw = dict(num_coarse=32, fine_per_coarse=8, coarse_budget=12,
                  budget=24, max_steps=256, grid_size=G, cascades=CAS,
                  bound=2.0, dt_gamma=0.0, occ_test_stride=2)
        t1, dt1, m1, s1, _ = RM.march_hierarchical(
            o, d, nears, fars, occ, occ_coarse, noise, **kw)
        t2, dt2, m2, s2, _ = RM.march_hierarchical(
            o, d, nears, fars, occ, occ_coarse, noise, bricks, cbricks, **kw)
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))

    def test_strided_occ_test_jitters_only_run_boundaries(self):
        """occ_test_stride probes the fine grid once per `s` candidates
        (nearest assignment): vs the exact per-candidate test, validity may
        differ only within `s` candidates of an occupied-run boundary — a
        symmetric endpoint jitter, never interior holes or whole-run
        phantoms."""
        from trinerflet_tpu.ops import raymarch as RM
        rng = np.random.default_rng(3)
        G, CAS, N = 32, 1, 256
        occ = jnp.asarray(rng.random((CAS, G, G, G)) < 0.05)
        occ_coarse = R._dilate3(occ)
        o = jnp.asarray(rng.uniform(-0.5, 0.5, (N, 3)), jnp.float32)
        d = rng.standard_normal((N, 3))
        d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
        aabb = jnp.asarray([-1, -1, -1, 1, 1, 1], jnp.float32)
        nears, fars = RM.near_far_from_aabb(o, d, aabb, 0.05)
        nears = jnp.where(nears < 1e30, nears, 0.0)
        fars = jnp.where(fars < 1e30, fars, 0.0)
        noise = jnp.zeros((N,), jnp.float32)
        # budget = coarse_budget * fine_per_coarse: nothing ever subsampled,
        # so the kept-sample sets are exactly the validity sets
        kw = dict(num_coarse=24, fine_per_coarse=8, coarse_budget=24,
                  budget=24 * 8, max_steps=256, grid_size=G, cascades=CAS,
                  bound=1.0, dt_gamma=0.0)
        t1, dt1, m1, s1, _ = RM.march_hierarchical(
            o, d, nears, fars, occ, occ_coarse, noise, occ_test_stride=1, **kw)
        t2, dt2, m2, s2, _ = RM.march_hierarchical(
            o, d, nears, fars, occ, occ_coarse, noise, occ_test_stride=2, **kw)
        t1v = np.asarray(jnp.where(m1, t1, -1.0))
        t2v = np.asarray(jnp.where(m2, t2, -1.0))
        s = 2
        n_mismatch = n_total = 0
        for i in range(N):
            exact = set(np.round(t1v[i][t1v[i] >= 0], 5).tolist())
            strided = set(np.round(t2v[i][t2v[i] >= 0], 5).tolist())
            diff = exact ^ strided
            n_mismatch += len(diff)
            n_total += max(len(exact), 1)
            # every mismatched t must lie within s*dt of a sample the two
            # sets AGREE is valid, or belong to a run shorter than s
            # (boundary jitter, not an interior hole/phantom)
            agree = np.asarray(sorted(exact & strided))
            for tv in diff:
                if agree.size:
                    near = np.abs(agree - tv).min()
                    if near <= s * 0.0135 * 1.01:  # s*dt at max_steps=256
                        continue
                # isolated short run: all of its samples mislabeled together
                run = [u for u in (exact | strided) if abs(u - tv) <= s * 0.0135]
                assert len(run) <= s, (i, tv)
        # boundary jitter only: aggregate mismatch stays a small fraction
        assert n_mismatch / n_total < 0.35, n_mismatch / n_total

    def test_strided_occ_render_matches_flat(self):
        """Renders with auto occ_test_stride stay close to the flat march
        (extra conservative candidates land in ~zero-density cells)."""
        base = dict(bound=1.0, grid_size=64, num_steps=512, max_steps=512,
                    samples_per_ray_budget=220, density_thresh=0.5,
                    coarse_budget=48, fine_per_coarse=8)
        cfg_flat = R.RenderConfig(**base, march="flat")
        cfg_s = R.RenderConfig(**base, march="hierarchical", occ_test_stride=0)
        assert cfg_s.resolved_occ_test_stride() >= 2
        occ = self._occ_from_field(cfg_flat)
        o, d = camera_rays(32)
        flat = R.render_occgrid(analytic_field, o, d, occ.occ, cfg_flat, bg_color=0.0)
        strided = R.render_occgrid(analytic_field, o, d, occ.occ, cfg_s,
                                   bg_color=0.0, occ_coarse=occ.occ_coarse)
        # the superset adds boundary-shell samples with small but nonzero
        # density (the flat march skips them), so images differ slightly at
        # soft edges — bounded, and on the *more*-integrated side
        np.testing.assert_allclose(
            np.asarray(strided["image"]), np.asarray(flat["image"]), atol=0.05
        )

    def test_gradients_through_render(self):
        cfg = R.RenderConfig(bound=1.0, grid_size=32, max_steps=128,
                             samples_per_ray_budget=64, density_thresh=0.5)
        occ = self._occ_from_field(cfg)
        o, d = camera_rays(8)

        def loss(scale):
            def f(x, dd):
                s, c = analytic_field(x, dd)
                return s * scale, c
            out = R.render_occgrid(f, o, d, occ.occ, cfg, bg_color=0.0)
            return (out["image"] ** 2).sum()

        g = jax.grad(loss)(jnp.asarray(1.0))
        assert np.isfinite(float(g))


class TestOccupancyUpdate:
    def test_ema_max_update(self):
        cfg = R.RenderConfig(bound=1.0, grid_size=32, density_thresh=0.5)
        state = R.init_occupancy(cfg)
        s1 = R.update_density_grid(state, lambda p: analytic_density(p)[0],
                                   jax.random.PRNGKey(0), cfg)
        # second update with zero density: grid decays, not zeroed
        s2 = R.update_density_grid(s1, lambda p: jnp.zeros(p.shape[0]),
                                   jax.random.PRNGKey(1), cfg)
        g1 = np.asarray(s1.density_grid)
        g2 = np.asarray(s2.density_grid)
        occupied = g1 > 1.0
        np.testing.assert_allclose(g2[occupied], g1[occupied] * 0.95, rtol=1e-4)

    def test_mark_untrained(self):
        cfg = R.RenderConfig(bound=1.0, grid_size=32)
        # single camera at -z looking forward: cells behind it must be untrained
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = -2.0
        grid = R.mark_untrained_grid(pose[None], (100.0, 100.0, 16.0, 16.0), cfg)
        assert (grid == -1).sum() > 0
        assert (grid == 0).sum() > 0


class TestSpreadSampling:
    def test_first_k_valid_spread_covers_span(self):
        """When valid count exceeds the budget, selection must span ALL valid
        entries (evenly) instead of truncating to the first B — truncation
        confined early-training supervision to a shell at the ray entry and
        destroyed novel-view quality (15 dB vs 42 dB)."""
        from trinerflet_tpu.ops.raymarch import first_k_valid
        N, K, B = 4, 256, 16
        valid = jnp.ones((N, K), bool)
        idx, mask, stride = first_k_valid(valid, B, spread=True)
        idx = np.asarray(idx)
        assert mask.all()
        np.testing.assert_allclose(np.asarray(stride), K / B)
        assert idx[0, -1] == K - 1          # reaches the far end
        assert idx[0, 0] == K // B - 1      # even spacing from the start
        assert (np.diff(idx[0]) == K // B).all()

    def test_first_k_valid_exact_when_under_budget(self):
        from trinerflet_tpu.ops.raymarch import first_k_valid
        valid = np.zeros((2, 64), bool)
        valid[0, [3, 10, 50]] = True
        idx, mask, stride = first_k_valid(jnp.asarray(valid), 8, spread=True)
        np.testing.assert_array_equal(np.asarray(idx)[0, :3], [3, 10, 50])
        np.testing.assert_array_equal(np.asarray(mask)[0], [1, 1, 1, 0, 0, 0, 0, 0])
        np.testing.assert_allclose(np.asarray(stride), 1.0)

    def test_first_k_valid_payload_matches_indexed_values(self):
        """The payload lane must return exactly payload[row, idx] for every
        selected slot (it rides the same sort + one fused row-take)."""
        from trinerflet_tpu.ops.raymarch import first_k_valid
        rng = np.random.default_rng(7)
        N, K, B = 32, 96, 12
        valid = jnp.asarray(rng.random((N, K)) < 0.3)
        payload = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
        i1, m1, s1 = first_k_valid(valid, B, spread=True)
        i2, m2, s2, pl = first_k_valid(valid, B, spread=True, payload=payload)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))
        want = np.take_along_axis(np.asarray(payload), np.asarray(i1), axis=1)
        np.testing.assert_array_equal(np.asarray(pl), want)

    def test_dense_grid_samples_span_ray(self):
        """Full occupancy + tiny budget: rendered samples must cover the whole
        [near, far] span with dt scaled to preserve optical depth."""
        cfg = R.RenderConfig(bound=1.0, grid_size=32, max_steps=512,
                             samples_per_ray_budget=16, density_thresh=0.5)
        occ = jnp.ones((1, 32, 32, 32), bool)
        occ_c = occ
        o, d = camera_rays(4)
        # sphere-crossing rays stay opaque despite the tiny budget
        out = R.render_occgrid(analytic_field, o, d, occ, cfg, bg_color=0.0,
                               occ_coarse=occ_c)
        ws = np.asarray(out["weights_sum"])
        xs = np.linspace(-0.9, 0.9, 4)
        assert (ws[np.abs(xs) < 0.4] > 0.9).all()
        # translucent fog sigma=1: total optical depth = span; with correct
        # dt scaling ws = 1 - exp(-span) for center rays (span ~2 in z)
        def fog(x, dd):
            return jnp.full(x.shape[:-1], 1.0), jnp.ones(x.shape[:-1] + (3,))
        out2 = R.render_occgrid(fog, o, d, occ, cfg, bg_color=0.0, occ_coarse=occ_c)
        ws2 = np.asarray(out2["weights_sum"])
        expect = 1 - np.exp(-2.0)
        np.testing.assert_allclose(ws2, expect, atol=0.08)


class TestDeepEval:
    """Test-time deep rendering (reference --max_steps 4096 eval path,
    renderer.py:324-374): a wider eval budget must recover the dense
    reference where the training budget truncates/subsamples."""

    def _field_fog(self, xyzs, dirs=None):
        # fog varying fast ALONG the march direction (z): every candidate is
        # occupied -> budget overflow, and subsampling aliases badly
        z = xyzs[..., 2]
        sigma = 1.5 + 1.4 * jnp.sin(18.0 * z)
        if dirs is None:
            return sigma, xyzs  # geo = position so the color fn can see it
        rgb = 0.5 + 0.5 * jnp.stack(
            [jnp.sin(23 * z), jnp.cos(15 * z), jnp.sin(9 * z)], -1)
        return sigma, rgb

    def test_for_eval_config(self):
        cfg = R.RenderConfig(samples_per_ray_budget=16, eval_samples_per_ray=64,
                             fine_per_coarse=8, coarse_budget=4)
        e = cfg.for_eval()
        assert e.samples_per_ray_budget == 64
        assert e.coarse_budget >= 64 // 8
        assert R.RenderConfig(samples_per_ray_budget=16).for_eval().samples_per_ray_budget == 16

    def test_deep_eval_recovers_dense(self):
        cfg = R.RenderConfig(bound=1.0, grid_size=32, max_steps=256,
                             samples_per_ray_budget=12, eval_samples_per_ray=448,
                             num_steps=448)
        occ = R.init_occupancy(cfg)
        occ_all = jnp.ones_like(occ.occ)
        o, d = camera_rays(16)

        def density(p):
            return self._field_fog(p)

        def color(dirs, geo):
            z = geo.reshape(dirs.shape)[..., 2]
            return 0.5 + 0.5 * jnp.stack(
                [jnp.sin(23 * z), jnp.cos(15 * z), jnp.sin(9 * z)], -1)

        def field(x, dd):
            return self._field_fog(x, dd)

        dense = R.render_dense(density, color, o, d, cfg, bg_color=0.0)
        shallow = R.render_occgrid(field, o, d, occ_all, cfg, bg_color=0.0)
        deep = R.render_occgrid(field, o, d, occ_all, cfg.for_eval(), bg_color=0.0)
        ref = np.asarray(dense["image"])
        err_shallow = np.abs(np.asarray(shallow["image"]) - ref).max()
        err_deep = np.abs(np.asarray(deep["image"]) - ref).max()
        assert err_deep < err_shallow * 0.5, (err_shallow, err_deep)
        assert err_deep < 0.01, err_deep

    def test_trainer_uses_eval_budget(self, tmp_path):
        from trinerflet_tpu.models.nerf import NeRFConfig
        from trinerflet_tpu.models.triplane import TriplaneConfig
        from trinerflet_tpu.train.trainer import Trainer, TrainConfig

        nerf_cfg = NeRFConfig(
            triplane=TriplaneConfig(channels=4, resolution=32, wavelet_scale=2),
            bound=1.0, hidden_dim=16, hidden_dim_color=16)
        rc = R.RenderConfig(bound=1.0, grid_size=16, max_steps=64,
                            samples_per_ray_budget=8, eval_samples_per_ray=32)
        tc = TrainConfig(iters=1, num_rays=64, eval_chunk=4096)
        tr = Trainer(nerf_cfg, rc, tc)
        assert tr.eval_render_cfg.samples_per_ray_budget == 32
        assert tr.eval_chunk == 1024  # shrunk by the 4x budget ratio
        state = tr.init_state()
        img, dep = tr.render_image(
            state.params, state.occ, np.eye(4, dtype=np.float32),
            (32.0, 32.0, 16.0, 16.0), 16, 16)
        assert img.shape == (16, 16, 3) and np.isfinite(img).all()


class TestPartialGridUpdate:
    def test_rotating_partial_covers_every_cell_once(self):
        """4 quarter-updates refresh EVERY cell exactly once: raising the
        field 1 -> 9 must reach all cells; zeroing it must decay each cell by
        exactly one 0.95 factor."""
        cfg = R.RenderConfig(bound=1.0, grid_size=16)
        const = lambda v: (lambda p: jnp.full(p.shape[:-1], v))

        s = R.init_occupancy(cfg)
        s = R.update_density_grid(s, const(1.0), jax.random.PRNGKey(0), cfg)
        for i in range(4):
            s = s._replace(iter_density=jnp.asarray(i, jnp.int32))
            s = R.update_density_grid(s, const(9.0), jax.random.PRNGKey(1),
                                      cfg, fraction=0.25)
        np.testing.assert_allclose(np.asarray(s.density_grid), 9.0, rtol=1e-6)
        for i in range(4):
            s = s._replace(iter_density=jnp.asarray(i, jnp.int32))
            s = R.update_density_grid(s, const(0.0), jax.random.PRNGKey(2),
                                      cfg, fraction=0.25)
        np.testing.assert_allclose(np.asarray(s.density_grid), 9.0 * 0.95,
                                   rtol=1e-6)

    def test_partial_respects_untrained_cells(self):
        cfg = R.RenderConfig(bound=1.0, grid_size=8)
        s = R.init_occupancy(cfg)
        grid = np.zeros((cfg.cascades, 8**3), np.float32)
        grid[:, :100] = -1.0  # untrained
        s = s._replace(density_grid=jnp.asarray(grid))
        for i in range(4):
            s = s._replace(iter_density=jnp.asarray(i, jnp.int32))
            s = R.update_density_grid(s, lambda p: analytic_density(p)[0],
                                      jax.random.PRNGKey(2), cfg, fraction=0.25)
        assert (np.asarray(s.density_grid)[:, :100] == -1.0).all()


class TestOccBBox:
    def test_bbox_covers_occupied_cells(self):
        cfg = R.RenderConfig(bound=1.0, grid_size=32, density_thresh=0.5)
        s = R.init_occupancy(cfg)
        s = R.update_density_grid(s, lambda p: analytic_density(p)[0],
                                  jax.random.PRNGKey(0), cfg)
        bbox = np.asarray(s.bbox)
        # sphere of radius 0.5 at origin -> bbox within [-0.7, 0.7] and
        # containing [-0.5, 0.5]
        assert (bbox[:3] <= -0.45).all() and (bbox[3:] >= 0.45).all()
        assert (bbox[:3] >= -0.75).all() and (bbox[3:] <= 0.75).all()
        # empty occupancy -> full scene box
        e = R.init_occupancy(cfg)
        b = np.asarray(R._occupied_bbox(e.occ, cfg))
        np.testing.assert_allclose(b, np.asarray(cfg.aabb))

    def test_render_with_bbox_matches_without(self):
        cfg = R.RenderConfig(bound=1.0, grid_size=64, max_steps=512,
                             samples_per_ray_budget=220, density_thresh=0.5,
                             coarse_budget=48)
        s = R.init_occupancy(cfg)
        s = R.update_density_grid(s, lambda p: analytic_density(p)[0],
                                  jax.random.PRNGKey(0), cfg)
        o, d = camera_rays(32)
        a = R.render_occgrid(analytic_field, o, d, s.occ, cfg, bg_color=0.0,
                             occ_coarse=s.occ_coarse)
        b = R.render_occgrid(analytic_field, o, d, s.occ, cfg, bg_color=0.0,
                             occ_coarse=s.occ_coarse, occ_bbox=s.bbox)
        np.testing.assert_allclose(np.asarray(b["image"]),
                                   np.asarray(a["image"]), atol=5e-3)
        # tighter span with a shrunk static coarse count still matches
        cfg2 = R.RenderConfig(**{**cfg.__dict__, "num_coarse_override": 16})
        c = R.render_occgrid(analytic_field, o, d, s.occ, cfg2, bg_color=0.0,
                             occ_coarse=s.occ_coarse, occ_bbox=s.bbox)
        np.testing.assert_allclose(np.asarray(c["image"]),
                                   np.asarray(a["image"]), atol=5e-3)

    def test_tuned_num_coarse_policy(self):
        """Shared span-tune policy (Trainer + SRSystem): target follows the
        bbox diagonal (x1.1 + 2 segments, rounded to 8, capped at worst);
        None when the current span is already within tolerance."""
        cfg = R.RenderConfig(bound=1.0, grid_size=32, max_steps=1024,
                             fine_per_coarse=12, march="hierarchical")
        worst = int(np.ceil(cfg.bound * cfg.max_steps / cfg.fine_per_coarse))
        # small pocket: diag ~0.35 -> target well below worst
        small = np.array([-0.1, -0.1, -0.1, 0.1, 0.1, 0.1], np.float32)
        tgt = R.tuned_num_coarse(cfg, small)
        assert tgt is not None and 8 <= tgt < worst and tgt % 8 == 0
        # already tuned to that value -> no retune
        cfg2 = dataclasses.replace(cfg, num_coarse_override=tgt)
        assert R.tuned_num_coarse(cfg2, small) is None
        # bbox grows back to the full box -> retunes upward, capped at worst
        full = np.array([-1, -1, -1, 1, 1, 1], np.float32)
        up = R.tuned_num_coarse(cfg2, full)
        assert up is not None and up == min(worst, (up + 7) // 8 * 8)

    def test_trainer_retune_shrinks_span(self):
        from trinerflet_tpu.data.synthetic import make_synthetic_scene
        from trinerflet_tpu.models.nerf import NeRFConfig
        from trinerflet_tpu.models.triplane import TriplaneConfig
        from trinerflet_tpu.train.trainer import Trainer, TrainConfig

        scene = make_synthetic_scene(num_views=2, H=24, W=24, num_steps=32)
        tr = Trainer(
            NeRFConfig(triplane=TriplaneConfig(channels=4, resolution=32,
                                               wavelet_scale=2),
                       bound=1.0, hidden_dim=16, hidden_dim_color=16),
            R.RenderConfig(bound=1.0, grid_size=16, max_steps=1024,
                           samples_per_ray_budget=8),
            TrainConfig(iters=1, num_rays=64, eval_chunk=1024),
        )
        state = tr.init_state()
        # craft a stabilized occupancy with a SMALL occupied pocket
        occ = np.zeros_like(np.asarray(state.occ.occ))
        occ[:, 6:9, 6:9, 6:9] = True
        s_occ = state.occ._replace(
            occ=jnp.asarray(occ),
            bbox=jnp.asarray(R._occupied_bbox(jnp.asarray(occ), tr.render_cfg)),
            iter_density=jnp.asarray(10, jnp.int32),
        )
        state = state._replace(occ=s_occ)
        worst = int(np.ceil(1.0 * 1024 / tr.render_cfg.fine_per_coarse))
        tr._maybe_retune_march(state)
        assert 0 < tr.render_cfg.num_coarse_override < worst
        assert tr._march_retunes == 1
        # post-retune render still works
        img, _ = tr.render_image(state.params, state.occ,
                                 scene.poses[0], scene.intrinsics, 24, 24)
        assert np.isfinite(img).all()
        # bbox growing back to the full box re-tunes upward
        s2 = s_occ._replace(bbox=jnp.asarray(tr.render_cfg.aabb, jnp.float32))
        tr._maybe_retune_march(state._replace(occ=s2))
        assert tr.render_cfg.num_coarse_override == worst or (
            tr.render_cfg.num_coarse_override + 7
        ) // 8 * 8 >= worst


class TestGlobalCompaction:
    """Second-stage global compaction of the hierarchical march: the shared-
    buffer layout must reproduce the dense per-ray-budget render exactly
    (same march, same samples — only the field-eval layout changes)."""

    def _occ_from_field(self, cfg):
        state = R.init_occupancy(cfg)
        return R.update_density_grid(
            state, lambda p: analytic_density(p)[0], jax.random.PRNGKey(0), cfg
        )

    def _cfgs(self, slots):
        base = dict(bound=1.0, grid_size=64, max_steps=512,
                    samples_per_ray_budget=64, density_thresh=0.5,
                    coarse_budget=48, fine_per_coarse=8, march="hierarchical")
        return (R.RenderConfig(**base),
                R.RenderConfig(**base, compaction="global",
                               global_slots_per_ray=slots))

    def test_matches_dense_budget_layout(self):
        cfg_d, cfg_g = self._cfgs(slots=64)  # ample buffer: no tail dropping
        occ = self._occ_from_field(cfg_d)
        o, d = camera_rays(32)
        dense = R.render_occgrid(analytic_field, o, d, occ.occ, cfg_d,
                                 bg_color=0.0, occ_coarse=occ.occ_coarse)
        glob = R.render_occgrid(analytic_field, o, d, occ.occ, cfg_g,
                                bg_color=0.0, occ_coarse=occ.occ_coarse)
        np.testing.assert_allclose(np.asarray(glob["image"]),
                                   np.asarray(dense["image"]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(glob["weights_sum"]),
                                   np.asarray(dense["weights_sum"]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(glob["depth"]),
                                   np.asarray(dense["depth"]), atol=2e-3)
        assert int(glob["num_samples"]) == int(dense["num_samples"])
        assert 0.0 < float(glob["global_fill"]) <= 1.0

    def test_gradients_match_dense_layout(self):
        cfg_d, cfg_g = self._cfgs(slots=64)
        occ = self._occ_from_field(cfg_d)
        o, d = camera_rays(16)
        scale0 = jnp.asarray(1.0)

        def loss(scale, cfg):
            def field(xyzs, dirs):
                sigma, rgb = analytic_field(xyzs, dirs)
                return sigma * scale, rgb

            out = R.render_occgrid(field, o, d, occ.occ, cfg, bg_color=0.0,
                                   occ_coarse=occ.occ_coarse)
            return (out["image"] ** 2).sum()

        g_d = jax.grad(loss)(scale0, cfg_d)
        g_g = jax.grad(loss)(scale0, cfg_g)
        np.testing.assert_allclose(np.asarray(g_g), np.asarray(g_d), rtol=1e-4)

    def test_overflow_drops_tail_gracefully(self):
        cfg_d, cfg_g = self._cfgs(slots=2)  # deliberately too small
        occ = self._occ_from_field(cfg_d)
        o, d = camera_rays(16)
        out = R.render_occgrid(analytic_field, o, d, occ.occ, cfg_g,
                               bg_color=0.0, occ_coarse=occ.occ_coarse)
        assert np.isfinite(np.asarray(out["image"])).all()
        assert float(out["global_fill"]) == 1.0  # buffer saturated -> retune

    def test_for_eval_forces_dense_layout(self):
        _, cfg_g = self._cfgs(slots=8)
        ev = cfg_g.for_eval()
        assert ev.compaction == "per_ray"

    def test_global_with_unset_slots_keeps_flat_exact_compaction(self):
        """compaction='global' WITHOUT global_slots_per_ray predates the
        hierarchical second stage and means the flat march's exact global
        compaction (no per-ray budget cap). The hierarchical gate must not
        swallow it into the dense per-ray budget layout."""
        cfg = R.RenderConfig(bound=1.0, grid_size=64, max_steps=512,
                             samples_per_ray_budget=8,  # tiny per-ray cap
                             density_thresh=0.5, coarse_budget=48,
                             fine_per_coarse=8, march="hierarchical",
                             compaction="global")
        occ = self._occ_from_field(cfg)
        o, d = camera_rays(16)
        out = R.render_occgrid(analytic_field, o, d, occ.occ, cfg,
                               bg_color=0.0, occ_coarse=occ.occ_coarse)
        # the flat exact path has NO per-ray cap (a single ray may fill the
        # whole shared N*B buffer); it is recognizable by the absence of the
        # budget-layout autotune signals the hierarchical path always emits
        assert "samples_p99" not in out and "global_fill" not in out
        # center rays cross ~1.0 chord at dt=2*sqrt(3)/512: per-ray demand
        # ~150 >> budget 8, so the exact path saturates the shared buffer
        assert int(out["num_samples"]) == 16 * 8
        assert np.isfinite(np.asarray(out["image"])).all()


class TestDepthOutput:
    def test_depth_is_span_normalized_distance(self):
        """Depth = (surface t - nears)/span. The pre-fix occgrid path
        subtracted nears twice (composites already accumulate ts relative to
        the ray start), zeroing the depth map whenever the surface sat closer
        than 2*nears — e.g. every blender-style orbit camera."""
        cfg = R.RenderConfig(bound=1.0, grid_size=64, max_steps=512,
                             samples_per_ray_budget=64, density_thresh=0.5,
                             coarse_budget=48, fine_per_coarse=8,
                             march="hierarchical")
        occ = R.update_density_grid(
            R.init_occupancy(cfg), lambda p: analytic_density(p)[0],
            jax.random.PRNGKey(0), cfg)
        o, d = camera_rays(64)
        out = R.render_occgrid(analytic_field, o, d, occ.occ, cfg,
                               bg_color=0.0, occ_coarse=occ.occ_coarse)
        xs = np.linspace(-0.9, 0.9, 64)
        dep = np.asarray(out["depth"])
        hit = np.abs(xs) < 0.3
        # camera z=-2, surface z~-0.5, aabb entry z=-1, exit z=+1:
        # depth ~ (1.5 - 1.0) / 2.0 = 0.25 on the center rays
        assert (dep[hit] > 0.1).all(), dep[hit]
        assert (dep[hit] < 0.6).all(), dep[hit]
        # and the convention matches the dense renderer's normalized depth
        dcfg = R.RenderConfig(bound=1.0, num_steps=512, upsample_steps=0)
        dout = R.render_dense(analytic_density, analytic_color, o, d, dcfg,
                              bg_color=0.0)
        np.testing.assert_allclose(
            dep[hit], np.asarray(dout["depth"])[hit], atol=0.05)
