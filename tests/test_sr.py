import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trinerflet_tpu.sr.config import C, parse_structured, apply_overrides
from trinerflet_tpu.sr.guidance import (
    DiffusionSchedule, GuidanceConfig, UpscalerGuidance, OracleDenoiser,
    make_oracle_guidance, make_resize_guidance,
)
from trinerflet_tpu.sr.data import make_synthetic_sr_scene
from trinerflet_tpu.sr.system import SRConfig, SRSystem
from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.render.renderer import RenderConfig


class TestScheduledScalars:
    def test_constant(self):
        assert C(0.5, 100) == 0.5

    def test_linear_interp(self):
        sched = [100, 0.0, 1.0, 200]
        assert C(sched, 50) == 0.0
        assert C(sched, 150) == 0.5
        assert C(sched, 300) == 1.0

    def test_three_element_form(self):
        assert C([0.2, 0.8, 100], 50) == pytest.approx(0.5)


class TestConfigParsing:
    def test_parse_and_override(self):
        cfg = {"sr_start_step": 5, "lambda_l1_hr": [0, 0.0, 1.0, 10]}
        cfg = apply_overrides(cfg, ["sr_start_step=7", "lr=0.02"])
        parsed = parse_structured(SRConfig, cfg)
        assert parsed.sr_start_step == 7
        assert parsed.lr == 0.02
        assert C(parsed.lambda_l1_hr, 5) == 0.5

    def test_unknown_key_rejected(self):
        with pytest.raises(ValueError, match="unknown config keys"):
            parse_structured(SRConfig, {"nope": 1})


class TestDiffusionSchedule:
    def test_add_noise_limits(self):
        sch = DiffusionSchedule(1000)
        x = jnp.ones((1, 4, 4, 3))
        n = jnp.zeros_like(x)
        np.testing.assert_allclose(np.asarray(sch.add_noise(x, n, 0)), 1.0, atol=1e-2)
        assert float(sch.alphas_cumprod[-1]) < 0.01  # nearly pure noise at T

    def test_ddim_timesteps_descending(self):
        sch = DiffusionSchedule(1000)
        ts = np.asarray(sch.ddim_timesteps(50))
        assert len(ts) == 50 and (np.diff(ts) < 0).all()

    def test_oracle_denoiser_one_step_recovery(self):
        """With the oracle denoiser, pred_x0 equals the target at any t."""
        sch = DiffusionSchedule(1000)
        rng = jax.random.PRNGKey(0)
        target = jax.random.uniform(rng, (1, 8, 8, 3)) * 2 - 1
        den = OracleDenoiser(target, sch)
        x = jax.random.normal(jax.random.PRNGKey(1), target.shape)
        eps = den(x, jnp.asarray(500), jnp.asarray(20), True)
        _, pred_x0 = sch.ddim_step(eps, 500, 480, x)
        np.testing.assert_allclose(np.asarray(pred_x0), np.asarray(target), atol=1e-4)


@pytest.mark.e2e
class TestGenerateSR:
    def test_oracle_sdedit_recovers_target(self):
        """The full SDEdit tail with the oracle denoiser must return the
        target image regardless of the sampled refinement depth."""
        rng = jax.random.PRNGKey(0)
        target = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 3))
        cfg = GuidanceConfig(num_inference_steps=20, guidance_scale=1.0)
        g = make_oracle_guidance(cfg, target)
        lr_img = jax.image.resize(target, (1, 4, 4, 3), "bilinear")
        hr_render = jnp.zeros_like(target) + 0.5
        for ignore_t in (100, 500, 900):
            out = g.generate_sr(rng, lr_img, hr_render, ignore_t=ignore_t)
            # set_alpha_to_one=false (x4-upscaler config; see
            # test_diffusion_schedule.py) makes the final DDIM step keep a
            # sqrt(1 - alphas_cumprod[0]) ~= 0.01 * eps residual, so even the
            # oracle recovers the target only to ~3-4 sigma of that
            np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=8e-2)

    def test_cfg_branches_run(self):
        target = jax.random.uniform(jax.random.PRNGKey(2), (1, 8, 8, 3))
        for kw in (dict(guidance_scale=7.5),
                   dict(guidance_scale=7.5, guidance_scale_sr=5.0)):
            cfg = GuidanceConfig(num_inference_steps=8, **kw)
            g = make_oracle_guidance(cfg, target)
            out = g.generate_sr(jax.random.PRNGKey(0),
                                jax.image.resize(target, (1, 2, 2, 3), "bilinear"),
                                jnp.zeros_like(target), ignore_t=500)
            assert np.isfinite(np.asarray(out)).all()

    def test_max_step_anneal(self):
        cfg = GuidanceConfig(sr_start_step=100, anneal_end_step=200,
                             max_step_percent=0.98, max_step_percent_final=0.5)
        g = UpscalerGuidance(cfg, lambda *a: None)
        assert g.step_bounds(100)[1] == 980
        assert g.step_bounds(200)[1] == 500
        assert g.step_bounds(150)[1] == 740

    def test_sds_loss_gradient(self):
        target = jax.random.uniform(jax.random.PRNGKey(2), (1, 8, 8, 3))
        cfg = GuidanceConfig(num_inference_steps=8, guidance_scale=1.0)
        g = make_oracle_guidance(cfg, target)

        def loss(img):
            return g.sds_loss(jax.random.PRNGKey(0), target[:, ::4, ::4], img)

        grad = jax.grad(loss)(jnp.zeros_like(target) + 0.5)
        assert np.isfinite(np.asarray(grad)).all()
        assert float(jnp.abs(grad).sum()) > 0


@pytest.mark.e2e
class TestSRSystem:
    def _setup(self, scene, **cfg_kw):
        nerf_cfg = NeRFConfig(
            triplane=TriplaneConfig(channels=8, resolution=128, wavelet_scale=4,
                                    low_res_scale=4),
            bound=1.0, hidden_dim=32, hidden_dim_color=32,
        )
        render_cfg = RenderConfig(bound=1.0, grid_size=32, density_thresh=1.0,
                                  max_steps=256, samples_per_ray_budget=32)
        defaults = dict(total_steps=220, sr_start_step=120,
                        hr_fit_refresh_every=100, num_rays_lr=1024,
                        crop_size_lr=16, wavelet_regularization=0.01,
                        eval_chunk=4096)
        defaults.update(cfg_kw)
        cfg = SRConfig(**defaults)
        guidance = make_oracle_guidance(
            GuidanceConfig(num_inference_steps=10, guidance_scale=1.0),
            jnp.asarray(scene.hr.images[:1, ..., :3]),
        )

        # per-view oracle: wrap so each refresh targets the right view
        class PerViewOracle:
            def __init__(self, hr_images):
                self.hr = jnp.asarray(hr_images[..., :3])

            def generate_sr(self, rng, lr_img, hr_render, step=0, ignore_t=None):
                # match the view by nearest LR image (test-only convenience)
                lr_all = jax.image.resize(
                    self.hr, (self.hr.shape[0],) + lr_img.shape[1:], "bilinear"
                )
                d = jnp.mean((lr_all - lr_img) ** 2, axis=(1, 2, 3))
                v = jnp.argmin(d)
                g = make_oracle_guidance(
                    GuidanceConfig(num_inference_steps=10, guidance_scale=1.0),
                    self.hr[v][None],
                )
                return g.generate_sr(rng, lr_img, hr_render, step=step, ignore_t=500)

        return SRSystem(nerf_cfg, render_cfg, cfg, PerViewOracle(scene.hr.images))

    @pytest.fixture(scope="class")
    def scene(self):
        return make_synthetic_sr_scene(num_views=6, lr_size=16, scale=4)

    def test_two_phase_training_improves_hr(self, scene, tmp_path):
        """With the oracle upscaler (pseudo-GT == true HR), phase 2 must lift
        HR quality above the bilinear baseline trajectory."""
        sys = self._setup(scene)
        sys.workspace = str(tmp_path)
        state = sys.init_state()
        phases = []
        state = sys.fit(state, scene, log_every=0,
                        callback=lambda s, a: phases.append(
                            "l2_hr" in a))
        assert not phases[0] and phases[-1]  # phase switch happened
        res = sys.evaluate(state, scene)
        assert np.isfinite(res["PSNR_hr"])
        assert res["PSNR_lr"] > 12.0, res
        files = [f for f in os.listdir(str(tmp_path)) if f.startswith("final_results")]
        assert files

    def test_planes_only_masking(self, scene):
        sys = self._setup(scene, sr_planes_only=True, sr_min_res=64,
                          total_steps=5, sr_start_step=0)
        state = sys.init_state()
        mlp_before = np.asarray(state.params["sigma_net"]["w0"]).copy()
        base_before = np.asarray(state.params["encoder"]["base"]).copy()
        state = sys.fit(state, scene, log_every=0)
        np.testing.assert_array_equal(
            np.asarray(state.params["sigma_net"]["w0"]), mlp_before
        )
        np.testing.assert_array_equal(  # base (32 < 64) frozen too
            np.asarray(state.params["encoder"]["base"]), base_before
        )

    def test_resize_guidance_fallback(self, scene):
        g = make_resize_guidance(GuidanceConfig())
        out = g.generate_sr(jax.random.PRNGKey(0),
                            jnp.asarray(scene.lr.images[:1, ..., :3]),
                            jnp.asarray(scene.hr.images[:1, ..., :3]) * 0 + 0.5)
        assert out.shape == (1, scene.hr.H, scene.hr.W, 3)


class TestConditioningDenoiser:
    def test_sdedit_recovers_conditioning(self):
        """With the conditioning-faithful denoiser, generate_sr's output must
        approach the (upsampled) LR conditioning image."""
        import jax
        import jax.numpy as jnp
        from trinerflet_tpu.sr.guidance import GuidanceConfig, make_cond_guidance

        cfg = GuidanceConfig(num_inference_steps=12, noise_level=20,
                             guidance_scale=1.0)
        g = make_cond_guidance(cfg)
        rng = jax.random.PRNGKey(0)
        lr = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 3))
        hr = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
        out = g.generate_sr(rng, lr, hr, ignore_t=1000)  # full denoise
        up = jax.image.resize(lr, hr.shape, "bilinear")
        err = float(jnp.abs(out - up).mean())
        assert err < 0.08, err


@pytest.mark.e2e
class TestSDSWiring:
    """lambda_sds != 0 must change the HR-step gradients (VERDICT r2 item 6:
    the reference's optional SDS term, triplane_wavelet_sr.py:630-649)."""

    def _system(self, lambda_sds):
        nerf_cfg = NeRFConfig(
            triplane=TriplaneConfig(channels=8, resolution=64, wavelet_scale=2,
                                    low_res_scale=2),
            bound=1.0, hidden_dim=32, hidden_dim_color=32,
        )
        render_cfg = RenderConfig(bound=1.0, grid_size=32, density_thresh=1.0,
                                  max_steps=128, samples_per_ray_budget=16)
        cfg = SRConfig(total_steps=2, sr_start_step=0, hr_fit_refresh_every=1,
                       num_rays_lr=256, crop_size_lr=8, lambda_sds=lambda_sds,
                       wavelet_regularization=0.01, eval_chunk=1024)
        target = jnp.ones((1, 16, 16, 3)) * 0.5
        guidance = make_oracle_guidance(
            GuidanceConfig(num_inference_steps=4, guidance_scale=1.0), target
        )
        return SRSystem(nerf_cfg, render_cfg, cfg, guidance)

    def test_nonzero_sds_changes_update(self):
        import jax

        crop = 16
        ro = jnp.zeros((crop * crop, 3))
        rd = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (crop * crop, 1))
        pgt = jnp.ones((crop, crop, 3)) * 0.25
        lgt = jnp.ones((crop // 2, crop // 2, 3)) * 0.25
        weights = {k: jnp.float32(v) for k, v in
                   [("l2_hr", 1.0), ("l1_hr", 0.0), ("consistency", 0.0),
                    ("reg", 0.0), ("percep", 0.0), ("sds", 0.0)]}

        sys0 = self._system(0.0)
        state0 = sys0.init_state(jax.random.PRNGKey(3))
        s0, aux0 = sys0._hr_step(state0, ro, rd, pgt, lgt, weights)
        assert "sds" not in aux0  # statically gated out

        sys1 = self._system(0.5)
        bounds = jnp.asarray(sys1.guidance.step_bounds(0), jnp.int32)
        w_on = dict(weights, sds=jnp.float32(0.5))
        state1 = sys1.init_state(jax.random.PRNGKey(3))
        s1, aux1 = sys1._hr_step(state1, ro, rd, pgt, lgt, w_on, bounds)
        assert "sds" in aux1 and np.isfinite(float(aux1["sds"]))
        d = jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.abs(b[0] - b[1]).max()),
            jax.tree_util.tree_map(lambda x, y: (x, y),
                                   s0.params["encoder"], s1.params["encoder"]),
            0.0,
        )
        assert d > 0.0  # the SDS term moved the encoder update


class TestSRMarchRetune:
    """Round-3: SRSystem shrinks the static coarse-segment span to the live
    occupied bbox (the wall-time lever for chunked HR full-frame renders,
    reference render_high_res triplane_wavelet_sr.py:797-829)."""

    def _system(self):
        nerf_cfg = NeRFConfig(
            triplane=TriplaneConfig(channels=8, resolution=128, wavelet_scale=4,
                                    low_res_scale=4),
            bound=1.0, hidden_dim=32, hidden_dim_color=32,
        )
        render_cfg = RenderConfig(bound=1.0, grid_size=32, density_thresh=1.0,
                                  max_steps=256, samples_per_ray_budget=16)
        cfg = SRConfig(total_steps=40, sr_start_step=10**9, num_rays_lr=256,
                       eval_chunk=4096)
        return SRSystem(nerf_cfg, render_cfg, cfg,
                        make_resize_guidance(GuidanceConfig(), scale=4))

    def test_span_shrinks_and_render_unchanged(self):
        from trinerflet_tpu.render import renderer as R

        sys_ = self._system()
        state = sys_.init_state(jax.random.PRNGKey(0))
        worst = sys_.render_cfg.num_candidates // sys_.render_cfg.fine_per_coarse

        # craft a concentrated occupancy: a small blob near the origin
        H = sys_.render_cfg.grid_size
        occ = np.zeros((1, H, H, H), bool)
        occ[0, H // 2 - 3 : H // 2 + 3, H // 2 - 3 : H // 2 + 3,
            H // 2 - 3 : H // 2 + 3] = True
        occb = jnp.asarray(occ)
        new_occ = state.occ._replace(
            occ=occb, occ_coarse=R._dilate3(occb),
            bbox=R._occupied_bbox(occb, sys_.render_cfg),
            iter_density=jnp.asarray(10, jnp.int32),
        )
        state = state._replace(occ=new_occ)

        ro = jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (64, 1))
        th = jnp.linspace(-0.15, 0.15, 64)
        rd = jnp.stack([jnp.sin(th), jnp.zeros_like(th), jnp.cos(th)], axis=-1)
        before = sys_._render_chunk(state.params, state.occ, ro, rd,
                                    mode="full")["image"]

        sys_._maybe_retune_march(state)
        tuned = sys_.render_cfg.num_coarse_override
        after = sys_._render_chunk(state.params, state.occ, ro, rd,
                                   mode="full")["image"]
        assert tuned > 0 and tuned < worst
        np.testing.assert_allclose(np.asarray(before), np.asarray(after),
                                   atol=2e-3)


class TestRefreshRenderBudget:
    """The pseudo-GT cache refresh renders at the TRAIN-time budget
    (``render_view(deep=False)``): the reference refreshes its HR cache
    through the train renderer (render_high_res settings), and the deep
    test-time budget would multiply the whole HR phase's cost by ~4x
    (refresh fires ~V/refresh_every times per step)."""

    def _system(self):
        nerf_cfg = NeRFConfig(
            triplane=TriplaneConfig(channels=8, resolution=64, wavelet_scale=4,
                                    low_res_scale=4),
            bound=1.0, hidden_dim=32, hidden_dim_color=32,
        )
        render_cfg = RenderConfig(bound=1.0, grid_size=32, density_thresh=0.01,
                                  max_steps=256, samples_per_ray_budget=16)
        cfg = SRConfig(total_steps=10, sr_start_step=10**9, num_rays_lr=256,
                       eval_chunk=512)
        return SRSystem(nerf_cfg, render_cfg, cfg,
                        make_resize_guidance(GuidanceConfig(), scale=4))

    def test_shallow_render_matches_deep_closely(self):
        sys_ = self._system()
        state = sys_.init_state(jax.random.PRNGKey(0))
        state = sys_._update_grid(state)
        H = W = 24
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = -2.0
        intr = (0.9 * W, 0.9 * W, W / 2.0, H / 2.0)
        deep = sys_.render_view(state.params, state.occ, pose, intr, H, W,
                                deep=True)
        shallow = sys_.render_view(state.params, state.occ, pose, intr, H, W,
                                   deep=False)
        assert deep.shape == shallow.shape == (H, W, 3)
        assert np.isfinite(shallow).all()
        # same field, same march: shallow budget must track the deep image
        assert float(np.abs(deep - shallow).mean()) < 5e-2

    def test_fit_refresh_uses_train_budget(self, monkeypatch):
        """fit()'s refresh must call render_view with deep=False."""
        scene = make_synthetic_sr_scene(num_views=2, lr_size=16, scale=4)
        sys_ = self._system()
        sys_.cfg = SRConfig(total_steps=3, sr_start_step=0, num_rays_lr=256,
                            hr_fit_refresh_every=1, crop_size_lr=8,
                            eval_chunk=512)
        seen = []
        orig = sys_.render_view

        def spy(*a, **kw):
            seen.append(kw.get("deep", True))
            return orig(*a, **kw)

        monkeypatch.setattr(sys_, "render_view", spy)
        state = sys_.init_state(jax.random.PRNGKey(0))
        sys_.fit(state, scene, log_every=0)
        assert seen and not any(seen)
