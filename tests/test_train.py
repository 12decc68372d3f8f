import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trinerflet_tpu.data.synthetic import make_synthetic_scene, write_synthetic_scene
from trinerflet_tpu.data.blender import load_blender
from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.render.renderer import RenderConfig, mark_untrained_grid
from trinerflet_tpu.train.trainer import Trainer, TrainConfig, lr_schedule
from trinerflet_tpu.train.metrics import psnr, ssim


def tiny_setup(tmp_path=None, renderer="occgrid", iters=200, **train_kw):
    nerf_cfg = NeRFConfig(
        triplane=TriplaneConfig(channels=8, resolution=128, wavelet_scale=4,
                                init_sigma=0.1),
        bound=1.0,
        hidden_dim=32,
        hidden_dim_color=32,
    )
    render_cfg = RenderConfig(
        bound=1.0, grid_size=32, density_thresh=1.0, max_steps=256,
        num_steps=128, samples_per_ray_budget=48,
    )
    train_cfg = TrainConfig(
        lr=2e-2, iters=iters, num_rays=1024, wavelet_regularization=0.02,
        renderer=renderer, eval_chunk=4096, update_extra_interval=16,
        ema_decay=0.95, **train_kw,
    )
    ws = str(tmp_path) if tmp_path else None
    return Trainer(nerf_cfg, render_cfg, train_cfg, workspace=ws)


class TestSchedule:
    def test_decay_law(self):
        cfg = TrainConfig(lr=1e-2, iters=1000, sched_base=0.1, sched_exp=2.5)
        fn = lr_schedule(cfg)
        np.testing.assert_allclose(float(fn(0)), 1e-2, rtol=1e-6)
        np.testing.assert_allclose(float(fn(1000)), 1e-3, rtol=1e-5)  # lr * base
        np.testing.assert_allclose(float(fn(2000)), 1e-3, rtol=1e-5)  # clamped
        mid = float(fn(500))
        assert 1e-3 < mid < 1e-2

    def test_warmup(self):
        cfg = TrainConfig(lr=1e-2, iters=1000, warmup_steps=100, warmup_factor=1e-3)
        fn = lr_schedule(cfg)
        assert float(fn(0)) < 1e-4
        assert float(fn(99)) > float(fn(0))
        np.testing.assert_allclose(float(fn(100)), 1e-2, rtol=1e-5)


@pytest.mark.e2e
class TestEndToEnd:
    @pytest.fixture(scope="class")
    def scene(self):
        return make_synthetic_scene(num_views=12, H=64, W=64, num_steps=128)

    def test_fit_synthetic_scene_occgrid(self, scene, tmp_path):
        """The minimum end-to-end slice: fit the synthetic scene and verify
        the loss drops and a held-out-ish render reaches reasonable PSNR."""
        trainer = tiny_setup(tmp_path, iters=300)
        grid = mark_untrained_grid(scene.poses, scene.intrinsics, trainer.render_cfg)
        state = trainer.init_state(density_grid=grid)
        losses = []
        state = trainer.fit(state, scene, log_every=0,
                            callback=lambda s, a: losses.append(float(a["loss"])))
        assert np.mean(losses[:20]) > 3 * np.mean(losses[-20:]), (
            f"loss did not drop: {np.mean(losses[:20])} -> {np.mean(losses[-20:])}"
        )
        img, depth = trainer.render_image(
            state.params, state.occ, scene.poses[0], scene.intrinsics, scene.H, scene.W
        )
        gt = scene.images[0]
        gt = gt[..., :3] * gt[..., 3:] + 0.0 * (1 - gt[..., 3:])
        p = psnr(img, gt)
        assert p > 18.0, f"PSNR too low after 300 iters: {p:.2f}"
        assert np.isfinite(depth).all()
        # NOVEL-view check (cameras never seen in training): guards against
        # crust/memorization failures that train-view PSNR cannot see
        held = make_synthetic_scene(num_views=2, H=64, W=64, num_steps=128, seed=7)
        img_n, _ = trainer.render_image(
            state.params, state.occ, held.poses[0], held.intrinsics, held.H, held.W
        )
        gt_n = held.images[0][..., :3] * held.images[0][..., 3:]
        p_novel = psnr(img_n, gt_n)
        assert p_novel > 16.0, f"novel-view PSNR too low: {p_novel:.2f}"
        # store for following tests via class attr
        type(self).trained = (trainer, state, p)

    def test_ema_eval_and_results_json(self, scene, tmp_path):
        trainer, state, _ = type(self).trained
        trainer.workspace = str(tmp_path)
        sd = os.path.join(str(tmp_path), "renders")
        res = trainer.evaluate(state, scene, use_ema=True, tag="results",
                               save_dir=sd)
        assert res["PSNR"] > 16.0
        assert 0.0 < res["SSIM"] <= 1.0
        assert os.path.exists(os.path.join(str(tmp_path), "results.json"))
        # RGB + depth artifact dumps (reference eval, utils.py:1302-1325);
        # the depth map must carry signal — the pre-fix double-nears
        # subtraction rendered it all-black on every orbit-camera scene
        import cv2

        assert os.path.exists(os.path.join(sd, "results_000.png"))
        dp = os.path.join(sd, "results_000_depth.png")
        assert os.path.exists(dp)
        assert cv2.imread(dp).max() > 0

    def test_checkpoint_roundtrip(self, scene, tmp_path):
        trainer, state, _ = type(self).trained
        path = os.path.join(str(tmp_path), "ckpt.pkl")
        trainer.save_checkpoint(state, path)
        state2 = trainer.load_checkpoint(path)
        img1, _ = trainer.render_image(state.params, state.occ, scene.poses[0],
                                       scene.intrinsics, scene.H, scene.W)
        img2, _ = trainer.render_image(state2.params, state2.occ, scene.poses[0],
                                       scene.intrinsics, scene.H, scene.W)
        np.testing.assert_allclose(img1, img2, atol=1e-5)
        assert int(state2.step) == int(state.step)

    def test_multiscale_stage_growth(self, scene, tmp_path):
        """Stage 1 (res 128, scale 4) -> stage 2 (res 256, scale 8): weights
        carry over and the new stage renders at least as well pre-finetune."""
        trainer, state, _ = type(self).trained
        path = os.path.join(str(tmp_path), "stage1.pkl")
        trainer.save_checkpoint(state, path)

        nerf2 = NeRFConfig(
            triplane=TriplaneConfig(channels=8, resolution=256, wavelet_scale=8),
            bound=1.0, hidden_dim=32, hidden_dim_color=32,
        )
        t2 = Trainer(nerf2, trainer.render_cfg, trainer.cfg)
        s2 = t2.load_model_for_stage(path, jax.random.PRNGKey(1), trainer.nerf_cfg)
        s2 = s2._replace(occ=state.occ)
        img1, _ = trainer.render_image(state.params, state.occ, scene.poses[0],
                                       scene.intrinsics, scene.H, scene.W)
        img2, _ = t2.render_image(s2.params, s2.occ, scene.poses[0],
                                  scene.intrinsics, scene.H, scene.W)
        gt = scene.images[0][..., :3] * scene.images[0][..., 3:]
        # the zero-initialized extra level must not destroy the fit
        assert psnr(img2, gt) > psnr(img1, gt) - 1.5

    def test_dense_renderer_path_trains(self, scene):
        trainer = tiny_setup(renderer="dense", iters=60)
        state = trainer.init_state()
        losses = []
        state = trainer.fit(state, scene, log_every=0,
                            callback=lambda s, a: losses.append(float(a["loss"])))
        assert np.mean(losses[:10]) > np.mean(losses[-10:])


class TestDataRoundtrip:
    def test_blender_format_roundtrip(self, tmp_path):
        """write_synthetic_scene -> load_blender must reproduce poses/images."""
        root = write_synthetic_scene(str(tmp_path / "scene"), num_views=3,
                                     num_test_views=2, H=32, W=32)
        scene = load_blender(root, "train", scale=1.0)
        ref = make_synthetic_scene(num_views=3, H=32, W=32)
        assert scene.images.shape == (3, 32, 32, 4)
        np.testing.assert_allclose(scene.poses, ref.poses, atol=1e-5)
        np.testing.assert_allclose(scene.images, ref.images, atol=0.01)
        np.testing.assert_allclose(scene.intrinsics, ref.intrinsics, rtol=1e-5)


class TestMetrics:
    def test_psnr(self):
        a = np.zeros((8, 8, 3))
        assert psnr(a, a) > 100
        b = a + 0.1
        np.testing.assert_allclose(psnr(a, b), 20.0, atol=0.01)

    def test_ssim_identity_and_noise(self):
        rng = np.random.default_rng(0)
        a = rng.random((48, 48, 3))
        assert ssim(a, a) > 0.999
        assert ssim(a, rng.random((48, 48, 3))) < 0.2


class TestErrorMap:
    def test_error_map_training(self):
        """Error-guided sampling must run and update the map."""
        import jax.numpy as jnp
        scene = make_synthetic_scene(num_views=4, H=48, W=48, num_steps=64)
        trainer = tiny_setup(iters=25, error_map=True)
        state = trainer.init_state()
        state = trainer.fit(state, scene, log_every=0)
        em = np.asarray(state.error_map)
        assert em.shape == (4, 48 * 48)  # map res follows min(128, H, W)
        assert not np.allclose(em, 1.0)  # updated away from init
        assert (em >= 0).all()


class TestBudgetAutotune:
    def test_budget_shrinks_to_live_demand_and_training_continues(self):
        """budget_autotune re-jits samples_per_ray_budget toward the live p99
        demand (the N*B layout computes every slot, so slack is pure waste);
        eval keeps the configured budget."""
        from trinerflet_tpu.data.synthetic import make_synthetic_scene

        trainer = tiny_setup(iters=80)
        assert trainer.cfg.budget_autotune
        configured = trainer.render_cfg.samples_per_ray_budget
        scene = make_synthetic_scene(num_views=3, H=32, W=32, num_steps=24)
        state = trainer.init_state()
        state = trainer.fit(state, scene, log_every=0)
        state, aux = trainer._train_step(state, trainer.scene_to_device(scene))
        assert "samples_p99" in aux and "overflow_frac" in aux
        assert np.isfinite(float(aux["samples_p99"]))
        tuned = trainer.render_cfg.samples_per_ray_budget
        assert tuned <= configured
        assert trainer._budget_max == configured
        # eval path must keep the configured (deep) budget
        assert trainer.eval_render_cfg.samples_per_ray_budget >= configured
        # training still steps fine at the tuned shape
        state, aux2 = trainer._train_step(state, trainer.scene_to_device(scene))
        assert np.isfinite(float(aux2["loss"]))

    def test_global_fill_signal_reaches_aux(self):
        """The buffer-saturation retune reads aux['global_fill']; the train
        step must copy it through from the renderer output (it silently read
        0.0 forever when the key was missing, making the grow/fallback path
        dead code)."""
        import dataclasses

        from trinerflet_tpu.data.synthetic import make_synthetic_scene

        trainer = tiny_setup(iters=8, budget_autotune=False)
        trainer.render_cfg = dataclasses.replace(
            trainer.render_cfg, compaction="global", global_slots_per_ray=4)
        trainer._build_jits()
        scene = make_synthetic_scene(num_views=2, H=24, W=24, num_steps=16)
        state = trainer.init_state()
        state = trainer._update_grid(state, full=True)
        state, aux = trainer._train_step(state, trainer.scene_to_device(scene))
        assert "global_fill" in aux
        fill = float(aux["global_fill"])
        assert 0.0 <= fill <= 1.0

    def test_autotune_disabled_keeps_budget(self):
        from trinerflet_tpu.data.synthetic import make_synthetic_scene

        trainer = tiny_setup(iters=40, budget_autotune=False)
        configured = trainer.render_cfg.samples_per_ray_budget
        scene = make_synthetic_scene(num_views=2, H=24, W=24, num_steps=16)
        state = trainer.init_state()
        state = trainer.fit(state, scene, log_every=0)
        assert trainer.render_cfg.samples_per_ray_budget == configured

    def test_trunc_T_gates_budget_shrink(self):
        """The budget tuner must shrink only when capped rays are already
        opaque (trunc_T ~ 0) and must hold/grow while truncation is
        discarding visible radiance (trunc_T above budget_trunc_tol) — the
        hf-scene quality collapse of a static B cut (BENCH_notes
        r4_scatter_factored vs quality_fb_ab)."""
        import jax.numpy as jnp

        def fresh():
            t = tiny_setup(iters=40)
            s = t.init_state()
            return t, s._replace(occ=s.occ._replace(iter_density=jnp.int32(10)))

        aux_opaque = {"samples_p99": 400.0, "overflow_frac": 0.5,
                      "trunc_T": 0.0, "samples_mean": 3.0}
        trainer, state = fresh()
        configured = trainer.render_cfg.samples_per_ray_budget
        trainer._maybe_retune_march(state, aux_opaque)
        assert trainer.render_cfg.samples_per_ray_budget < configured
        assert trainer.render_cfg.samples_per_ray_budget >= 8

        aux_losing = dict(aux_opaque, trunc_T=0.5)
        trainer2, state2 = fresh()
        trainer2._maybe_retune_march(state2, aux_losing)
        # budget is already at the configured ceiling: must NOT shrink
        assert trainer2.render_cfg.samples_per_ray_budget == \
            trainer2._budget_max

    def test_trunc_T_signal_reaches_aux(self):
        from trinerflet_tpu.data.synthetic import make_synthetic_scene

        trainer = tiny_setup(iters=8, budget_autotune=False)
        scene = make_synthetic_scene(num_views=2, H=24, W=24, num_steps=16)
        state = trainer.init_state()
        state = trainer._update_grid(state, full=True)
        state, aux = trainer._train_step(state, trainer.scene_to_device(scene))
        assert "trunc_T" in aux and "samples_mean" in aux
        t = float(aux["trunc_T"])
        assert 0.0 <= t <= 1.0 + 1e-6

    def test_span_tune_gated_by_span_trunc_T(self):
        """The num_coarse span tune may shrink toward the live span p99 only
        while spatially-truncated rays end opaque; with visible residual it
        must not shrink below the bbox-exact span."""
        import jax.numpy as jnp

        def fresh():
            t = tiny_setup(iters=40)
            s = t.init_state()
            return t, s._replace(occ=s.occ._replace(iter_density=jnp.int32(10)))

        trainer, state = fresh()
        cfg = trainer.render_cfg
        import math
        worst = int(math.ceil(cfg.bound * cfg.max_steps / cfg.fine_per_coarse))
        seg = 2.0 * math.sqrt(3.0) / cfg.max_steps * cfg.fine_per_coarse
        aux = {"samples_p99": 4.0, "overflow_frac": 0.0, "trunc_T": 0.0,
               "samples_mean": 3.0, "span_p99": worst * seg * 0.4,
               "span_trunc_T": 0.0}
        trainer._maybe_retune_march(state, aux)
        tuned = trainer.render_cfg.num_coarse_override
        assert tuned and tuned < worst

        trainer2, state2 = fresh()
        aux2 = dict(aux, span_trunc_T=0.5)
        trainer2._maybe_retune_march(state2, aux2)
        nc2 = trainer2.render_cfg.num_coarse_override
        # only the (exact-safe) bbox tune may fire; never the span-p99 shrink
        span_shrunk = int(math.ceil(aux["span_p99"] * 1.1 / seg)) + 2
        span_shrunk = max(8, (span_shrunk + 7) // 8 * 8)
        from trinerflet_tpu.render.renderer import tuned_num_coarse
        import numpy as np
        bbox_t = tuned_num_coarse(trainer2._base_render_cfg,
                                  np.asarray(state2.occ.bbox))
        assert nc2 == bbox_t or nc2 is None or nc2 == 0

    def test_needed_seg_demand_tune_fires_on_full_volume(self):
        """On a full-volume scene the chord span_p99 never shrinks — the
        saturation-aware needed_seg_p99 (last occupied / last contributing
        coarse segment) must drive the shrink instead, under the same
        span_trunc_T gate (VERDICT r4 next #3a)."""
        import jax.numpy as jnp
        import math

        def fresh():
            t = tiny_setup(iters=40)
            s = t.init_state()
            return t, s._replace(occ=s.occ._replace(iter_density=jnp.int32(10)))

        trainer, state = fresh()
        cfg = trainer.render_cfg
        worst = int(math.ceil(cfg.bound * cfg.max_steps / cfg.fine_per_coarse))
        seg = 2.0 * math.sqrt(3.0) / cfg.max_steps * cfg.fine_per_coarse
        # chord p99 ~ worst span (full-volume scene), demand span tiny
        aux = {"samples_p99": 4.0, "overflow_frac": 0.0, "trunc_T": 0.0,
               "samples_mean": 3.0, "span_p99": worst * seg * 0.99,
               "span_trunc_T": 0.0, "needed_seg_p99": worst * 0.25}
        trainer._maybe_retune_march(state, aux)
        tuned = trainer.render_cfg.num_coarse_override
        demand_t = int(math.ceil(worst * 0.25 * 1.1)) + 2
        demand_t = max(8, (demand_t + 7) // 8 * 8)
        assert tuned == min(demand_t, worst), (tuned, demand_t, worst)

        # same demand, but truncated rays still transmissive: gate holds
        trainer2, state2 = fresh()
        aux2 = dict(aux, span_trunc_T=0.5)
        trainer2._maybe_retune_march(state2, aux2)
        assert trainer2.render_cfg.num_coarse_override in (0, None) or \
            trainer2.render_cfg.num_coarse_override >= demand_t

    def test_needed_seg_stat_in_aux_and_cadence(self):
        """needed_seg_p99 must appear in aux on with_stats steps and be
        bounded by the marched num_coarse; non-stats steps omit the sorted
        p99s but keep the cheap sum stats."""
        from trinerflet_tpu.data.synthetic import make_synthetic_scene

        trainer = tiny_setup(iters=8, budget_autotune=False)
        scene = make_synthetic_scene(num_views=2, H=24, W=24, num_steps=16)
        state = trainer.init_state()
        state = trainer._update_grid(state, full=True)
        data = trainer.scene_to_device(scene)
        state, aux = trainer._train_step(state, data, with_stats=True)
        assert "needed_seg_p99" in aux and "span_p99" in aux
        cfg = trainer.render_cfg
        import math
        worst = int(math.ceil(cfg.bound * cfg.max_steps / cfg.fine_per_coarse))
        assert 0.0 <= float(aux["needed_seg_p99"]) <= worst + 1
        state, aux2 = trainer._train_step(state, data, with_stats=False)
        assert "needed_seg_p99" not in aux2 and "samples_p99" not in aux2
        assert "trunc_T" in aux2 and "num_samples" in aux2
