import os
import struct
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trinerflet_tpu.ops.losses import mape_loss, huber_loss, eff_distortion_loss
from trinerflet_tpu.data.colmap import read_cameras_bin, read_images_bin, load_colmap_poses
from trinerflet_tpu.utils.logging import ExperimentLogger, StepTimer


class TestLosses:
    def test_huber_small_is_quadratic(self):
        p = jnp.asarray([0.05])
        np.testing.assert_allclose(float(huber_loss(p, jnp.zeros(1), 0.1)),
                                   0.5 * 0.05**2, rtol=1e-6)

    def test_huber_large_is_linear(self):
        p = jnp.asarray([1.0])
        np.testing.assert_allclose(float(huber_loss(p, jnp.zeros(1), 0.1)),
                                   0.1 * (1.0 - 0.05), rtol=1e-6)

    def test_mape(self):
        np.testing.assert_allclose(
            float(mape_loss(jnp.asarray([2.0]), jnp.asarray([1.0]))),
            1.0 / 1.01, rtol=1e-5)

    def test_distortion_loss_matches_quadratic_reference(self):
        """O(N) prefix-sum form must equal the O(N^2) double sum."""
        rng = np.random.default_rng(0)
        N, T = 4, 16
        w = jnp.asarray(rng.random((N, T)), jnp.float32) * 0.1
        m = jnp.asarray(np.sort(rng.random((N, T)), -1), jnp.float32)
        iv = jnp.full((N, T), 0.01)
        fast = float(eff_distortion_loss(w, m, iv))
        wn, mn = np.asarray(w), np.asarray(m)
        ref = 0.0
        for n in range(N):
            ref += np.sum(wn[n][:, None] * wn[n][None, :] * np.abs(mn[n][:, None] - mn[n][None, :]))
            ref += (wn[n] ** 2 * 0.01).sum() / 3.0
        np.testing.assert_allclose(fast, ref / N, rtol=1e-4)


class TestColmap:
    def _write_model(self, d):
        # one SIMPLE_PINHOLE camera + two images
        with open(os.path.join(d, "cameras.bin"), "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<iiQQ", 1, 0, 64, 48))
            f.write(struct.pack("<3d", 60.0, 32.0, 24.0))
        with open(os.path.join(d, "images.bin"), "wb") as f:
            f.write(struct.pack("<Q", 2))
            for i, name in enumerate([b"b.png", b"a.png"]):
                f.write(struct.pack("<i", i + 1))
                f.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))  # identity quat
                f.write(struct.pack("<3d", 0.0, 0.0, float(i)))
                f.write(struct.pack("<i", 1))
                f.write(name + b"\x00")
                f.write(struct.pack("<Q", 0))
        return d

    def test_roundtrip(self, tmp_path):
        d = self._write_model(str(tmp_path))
        cams = read_cameras_bin(os.path.join(d, "cameras.bin"))
        assert cams[1].model == "SIMPLE_PINHOLE"
        assert cams[1].intrinsics == (60.0, 60.0, 32.0, 24.0)
        imgs = read_images_bin(os.path.join(d, "images.bin"))
        assert [im.name for im in imgs] == ["a.png", "b.png"]  # sorted
        names, poses, intr = load_colmap_poses(d)
        # identity rotation, t=(0,0,z) -> c2w translation = -t
        np.testing.assert_allclose(poses[0][:3, 3], [0, 0, -1], atol=1e-6)
        np.testing.assert_allclose(poses[0][:3, :3], np.eye(3), atol=1e-6)

    def test_slerp_test_path(self):
        """interpolate_pose_path: endpoints preserved, rotations stay valid,
        midpoint rotation is the geodesic halfway point (reference colmap
        slerp test path, provider.py:172-189)."""
        from scipy.spatial.transform import Rotation

        from trinerflet_tpu.data.colmap import interpolate_pose_path

        p0 = np.eye(4, dtype=np.float32)
        p1 = np.eye(4, dtype=np.float32)
        p1[:3, :3] = Rotation.from_euler("y", 90, degrees=True).as_matrix()
        p1[:3, 3] = [1.0, 2.0, 3.0]
        path = interpolate_pose_path(np.stack([p0, p1]), n_frames=9)
        assert path.shape == (9, 4, 4)
        np.testing.assert_allclose(path[0], p0, atol=1e-6)
        np.testing.assert_allclose(path[-1], p1, atol=1e-6)
        mid = path[4]
        expect = Rotation.from_euler("y", 45, degrees=True).as_matrix()
        np.testing.assert_allclose(mid[:3, :3], expect, atol=1e-5)
        np.testing.assert_allclose(mid[:3, 3], [0.5, 1.0, 1.5], atol=1e-6)
        # orthonormality along the path
        for R in path[:, :3, :3]:
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


class TestLoggingUtils:
    def test_logger_and_timer(self, tmp_path):
        lg = ExperimentLogger(str(tmp_path), "t", use_tensorboard=False)
        lg.text("hello", to_console=False)
        lg.scalars(1, {"loss": 0.5})
        lg.config({"a": 1})
        assert "hello" in open(lg.log_path).read()
        assert os.path.exists(os.path.join(str(tmp_path), "config.json"))
        t = StepTimer()
        t.tick(); t.tick()
        assert t.mean_ms >= 0


@pytest.mark.e2e
class TestTextTo3D:
    def test_generation_loop_runs(self, tmp_path):
        """Tiny generation round with oracle guidance: must run both the
        refresh and fit paths and decrease loss."""
        from trinerflet_tpu.sr.text_to_3d import TextTo3DSystem, TextTo3DConfig
        from trinerflet_tpu.sr.guidance import GuidanceConfig, make_oracle_guidance
        from trinerflet_tpu.models.nerf import NeRFConfig
        from trinerflet_tpu.models.triplane import TriplaneConfig
        from trinerflet_tpu.render.renderer import RenderConfig

        target = jnp.broadcast_to(
            jnp.asarray([0.8, 0.3, 0.2]), (1, 64, 64, 3)
        )
        guidance = make_oracle_guidance(
            GuidanceConfig(num_inference_steps=6, guidance_scale=1.0), target
        )
        nerf_cfg = NeRFConfig(
            triplane=TriplaneConfig(channels=8, resolution=64, wavelet_scale=4,
                                    low_res_scale=2),
            bound=1.0, hidden_dim=32, hidden_dim_color=32,
        )
        render_cfg = RenderConfig(bound=1.0, grid_size=32, density_thresh=0.5,
                                  max_steps=128, samples_per_ray_budget=16)
        cfg = TextTo3DConfig(total_steps=30, views_per_refresh=2,
                             refresh_every=20, render_size=64, num_rays=512,
                             eval_chunk=4096)
        sys = TextTo3DSystem(nerf_cfg, render_cfg, cfg, guidance, str(tmp_path))
        state = sys.init_state()
        losses = []
        state = sys.fit(state, log_every=0,
                        callback=lambda s, a: losses.append(float(a["loss"])))
        assert len(losses) == 30
        assert np.isfinite(losses).all()
        assert np.mean(losses[-5:]) < np.mean(losses[:5])
