"""HTTP orbit viewer (reference gui.py NeRFGUI parity, display-free)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.render.renderer import RenderConfig
from trinerflet_tpu.train.trainer import Trainer, TrainConfig
from trinerflet_tpu.utils.gui import NeRFGUI, OrbitCamera


def _tiny():
    nerf_cfg = NeRFConfig(
        triplane=TriplaneConfig(channels=4, resolution=32, wavelet_scale=2),
        bound=1.0)
    render_cfg = RenderConfig(bound=1.0, grid_size=16, density_thresh=0.01,
                              max_steps=32, samples_per_ray_budget=8)
    train_cfg = TrainConfig(lr=1e-2, iters=8, num_rays=128, renderer="occgrid",
                            eval_chunk=2048)
    return Trainer(nerf_cfg, render_cfg, train_cfg)


class TestOrbitCamera:
    def test_pose_looks_at_origin(self):
        cam = OrbitCamera(64, 64, radius=2.0)
        pose = cam.pose(1.2, 0.7)
        assert pose.shape == (4, 4)
        np.testing.assert_allclose(np.linalg.norm(pose[:3, 3]), 2.0, rtol=1e-5)
        # forward column points back at the origin
        fwd = pose[:3, 2]
        np.testing.assert_allclose(fwd, -pose[:3, 3] / 2.0, atol=1e-5)

    def test_intrinsics_fov(self):
        cam = OrbitCamera(64, 64, fovy=90.0)
        fx, fy, cx, cy = cam.intrinsics()
        np.testing.assert_allclose(fy, 32.0, rtol=1e-5)
        assert (cx, cy) == (32.0, 32.0)


@pytest.mark.e2e
class TestNeRFGUI:
    def test_frame_state_train_and_stop_over_http(self):
        trainer = _tiny()
        state = trainer.init_state()
        state = trainer._update_grid(state, full=True)
        gui = NeRFGUI(trainer, state, W=24, H=24, port=0)
        base = f"http://127.0.0.1:{gui.port}"
        from trinerflet_tpu.data.synthetic import make_synthetic_scene

        scene = make_synthetic_scene(num_views=2, H=24, W=24, num_steps=16)

        results = {}

        def client():
            results["page"] = urllib.request.urlopen(f"{base}/", timeout=30).read()
            results["frame"] = urllib.request.urlopen(
                f"{base}/frame?theta=1.2&phi=0.5&radius=2", timeout=60).read()
            results["state"] = json.loads(urllib.request.urlopen(
                f"{base}/state", timeout=30).read())
            urllib.request.urlopen(f"{base}/stop", timeout=30).read()

        t = threading.Thread(target=client, daemon=True)
        t.start()
        gui.train_loop(scene, max_iters=trainer.cfg.iters)
        # requests may arrive after training finished; keep serving until the
        # client thread drains
        import time as _time
        deadline = _time.time() + 120
        while t.is_alive() and _time.time() < deadline:
            gui.server.handle_request()
        t.join(timeout=5)
        gui.close()
        assert not t.is_alive()
        assert b"<html" in results["page"] or b"<!doctype" in results["page"]
        assert results["frame"][:2] == b"\xff\xd8"  # JPEG SOI marker
        assert results["state"]["step"] >= 0
        assert gui.step == trainer.cfg.iters
        assert np.isfinite(gui.loss)
