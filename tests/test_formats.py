"""NSVF / NeRF++ dataset-format loaders (reference dataset_llff variants)."""

import os

import numpy as np
import pytest

from trinerflet_tpu.data.formats import load_nerfpp_scene, load_nsvf_scene

cv2 = pytest.importorskip("cv2")


def _pose(z=2.0):
    # OpenCV cam2world: camera at -z looking at origin (z axis forward)
    m = np.eye(4, dtype=np.float32)
    m[2, 3] = -z
    return m


def _write_img(path, h=12, w=16, v=128):
    img = np.full((h, w, 3), v, np.uint8)
    cv2.imwrite(path, img)


class TestNSVF:
    @pytest.fixture(scope="class")
    def root(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("nsvf"))
        os.makedirs(os.path.join(root, "rgb"))
        os.makedirs(os.path.join(root, "pose"))
        for i, pref in enumerate(["0_", "0_", "1_", "2_"]):
            stem = f"{pref}{i:04d}"
            _write_img(os.path.join(root, "rgb", stem + ".png"), v=60 * (i + 1) % 255)
            np.savetxt(os.path.join(root, "pose", stem + ".txt"), _pose(2.0 + i))
        K = np.eye(4)
        K[0, 0] = K[1, 1] = 20.0
        K[0, 2], K[1, 2] = 8.0, 6.0
        np.savetxt(os.path.join(root, "intrinsics.txt"), K)
        return root

    def test_split_and_shapes(self, root):
        tr = load_nsvf_scene(root, "train", scale=1.0)
        assert tr.images.shape == (2, 12, 16, 3)
        te = load_nsvf_scene(root, "test", scale=1.0)
        assert te.images.shape[0] == 1
        assert tr.intrinsics == (20.0, 20.0, 8.0, 6.0)
        assert np.isfinite(tr.poses).all()

    def test_scalar_intrinsics_form(self, root, tmp_path):
        np.savetxt(os.path.join(root, "intrinsics.txt"), np.asarray([20.0, 8.0, 6.0, 0.0]))
        tr = load_nsvf_scene(root, "train", scale=1.0)
        assert tr.intrinsics[0] == 20.0 and tr.intrinsics[2] == 8.0


class TestNeRFPP:
    @pytest.fixture(scope="class")
    def root(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("npp"))
        for split, n in [("train", 3), ("test", 2)]:
            for sub in ("rgb", "pose", "intrinsics"):
                os.makedirs(os.path.join(root, split, sub))
            for i in range(n):
                stem = f"{i:05d}"
                _write_img(os.path.join(root, split, "rgb", stem + ".png"))
                np.savetxt(os.path.join(root, split, "pose", stem + ".txt"),
                           _pose(2.0 + i).reshape(-1))
                K = np.eye(4)
                K[0, 0] = K[1, 1] = 24.0
                K[0, 2], K[1, 2] = 8.0, 6.0
                np.savetxt(os.path.join(root, split, "intrinsics", stem + ".txt"),
                           K.reshape(-1))
        return root

    def test_splits(self, root):
        tr = load_nerfpp_scene(root, "train", scale=1.0)
        te = load_nerfpp_scene(root, "test", scale=1.0)
        assert tr.images.shape == (3, 12, 16, 3)
        assert te.images.shape[0] == 2
        assert tr.intrinsics == (24.0, 24.0, 8.0, 6.0)
        # val falls back to test when no validation dir
        va = load_nerfpp_scene(root, "val", scale=1.0)
        assert va.images.shape[0] == 2

    def test_pose_convention_roundtrip(self, root):
        """A camera at -z (OpenCV, looking toward +z) must convert to an ngp
        pose whose forward axis points at the origin."""
        tr = load_nerfpp_scene(root, "train", scale=1.0)
        pose = tr.poses[0]
        center = pose[:3, 3]
        fwd = pose[:3, 2]
        to_origin = -center / (np.linalg.norm(center) + 1e-9)
        assert float(np.dot(fwd, to_origin)) > 0.99


class TestTopia:
    def test_load(self, tmp_path):
        import cv2

        root = str(tmp_path / "imgs")
        pdir = str(tmp_path / "poses")
        os.makedirs(root)
        os.makedirs(pdir)
        for i in range(3):
            _write_img(os.path.join(root, f"{i}.png"), h=16, w=16)
            m = np.eye(4)
            m[2, 3] = -1.0
            np.savetxt(os.path.join(pdir, f"p_{i:03d}.txt"), m.reshape(-1))
        from trinerflet_tpu.data.formats import load_topia_scene

        sc = load_topia_scene(root, pdir, render_res=128)
        assert sc.images.shape == (3, 16, 16, 3)
        assert sc.intrinsics[0] == 560.0 / 4
        # translation scaled by 2.2 then z-up -> y-up permute: z=-2.2 -> y
        np.testing.assert_allclose(sc.poses[0][:3, 3], [0, 2.2, 0], atol=1e-5)


class TestRTMV:
    def test_load_and_split(self, tmp_path):
        import json

        from trinerflet_tpu.data.formats import load_rtmv_scene

        root = str(tmp_path / "rtmv")
        os.makedirs(os.path.join(root, "images"))
        n = 8
        for i in range(n):
            c2w = np.eye(4, dtype=np.float64)
            c2w[:3, 3] = [0.1 * i, 0.2, 3.0]
            meta = {"camera_data": {
                "cam2world": c2w.T.tolist(),  # column-major, as RTMV writes
                "intrinsics": {"fx": 40.0, "fy": 40.0, "cx": 8.0, "cy": 6.0},
                "width": 16, "height": 12,
                "scene_center_3d_box": [0, 0, 0],
                "scene_min_3d_box": [-1, -1, -1],
                "scene_max_3d_box": [1, 1, 1],
            }}
            with open(os.path.join(root, f"{i:05d}.json"), "w") as f:
                json.dump(meta, f)
            _write_img(os.path.join(root, "images", f"{i:05d}.png"),
                       h=12, w=16, v=30 * (i + 1) % 255)

        sc = load_rtmv_scene(root, "all", scale=1.0)
        assert sc.images.shape == (n, 12, 16, 3)
        assert sc.poses.shape == (n, 4, 4)
        assert np.isfinite(sc.poses).all()
        assert sc.intrinsics == (40.0, 40.0, 8.0, 6.0)
        # frame-index splits: train = [0, 100) clamps to all 8 frames here
        tr = load_rtmv_scene(root, "train", scale=1.0)
        assert tr.images.shape[0] == n

    def test_cli_autodetect(self, tmp_path):
        from trinerflet_tpu.cli import detect_data_format

        root = str(tmp_path / "r2")
        os.makedirs(os.path.join(root, "images"))
        with open(os.path.join(root, "00000.json"), "w") as f:
            f.write("{}")
        assert detect_data_format(root) == "rtmv"
