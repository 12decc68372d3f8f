"""CLI dataset dispatch (--data_format): autodetection + end-to-end LLFF run.

Reference counterpart: get_dataset (provider.py:382-388) selected by flags in
main_nerf.py; here a single --data_format flag (with auto-sniffing) routes to
the loaders in data/.
"""
import glob
import json
import os

import numpy as np
import pytest

from trinerflet_tpu.cli import detect_data_format, get_params, load_scene, run
from trinerflet_tpu.data.synthetic import write_synthetic_scene

from .test_llff import _write_llff_dataset


class TestDetect:
    def test_blender(self, tmp_path):
        root = write_synthetic_scene(str(tmp_path / "scene"), num_views=2,
                                     num_test_views=1, H=24, W=24)
        assert detect_data_format(root) == "blender"

    def test_llff(self, tmp_path):
        root = _write_llff_dataset(str(tmp_path / "llff"), V=3, H=24, W=24)
        assert detect_data_format(root) == "llff"

    def test_unknown_raises(self, tmp_path):
        with pytest.raises(ValueError):
            detect_data_format(str(tmp_path))


class TestLoadScene:
    def test_llff_dispatch_returns_pregen_rays(self, tmp_path):
        root = _write_llff_dataset(str(tmp_path / "llff"), V=4, H=24, W=28)
        opt = get_params(["--path", root, "--data_format", "llff",
                          "--llff_ndc", "--llff_hold", "4",
                          "--llff_downscale", "1"])
        opt.downscale = 1
        scene = load_scene(opt, "train")
        assert scene.rays_o.shape == (3, 24, 28, 3)  # 1 of 4 views held out
        assert np.abs(scene.rays_o).max() <= 1.0 + 1e-5


@pytest.mark.e2e
class TestEndToEnd:
    def test_cli_trains_and_evals_llff(self, tmp_path):
        """python -m trinerflet_tpu.cli --data_format llff ... trains + evals
        (VERDICT r2 item 5)."""
        root = _write_llff_dataset(str(tmp_path / "llff"), V=6, H=32, W=32)
        ws = str(tmp_path / "ws")
        run(get_params([
            "--path", root, "--data_format", "llff", "--llff_ndc",
            "--llff_downscale", "1", "--llff_hold", "6",
            "--workspace", ws, "--triplane_wavelet",
            "--iters", "40", "--num_rays", "512",
            "--triplane_resolution", "64", "--triplane_wavelet_levels", "2",
            "--num_steps", "48", "--bound", "1", "--scale", "1.0",
            "--wavelet_regularization", "0.01", "--mute",
        ]))
        assert os.path.exists(os.path.join(ws, "latest_model.pkl"))
        with open(os.path.join(ws, "results_stage0.json")) as f:
            res = json.load(f)
        assert np.isfinite(res["PSNR"])


@pytest.mark.e2e
class TestCkptRotationAndBest:
    def test_rotating_and_best_checkpoints(self, tmp_path):
        """--eval_interval_stages saves rotating ckpt_NNNNNN.pkl (max_keep_ckpt)
        plus best_model.pkl; --ckpt best loads it in test mode (reference
        utils.py:1419-1438, 1466-1494)."""
        root = _write_llff_dataset(str(tmp_path / "llff"), V=6, H=32, W=32)
        ws = str(tmp_path / "ws")
        args = [
            "--path", root, "--data_format", "llff", "--llff_ndc",
            "--llff_downscale", "1", "--llff_hold", "3",
            "--workspace", ws, "--triplane_wavelet",
            "--iters", "30", "--num_rays", "256",
            "--triplane_resolution", "64", "--triplane_wavelet_levels", "2",
            "--num_steps", "48", "--bound", "1", "--scale", "1.0",
            "--wavelet_regularization", "0.01", "--mute",
            "--eval_interval_stages", "10", "--max_keep_ckpt", "2",
        ]
        run(get_params(args))
        kept = sorted(glob.glob(os.path.join(ws, "ckpt_*.pkl")))
        assert len(kept) == 2, kept  # 3 saved (10/20/30), oldest rotated out
        assert kept[0].endswith("ckpt_000020.pkl")
        assert os.path.exists(os.path.join(ws, "best_model.pkl"))
        run(get_params(args + ["--test", "--ckpt", "best"]))
        assert os.path.exists(os.path.join(ws, "results.json"))
