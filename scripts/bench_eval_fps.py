"""Test-time (eval) rendering throughput on a trained checkpoint (VERDICT r4
next #8 — the reference logs render fps at ``--test`` with deep sampling,
nerf/utils.py:887-888).

Loads a trained workspace (default: the base-light recipe run), then times
full-frame deep-eval renders (eval_samples_per_ray 96, stride-1 exact
occupancy tests) at the scene resolution and at 800^2 (the nerf-synthetic
test resolution the reference quotes fps at).

Run: python -m scripts.bench_eval_fps [workspace] [scene_dir]
"""
import json
import sys
import time

import numpy as np

from trinerflet_tpu.cli import build_configs, get_params, load_scene
from trinerflet_tpu.train.trainer import Trainer

WS = sys.argv[1] if len(sys.argv) > 1 else "workspaces/hf_bl_r5"
SCENE = sys.argv[2] if len(sys.argv) > 2 else "/tmp/hf_scene"

ARGS = [
    "--path", SCENE, "--workspace", WS, "-O",
    "--triplane_wavelet", "--scale", "1.0", "--bound", "1", "--dt_gamma", "0",
    "--background_color", "0", "--triplane_channels", "32",
    "--triplane_resolution", "2048", "--triplane_wavelet_levels", "32",
    "--num_rays", "32768", "--wavelet_regularization", "0.4",
    "--eval_samples_per_ray", "96",
]


def main():
    opt = get_params(ARGS)
    opt.fp16 = True
    opt.cuda_ray = True
    opt.preload = True
    nerf_cfg, render_cfg, train_cfg = build_configs(opt)
    trainer = Trainer(nerf_cfg, render_cfg, train_cfg, workspace=WS)
    state = trainer.load_checkpoint(f"{WS}/latest_model.pkl")
    test = load_scene(opt, "test")

    rows = {}
    for H in (test.H, 800):
        fx = test.intrinsics[0] * H / test.H
        intr = (fx, fx, H / 2.0, H / 2.0)
        # warm (compile) + timed frames
        img, _ = trainer.render_image(state.params, state.occ, test.poses[0],
                                      intr, H, H)
        n_frames = 8
        t0 = time.perf_counter()
        for v in range(n_frames):
            img, _ = trainer.render_image(
                state.params, state.occ, test.poses[v % test.num_views],
                intr, H, H)
        np.asarray(img)  # host sync
        dt = (time.perf_counter() - t0) / n_frames
        rows[f"{H}x{H}"] = {
            "ms_per_frame": round(dt * 1e3, 1),
            "fps": round(1.0 / dt, 3),
            "rays_per_s": round(H * H / dt),
        }
        print(H, rows[f"{H}x{H}"])
    print(json.dumps({"deep_eval_render_fps": rows,
                      "config": "2048^2/32ch bf16, eval_samples_per_ray 96, "
                                "stride-1 exact occupancy"}, indent=1))


if __name__ == "__main__":
    main()
