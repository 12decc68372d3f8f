"""YAML-driven SR launcher.

Mirrors the reference ``super_resolution/launch.py``: load a YAML config (with
dotlist overrides), build the datamodule + system, train, then test and write
``final_results_{step}.json``.

Usage:
  python -m trinerflet_tpu.sr.launch --config configs/triplane-sr.yaml --train
  python -m trinerflet_tpu.sr.launch --config ... --test system.sr_start_step=0
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def build(cfg_dict, workspace):
    import jax.numpy as jnp

    from ..models.nerf import NeRFConfig
    from ..models.triplane import TriplaneConfig
    from ..render.renderer import RenderConfig
    from .config import parse_structured
    from .data import load_sr_blender, make_synthetic_sr_scene
    from .guidance import GuidanceConfig, make_oracle_guidance, make_resize_guidance
    from .system import SRConfig, SRSystem

    data_cfg = cfg_dict.get("data", {})
    if data_cfg.get("synthetic", False):
        scene = make_synthetic_sr_scene(
            num_views=data_cfg.get("num_views", 8),
            lr_size=data_cfg.get("lr_size", 32),
            scale=data_cfg.get("scale_ratio", 4),
            background_color=data_cfg.get("background_color", 0.0),
        )
    else:
        scene = load_sr_blender(
            data_cfg["root"],
            split=data_cfg.get("split", "train"),
            hr_downscale=data_cfg.get("hr_downscale", 1),
            scale_ratio=data_cfg.get("scale_ratio", 4),
            background_color=data_cfg.get("background_color", 0.0),
            data_scale=data_cfg.get("data_scale", 0.33),
        )

    tri_cfg = cfg_dict.get("triplane", {})
    tri = TriplaneConfig(
        channels=tri_cfg.get("channels", 16),
        resolution=tri_cfg.get("resolution", 1024),
        wavelet_scale=tri_cfg.get("wavelet_scale", 16),
        wavelet_type=tri_cfg.get("wavelet_type", "bior6.8"),
        low_res_scale=tri_cfg.get("low_res_scale", 4),
    )
    model_cfg = cfg_dict.get("model", {})
    nerf_cfg = NeRFConfig(
        triplane=tri,
        bound=model_cfg.get("bound", 1.0),
        hidden_dim=model_cfg.get("hidden_dim", 64),
        hidden_dim_color=model_cfg.get("hidden_dim_color", 64),
        compute_dtype=model_cfg.get("compute_dtype", "float32"),
    )
    rnd = cfg_dict.get("renderer", {})
    render_cfg = RenderConfig(
        bound=model_cfg.get("bound", 1.0),
        grid_size=rnd.get("grid_size", 128),
        density_thresh=rnd.get("density_thresh", 1.0),
        max_steps=rnd.get("max_steps", 512),
        samples_per_ray_budget=rnd.get("samples_per_ray_budget", 24),
    )
    sys_cfg = parse_structured(SRConfig, cfg_dict.get("system", {}))

    g_dict = cfg_dict.get("guidance", {})
    g_kind = g_dict.pop("kind", "resize")
    gcfg = parse_structured(GuidanceConfig, g_dict)
    if g_kind == "oracle":
        guidance = make_oracle_guidance(gcfg, jnp.asarray(scene.hr.images[..., :3]).mean(0, keepdims=True))
    elif g_kind == "resize":
        guidance = make_resize_guidance(gcfg, scale=scene.scale)
    else:
        raise ValueError(
            f"guidance kind {g_kind!r} unavailable offline; 'diffusion' requires "
            "x4-upscaler weights (plug a denoiser into sr.guidance.UpscalerGuidance)"
        )
    system = SRSystem(nerf_cfg, render_cfg, sys_cfg, guidance, workspace=workspace)
    return system, scene


def main(argv=None):
    from .config import apply_overrides, load_yaml_config

    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--train", action="store_true")
    p.add_argument("--test", action="store_true")
    p.add_argument("--workspace", default=None)
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    cfg = apply_overrides(load_yaml_config(args.config), args.overrides)
    workspace = args.workspace or cfg.get("workspace", "sr_workspace")
    os.makedirs(workspace, exist_ok=True)
    system, scene = build(cfg, workspace)

    ckpt = os.path.join(workspace, "sr_state.pkl")
    state = system.init_state()
    if os.path.exists(ckpt):
        import jax
        import jax.numpy as jnp

        with open(ckpt, "rb") as f:
            payload = pickle.load(f)
        state = state._replace(
            params=jax.tree.map(jnp.asarray, payload["params"]),
            step=jnp.asarray(payload["step"]),
        )
        state = system._update_grid(state)
        print(f"resumed from {ckpt} at step {payload['step']}")

    if args.train:
        state = system.fit(state, scene)
        import jax

        with open(ckpt, "wb") as f:
            pickle.dump({"params": jax.tree.map(np.asarray, state.params),
                         "step": int(state.step)}, f)
    if args.test or args.train:
        res = system.evaluate(state, scene)
        print(f"LR PSNR {res['PSNR_lr']:.3f} | HR PSNR {res['PSNR_hr']:.3f} "
              f"(bilinear {res['PSNR_bilinear']:.3f}) | HR SSIM {res['SSIM_hr']:.4f}")


if __name__ == "__main__":
    main()
