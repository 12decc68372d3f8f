"""One-command validation runbook for a real SD x4-upscaler checkpoint.

No pretrained weights ship in this image, so the diffusion stack is guarded
by golden pins (tests/test_diffusion_golden.py, test_diffusion_schedule.py).
A user WITH the checkpoint runs this to prove the whole chain end-to-end:

    python -m scripts.validate_sd_ckpt --path /ckpts/stable-diffusion-x4-upscaler

Stages (each prints PASS/FAIL; exit code is non-zero if any fail):

  1. layout    — diffusers directory layout resolves (unet/vae/text_encoder/
                 tokenizer/scheduler), the same components the reference's
                 StableDiffusionUpscalePipeline.from_pretrained consumes
                 (stable_diffusion_guidance_sr.py:94-97).
  2. keyset    — safetensors tensor names+shapes match (a) eval_shape of this
                 framework's init_*_params on the checkpoint's OWN config
                 (internal consistency) and (b) the pinned flagship manifest
                 (tests/fixtures/sd_x4_upscaler_manifest.json) when the
                 config is the published x4-upscaler.
  3. schedule  — scheduler_config.json builds a DiffusionSchedule whose
                 constants match the transcribed diffusers-0.16 math
                 (betas/alphas_cumprod/final-alpha/noise-level-20 coeffs).
  4. smoke     — build the real guidance (build_diffusion_guidance) and run a
                 2-step generate_sr on a random LR/HR pair; output finite,
                 in [0, 1], at x4 the LR resolution.

Offline self-test (exercised by tests/test_validate_sd_ckpt.py):

    python -m scripts.validate_sd_ckpt --synthesize /tmp/tiny_ckpt

writes a TINY structurally-faithful checkpoint (golden tiny configs, random
safetensors, precomputed prompt embeds) and validates it — the flagship
manifest comparison reports SKIP for a non-flagship config.
"""
import argparse
import glob
import json
import os
import sys

import numpy as np


def _find(path, *candidates):
    for c in candidates:
        p = os.path.join(path, c)
        if os.path.exists(p):
            return p
        hits = sorted(glob.glob(p))
        if hits:
            return hits[0]
    return None


class Report:
    def __init__(self):
        self.failed = []

    def result(self, stage, ok, detail=""):
        tag = "PASS" if ok else ("SKIP" if ok is None else "FAIL")
        print(f"[{tag}] {stage}" + (f": {detail}" if detail else ""))
        if ok is False:
            self.failed.append(stage)


def stage_layout(root, rep):
    files = {
        "unet_config": _find(root, "unet/config.json"),
        "unet_path": _find(root, "unet/diffusion_pytorch_model.safetensors",
                           "unet/*.safetensors"),
        "vae_config": _find(root, "vae/config.json"),
        "vae_path": _find(root, "vae/diffusion_pytorch_model.safetensors",
                          "vae/*.safetensors"),
        "text_config": _find(root, "text_encoder/config.json"),
        "text_encoder_path": _find(root, "text_encoder/model.safetensors",
                                   "text_encoder/*.safetensors"),
        "tokenizer_vocab": _find(root, "tokenizer/vocab.json"),
        "tokenizer_merges": _find(root, "tokenizer/merges.txt"),
        "scheduler_config": _find(root, "scheduler/scheduler_config.json"),
        "prompt_embeds": _find(root, "prompt_embeds.npz"),
    }
    required = ["unet_config", "unet_path", "vae_config", "vae_path",
                "scheduler_config"]
    missing = [k for k in required if files[k] is None]
    has_text = files["text_encoder_path"] and files["tokenizer_vocab"] and \
        files["tokenizer_merges"] and files["text_config"]
    if not has_text and files["prompt_embeds"] is None:
        missing.append("text_encoder (or prompt_embeds.npz)")
    rep.result("layout", not missing,
               f"missing: {missing}" if missing
               else f"all components found under {root}")
    return files, not missing


def _safetensor_shapes(path):
    """Tensor name -> shape without loading the data."""
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="numpy") as f:
        for name in f.keys():
            out[name] = list(f.get_slice(name).get_shape())
    return out


def _tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        name = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_tree_shapes(v, name))
        else:
            shape = list(v.shape)
            if len(shape) == 4:  # framework holds convs HWIO; ckpt is OIHW
                shape = [shape[3], shape[2], shape[0], shape[1]]
            out[name] = shape
    return out


def _diff_keysets(got, want):
    only_got = sorted(set(got) - set(want))
    only_want = sorted(set(want) - set(got))
    bad_shape = sorted(k for k in set(got) & set(want) if got[k] != want[k])
    return only_got, only_want, bad_shape


def stage_keyset(files, rep):
    import jax

    from trinerflet_tpu.sr.diffusion import (
        SD_X4_UPSCALER_UNET, SD_X4_UPSCALER_VAE, init_unet_params,
        init_vae_params, unet_config_from_json, vae_config_from_json)

    ok = True
    unet_cfg = unet_config_from_json(files["unet_config"])
    vae_cfg = vae_config_from_json(files["vae_config"])
    for comp, cfg, builder in [
        ("unet", unet_cfg, init_unet_params),
        ("vae", vae_cfg, init_vae_params),
    ]:
        got = _safetensor_shapes(files[f"{comp}_path"])
        want = _tree_shapes(
            jax.eval_shape(lambda k, c=cfg, b=builder: b(k, c),
                           jax.random.PRNGKey(0)))
        og, ow, bs = _diff_keysets(got, want)
        good = not (og or ow or bs)
        ok &= good
        rep.result(
            f"keyset/{comp} (vs checkpoint's own config)", good,
            f"{len(got)} tensors match" if good else
            f"extra={og[:4]} missing={ow[:4]} shape-mismatch={bs[:4]}")

    manifest_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "sd_x4_upscaler_manifest.json")
    if unet_cfg == SD_X4_UPSCALER_UNET and vae_cfg == SD_X4_UPSCALER_VAE and \
            os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
        for comp in ("unet", "vae"):
            got = _safetensor_shapes(files[f"{comp}_path"])
            og, ow, bs = _diff_keysets(got, manifest[comp])
            good = not (og or ow or bs)
            ok &= good
            rep.result(f"keyset/{comp} (vs pinned flagship manifest)", good,
                       "" if good else
                       f"extra={og[:4]} missing={ow[:4]} mismatch={bs[:4]}")
    else:
        rep.result("keyset (vs pinned flagship manifest)", None,
                   "config is not the published x4-upscaler; skipped")
    return ok


# Transcribed diffusers-0.16 scaled_linear constants for the published
# x4-upscaler scheduler (tests/test_diffusion_schedule.py:29-44).
GOLDEN = {
    "alphas_cumprod": {0: 0.99990000, 20: 0.99730128, 500: 0.33127458,
                       999: 7.3341246e-4},
    "final_alpha_cumprod": 0.9999,
    "nl20_sqrt_a": 0.99864973,
    "nl20_sqrt_1ma": 0.05194921,
}


def stage_schedule(files, rep):
    import jax.numpy as jnp

    from trinerflet_tpu.sr.guidance import DiffusionSchedule

    with open(files["scheduler_config"]) as f:
        sc = json.load(f)
    if sc.get("beta_schedule", "scaled_linear") != "scaled_linear":
        rep.result("schedule", False,
                   f"unsupported beta_schedule {sc.get('beta_schedule')!r}")
        return False
    sch = DiffusionSchedule(
        num_train_timesteps=sc.get("num_train_timesteps", 1000),
        beta_start=sc.get("beta_start", 0.0001),
        beta_end=sc.get("beta_end", 0.02),
        steps_offset=sc.get("steps_offset", 1),
        set_alpha_to_one=sc.get("set_alpha_to_one", False),
    )
    published = (sc.get("num_train_timesteps", 1000) == 1000
                 and abs(sc.get("beta_start", 1e-4) - 1e-4) < 1e-12
                 and abs(sc.get("beta_end", 0.02) - 0.02) < 1e-12
                 and not sc.get("set_alpha_to_one", False))
    if not published:
        rep.result("schedule", None,
                   "non-default scheduler config; golden constants skipped")
        return True
    bad = []
    for i, v in GOLDEN["alphas_cumprod"].items():
        got = float(sch.alphas_cumprod[i])
        if abs(got - v) > 2e-4 * v:
            bad.append((f"alphas_cumprod[{i}]", got, v))
    if abs(float(sch.final_alpha_cumprod) - GOLDEN["final_alpha_cumprod"]) > 1e-6:
        bad.append(("final_alpha_cumprod", float(sch.final_alpha_cumprod),
                    GOLDEN["final_alpha_cumprod"]))
    sa = float(jnp.sqrt(sch.alphas_cumprod[20]))
    s1 = float(jnp.sqrt(1.0 - sch.alphas_cumprod[20]))
    if abs(sa - GOLDEN["nl20_sqrt_a"]) > 1e-5 or \
            abs(s1 - GOLDEN["nl20_sqrt_1ma"]) > 1e-4:
        bad.append(("noise_level_20", (sa, s1),
                    (GOLDEN["nl20_sqrt_a"], GOLDEN["nl20_sqrt_1ma"])))
    ts = np.asarray(sch.ddim_timesteps(100))
    if not (ts[0] == 991 and ts[-1] == 1 and (np.diff(ts) == -10).all()):
        bad.append(("ddim_timesteps(100)", (int(ts[0]), int(ts[-1])),
                    (991, 1)))
    rep.result("schedule", not bad, f"mismatches: {bad}" if bad else
               "diffusers-0.16 constants reproduced")
    return not bad


def stage_smoke(files, rep, lr_size, steps, prompt):
    import time

    import jax
    import jax.numpy as jnp

    from trinerflet_tpu.sr.guidance import GuidanceConfig
    from trinerflet_tpu.sr.launch import build_diffusion_guidance

    weights = dict(files)
    weights["prompt"] = prompt
    weights["negative_prompt"] = ""
    if not (files.get("text_encoder_path") and files.get("tokenizer_vocab")):
        weights.pop("text_encoder_path", None)
    gcfg = GuidanceConfig(num_inference_steps=steps, noise_level=20,
                          guidance_scale=7.5)
    try:
        guidance = build_diffusion_guidance(gcfg, weights, "/tmp",
                                            kind="diffusion")
        rng = jax.random.PRNGKey(0)
        lr = jnp.clip(jax.random.uniform(rng, (1, lr_size, lr_size, 3)), 0, 1)
        hr = jax.image.resize(lr, (1, 4 * lr_size, 4 * lr_size, 3), "bilinear")
        t0 = time.time()
        out = np.asarray(guidance.generate_sr(rng, lr, hr))
        wall = time.time() - t0
    except Exception as e:  # noqa: BLE001 - runbook reports, not raises
        rep.result("smoke", False, f"{type(e).__name__}: {e}")
        return False
    good = (out.shape == (1, 4 * lr_size, 4 * lr_size, 3)
            and np.isfinite(out).all()
            and out.min() >= 0.0 and out.max() <= 1.0)
    rep.result("smoke", good,
               f"{steps}-step generate_sr at {lr_size}->{4 * lr_size} in "
               f"{wall:.1f}s, out range [{out.min():.3f}, {out.max():.3f}]")
    return good


# ---------------------------------------------------------------------------
# --synthesize: tiny structurally-faithful checkpoint for offline dry-runs
# ---------------------------------------------------------------------------

def synthesize(root, seed=0):
    import jax

    from trinerflet_tpu.sr.diffusion import (UNetConfig, VAEConfig,
                                             init_unet_params,
                                             init_vae_params)

    unet_cfg = UNetConfig(
        in_channels=7, out_channels=4, block_out_channels=(16, 24, 32),
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D",
                          "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
                        "UpBlock2D"),
        layers_per_block=1, cross_attention_dim=24,
        attention_head_dim=(2, 2, 2), norm_num_groups=8,
        use_linear_projection=True, class_embed_type="timestep")
    vae_cfg = VAEConfig(block_out_channels=(8, 16), latent_channels=4,
                        layers_per_block=1, norm_num_groups=4,
                        mid_attention=True)

    def dump_cfg(sub, payload):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
        with open(os.path.join(root, sub, "config.json"), "w") as f:
            json.dump(payload, f)

    dump_cfg("unet", {
        "in_channels": 7, "out_channels": 4,
        "block_out_channels": [16, 24, 32],
        "down_block_types": list(unet_cfg.down_block_types),
        "up_block_types": list(unet_cfg.up_block_types),
        "layers_per_block": 1, "cross_attention_dim": 24,
        "attention_head_dim": [2, 2, 2], "norm_num_groups": 8,
        "use_linear_projection": True, "class_embed_type": "timestep"})
    dump_cfg("vae", {
        "in_channels": 3, "out_channels": 3, "latent_channels": 4,
        "block_out_channels": [8, 16], "layers_per_block": 1,
        "norm_num_groups": 4})
    os.makedirs(os.path.join(root, "scheduler"), exist_ok=True)
    with open(os.path.join(root, "scheduler", "scheduler_config.json"), "w") as f:
        json.dump({"num_train_timesteps": 1000, "beta_start": 0.0001,
                   "beta_end": 0.02, "beta_schedule": "scaled_linear",
                   "steps_offset": 1, "set_alpha_to_one": False}, f)

    from safetensors.numpy import save_file

    def dump_weights(sub, tree):
        flat = {}
        for name, shape in _tree_shapes(tree).items():
            s = shape  # _tree_shapes reports torch layout already
            flat[name] = (np.random.default_rng(hash(name) % 2**32)
                          .normal(size=s).astype(np.float32) * 0.05)
        save_file(flat, os.path.join(
            root, sub, "diffusion_pytorch_model.safetensors"))

    dump_weights("unet", jax.eval_shape(
        lambda k: init_unet_params(k, unet_cfg), jax.random.PRNGKey(seed)))
    dump_weights("vae", jax.eval_shape(
        lambda k: init_vae_params(k, vae_cfg), jax.random.PRNGKey(seed)))
    rng = np.random.default_rng(seed)
    np.savez(os.path.join(root, "prompt_embeds.npz"),
             cond=rng.normal(size=(1, 8, 24)).astype(np.float32),
             uncond=rng.normal(size=(1, 8, 24)).astype(np.float32))
    print(f"synthesized tiny checkpoint at {root}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--path", help="diffusers checkpoint directory")
    ap.add_argument("--synthesize", metavar="DIR",
                    help="write a tiny offline test checkpoint, then validate it")
    ap.add_argument("--prompt", default="", help="conditioning prompt")
    ap.add_argument("--smoke-size", type=int, default=32,
                    help="LR side length for the generate_sr smoke")
    ap.add_argument("--smoke-steps", type=int, default=2,
                    help="DDIM steps for the smoke")
    args = ap.parse_args(argv)

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the env var alone still probes remote-TPU plugins during backend
        # discovery (can stall minutes if another process holds the chip);
        # pin the backend via config like the rest of the repo's CPU paths
        import jax

        jax.config.update("jax_platforms", "cpu")

    root = args.path
    if args.synthesize:
        synthesize(args.synthesize)
        root = root or args.synthesize
    if not root:
        ap.error("--path or --synthesize required")

    rep = Report()
    files, ok = stage_layout(root, rep)
    if ok:
        stage_keyset(files, rep)
        stage_schedule(files, rep)
        stage_smoke(files, rep, args.smoke_size, args.smoke_steps, args.prompt)
    print("RESULT:", "FAIL " + ",".join(rep.failed) if rep.failed else "PASS")
    return 1 if rep.failed else 0


if __name__ == "__main__":
    sys.exit(main())
