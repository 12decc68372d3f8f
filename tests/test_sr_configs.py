"""The shipped SR recipe configs build and train through the real launcher.

Covers the three reference recipes (README.md:73-76 /
super_resolution/configs/{triplane-sr100_400_2, triplane-sr200_800_6,
triplane-sr_llff_best10_2}.yaml): each YAML parses, maps onto
TriplaneConfig/NeRFConfig/RenderConfig/SRConfig without unknown keys, and
runs a few real fit steps. Model/data sizes are shrunk via dotlist overrides
(the launcher's own mechanism) so the check exercises the config plumbing,
not CPU throughput.
"""

import os

import numpy as np
import pytest

from trinerflet_tpu.sr.config import apply_overrides, load_yaml_config
from trinerflet_tpu.sr.launch import build

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = [
    "triplane.resolution=64",
    "triplane.wavelet_scale=4",
    "triplane.channels=4",
    "model.hidden_dim=16",
    "model.hidden_dim_color=16",
    "renderer.grid_size=16",
    "renderer.max_steps=64",
    "renderer.samples_per_ray_budget=8",
    "system.total_steps=3",
    "system.sr_start_step=2",
    "system.hr_fit_refresh_every=2",
    "system.num_rays_lr=256",
    "system.crop_size_lr=8",
    "system.eval_chunk=1024",
    "guidance.num_inference_steps=2",
]


def _run(cfg_name, extra, tmp_path):
    cfg = load_yaml_config(os.path.join(REPO, "configs", cfg_name))
    cfg = apply_overrides(cfg, TINY + extra + [f"workspace={tmp_path}"])
    system, scene = build(cfg, str(tmp_path))
    state = system.init_state()
    state = system.fit(state, scene, log_every=0)
    assert int(state.step) == 3
    assert all(np.isfinite(np.asarray(x)).all()
               for x in (state.params["encoder"]["base"],))
    return system, scene


@pytest.mark.e2e
def test_sr100_400_config_builds_and_fits(tmp_path):
    system, scene = _run("triplane-sr100_400.yaml",
                         ["data.synthetic=true", "data.num_views=2",
                          "data.lr_size=16", "data.scale_ratio=4"], tmp_path)
    assert system.nerf_cfg.triplane.low_res_scale == 4


@pytest.mark.e2e
def test_sr100_400_cond_guidance_builds_and_fits(tmp_path):
    """guidance.kind=cond (conditioning-faithful SDEdit: the full DDIM tail
    with a weights-free denoiser seeing only real-denoiser inputs) dispatches
    through the launcher and trains."""
    system, _ = _run("triplane-sr100_400.yaml",
                     ["data.synthetic=true", "data.num_views=2",
                      "data.lr_size=16", "data.scale_ratio=4",
                      "guidance.kind=cond"], tmp_path)
    from trinerflet_tpu.sr.guidance import UpscalerGuidance

    assert isinstance(system.guidance, UpscalerGuidance)


@pytest.mark.e2e
def test_sr200_800_config_builds_and_fits(tmp_path):
    system, scene = _run("triplane-sr200_800.yaml",
                         ["data.synthetic=true", "data.num_views=2",
                          "data.lr_size=16", "data.scale_ratio=4"], tmp_path)
    # the 200->800 recipe's distinguishing knobs survive the override path
    assert float(system.cfg.wavelet_regularization) == 0.5


@pytest.mark.e2e
def test_sr_llff_config_builds_and_fits(tmp_path):
    from tests.test_llff import _write_llff_dataset

    root = str(tmp_path / "llff")
    _write_llff_dataset(root, V=6, H=40, W=52)
    system, scene = _run(
        "triplane-sr_llff.yaml",
        [f"data.root={root}", "data.hr_downscale=1", "data.scale_ratio=4",
         "data.llff_hold=5"], tmp_path)
    # NDC pregen rays reached the system (the LLFF recipe's defining feature)
    assert scene.pregen_rays
    assert system.guidance.cfg.guidance_scale == 2.5


def test_full_scale_configs_parse_without_unknown_keys():
    """The UNSHRUNK YAMLs map onto the dataclasses (no fit, no data)."""
    from trinerflet_tpu.models.nerf import NeRFConfig
    from trinerflet_tpu.models.triplane import TriplaneConfig
    from trinerflet_tpu.sr.config import parse_structured
    from trinerflet_tpu.sr.guidance import GuidanceConfig
    from trinerflet_tpu.sr.system import SRConfig

    for name in ("triplane-sr100_400.yaml", "triplane-sr200_800.yaml",
                 "triplane-sr_llff.yaml"):
        cfg = load_yaml_config(os.path.join(REPO, "configs", name))
        tri = TriplaneConfig(**cfg["triplane"])
        assert tri.resolution in (1024, 2048)
        g = dict(cfg["guidance"])
        g.pop("kind")
        parse_structured(GuidanceConfig, g)
        parse_structured(SRConfig, cfg["system"])
        NeRFConfig(triplane=tri, bound=cfg["model"]["bound"])
