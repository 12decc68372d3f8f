"""Resume the base-light run at stage 3 (2048) from the stage-2 checkpoint.
Run: nohup python -u -m scripts.resume_stage3 > /tmp/hf_bl3.log 2>&1 &
"""
import copy

from trinerflet_tpu.cli import STAGE_KEYS, build_configs, get_params, run_stage

ARGS = [
    "--path", "/tmp/hf_scene", "--workspace", "/tmp/hf_ws2", "-O",
    "--triplane_wavelet", "--scale", "1.0", "--bound", "1", "--dt_gamma", "0",
    "--background_color", "0", "--triplane_channels", "32",
    "--triplane_resolution", "512", "1024", "2048",
    "--triplane_wavelet_levels", "8", "16", "32",
    "--iters", "1000", "2000", "700",
    "--num_rays", "16384", "32768", "32768",
    "--lr", "1e-2", "1e-2", "1e-2",
    "--wavelet_regularization", "0.4", "0.4", "0.4",
    "--eval_samples_per_ray", "96", "--eval_interval_stages", "1000",
]

opt = get_params(ARGS)
opt.fp16 = True
opt.cuda_ray = True
opt.preload = True
opt_vars = vars(opt)


def stage_opt(i):
    o = copy.deepcopy(opt)
    for k in STAGE_KEYS:
        vals = opt_vars[k]
        vars(o)[k] = vals[i] if len(vals) == 3 else vals[0]
    return o

prev_cfgs = build_configs(stage_opt(1))  # stage-2 shapes for pyramid growth
run_stage(stage_opt(2), 2, prev_cfgs)
