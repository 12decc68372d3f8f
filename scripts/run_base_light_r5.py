"""Base-light recipe end-to-end re-run (VERDICT r4 next #2).

Runs the full 3-stage base-light recipe (reference README.md:49: triplane
512/1024/2048, iters 1000/2000/6000) on the hf hard scene with all autotuners
on and the quad-packed 2048 sampler live, timing each stage, then deep-evals
the test split. Pass bar: stage-3 wall <= 3400 s, final deep-eval PSNR >=
31.86 dB (the r3 value at stage-3 iters=700).

Run: nohup python -u -m scripts.run_base_light_r5 > /tmp/hf_bl_r5.log 2>&1 &
"""
import copy
import json
import time

from trinerflet_tpu.cli import STAGE_KEYS, build_configs, get_params, load_scene, run_stage

ARGS = [
    "--path", "/tmp/hf_scene", "--workspace", "/tmp/hf_bl_r5", "-O",
    "--triplane_wavelet", "--scale", "1.0", "--bound", "1", "--dt_gamma", "0",
    "--background_color", "0", "--triplane_channels", "32",
    "--triplane_resolution", "512", "1024", "2048",
    "--triplane_wavelet_levels", "8", "16", "32",
    "--iters", "1000", "2000", "6000",
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


walls = []
prev_cfgs = None
trainer = state = None
for i in range(3):
    o = stage_opt(i)
    print(f"===== stage {i + 1}/3: res={o.triplane_resolution} iters={o.iters}",
          flush=True)
    t0 = time.time()
    prev_cfgs, trainer, state = run_stage(o, i, prev_cfgs)
    walls.append(round(time.time() - t0, 1))
    print(f"[stage {i + 1}] wall {walls[-1]} s", flush=True)

# final deep eval on the test split (4 views, eval_samples_per_ray=96)
o3 = stage_opt(2)
test_scene = load_scene(o3, "test")
t0 = time.time()
res = trainer.evaluate(state, test_scene, use_ema=o3.test_with_ema, tag="r5_final")
eval_wall = round(time.time() - t0, 1)

out = {
    "recipe": "base-light 512/1024/2048 x 1000/2000/6000, 32ch, hf scene",
    "stage_walls_s": walls,
    "stage3_wall_s": walls[2],
    "stage3_bar_s": 3400,
    "final_test_psnr_deep96": res["PSNR"],
    "psnr_bar": 31.86,
    "eval_wall_s": eval_wall,
}
print(json.dumps(out, indent=1), flush=True)
with open("/tmp/hf_bl_r5/r5_base_light_result.json", "w") as f:
    json.dump(out, f, indent=1)
