"""Print live trunc_T / span stats after bench-protocol warmup on (a) the
driver-bench synthetic scene and (b) the hf quality scene — calibrates the
budget_trunc_tol quality gate against the measured A/B outcomes."""
import os, subprocess, sys, time
import numpy as np
import jax.numpy as jnp
from trinerflet_tpu.data.synthetic import make_synthetic_scene
from trinerflet_tpu.data.blender import load_blender
from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.render import renderer as R
from trinerflet_tpu.train.trainer import Trainer, TrainConfig

def run(name, scene, nerf_cfg, rc, tc, warm=320):
    tr = Trainer(nerf_cfg, rc, tc)
    grid = R.mark_untrained_grid(scene.poses, scene.intrinsics, rc)
    st = tr.init_state(density_grid=grid)
    data = tr.scene_to_device(scene)
    aux = None
    for i in range(warm):
        if i % 16 == 0:
            st = tr._update_grid(st, full=int(st.occ.iter_density) < 16)
        st, aux = tr._train_step(st, data)
    print(f"{name}: B={rc.samples_per_ray_budget} trunc_T={float(aux['trunc_T']):.5f} "
          f"span_trunc_T={float(aux['span_trunc_T']):.5f} span_p99={float(aux['span_p99']):.3f} "
          f"overflow={float(aux['overflow_frac']):.3f} mean={float(aux['samples_mean']):.2f} "
          f"p99={float(aux['samples_p99']):.1f}", flush=True)

bench_nerf = NeRFConfig(triplane=TriplaneConfig(channels=16, resolution=1024, wavelet_scale=16),
                        bound=1.5, compute_dtype="bfloat16", plane_dtype="bfloat16")
for B in (20, 12):
    rc = R.RenderConfig(bound=1.5, grid_size=128, density_thresh=10.0, max_steps=1024,
                        samples_per_ray_budget=B, dt_gamma=0.0)
    tc = TrainConfig(lr=1e-2, iters=10000, num_rays=32768, wavelet_regularization=0.4,
                     renderer="occgrid", update_extra_interval=16, budget_autotune=False)
    run(f"bench-scene", make_synthetic_scene(num_views=8, H=256, W=256, num_steps=128),
        bench_nerf, rc, tc)

ROOT = "/tmp/hf_scene"
if not os.path.isdir(ROOT):
    subprocess.run([sys.executable, "-m", "scripts.gen_hf_scene", ROOT, "200", "40"],
                   check=True, cwd="/root/repo")
hf = load_blender(ROOT, split="train", scale=1.0)
hf_nerf = NeRFConfig(triplane=TriplaneConfig(channels=16, resolution=512, wavelet_scale=8),
                     bound=1.0, compute_dtype="bfloat16", plane_dtype="bfloat16")
for B in (24, 16, 12):
    rc = R.RenderConfig(bound=1.0, grid_size=128, density_thresh=10.0, max_steps=1024,
                        samples_per_ray_budget=B, dt_gamma=0.0, eval_samples_per_ray=96)
    tc = TrainConfig(lr=1e-2, iters=1000, num_rays=8192, wavelet_regularization=0.2,
                     renderer="occgrid", background_color=0.0, budget_autotune=False)
    run("hf-scene", hf, hf_nerf, rc, tc)
