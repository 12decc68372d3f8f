"""Quality gate for the closed-form dt_gamma>0 ladder (VERDICT r4 next #4).

Trains an LLFF-like synthetic capture (bound 4, cameras at radius 3, growing
dt) with the shipped closed-form ``dt_ladder``, then deep-evals held-out
views twice on the SAME checkpoint:

  A. closed-form ladder (production, ops/raymarch.py:228-263)
  B. exact sequential recurrence ``t_{k+1} = t_k + clamp(g t_k, dt_min,
     dt_max)`` via lax.scan — the reference CUDA law verbatim
     (raymarching.cu:345-398)

and reports the PSNR delta (bar: |delta| <= 0.1 dB). The unit test
tests/test_ops.py::test_closed_form_matches_recurrence pins positions to
rtol 3e-5; this proves the remaining fp differences don't move image metrics.

Run: python -m scripts.quality_dtgamma_ab            (TPU, ~10 min)
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from trinerflet_tpu.data.synthetic import make_synthetic_scene
from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.ops import raymarch as RM
from trinerflet_tpu.render.renderer import RenderConfig, mark_untrained_grid
from trinerflet_tpu.train.metrics import psnr
from trinerflet_tpu.train.trainer import Trainer, TrainConfig

BOUND = 4.0
DT_GAMMA = 1.0 / 128  # the cli.py --dt_gamma colmap/LLFF default


def dt_ladder_scan(t0, num_steps, dt_min, dt_max, g):
    """Exact sequential reference law (lax.scan; slow, ground truth)."""

    def body(t, _):
        dt = jnp.clip(t * g, dt_min, dt_max)
        return t + dt, (t, dt)

    _, (ts, dts) = jax.lax.scan(body, t0, None, length=num_steps)
    return ts.T, dts.T


def main(smoke: bool = False):
    import sys

    smoke = smoke or "--smoke" in sys.argv
    V, H, iters = (6, 48, 250) if smoke else (24, 200, 2000)
    for a in sys.argv:
        if a.startswith("--iters="):
            # the A/B evaluates the SAME checkpoint through both ladder
            # implementations, so the delta is training-length-independent;
            # a shorter fit still exercises the march fully
            iters = int(a.split("=")[1])
    scene = make_synthetic_scene(num_views=V, H=H, W=H, radius=3.0,
                                 num_steps=96 if smoke else 384,
                                 variant="hf", backend="jax")
    nerf_cfg = NeRFConfig(
        triplane=TriplaneConfig(channels=16, resolution=512, wavelet_scale=8,
                                init_sigma=0.1),
        bound=BOUND, hidden_dim=64, hidden_dim_color=64,
        compute_dtype="bfloat16",
    )
    render_cfg = RenderConfig(
        bound=BOUND, grid_size=128, density_thresh=1.0,
        max_steps=1024, dt_gamma=DT_GAMMA, samples_per_ray_budget=24,
        eval_samples_per_ray=96,
    )
    train_cfg = TrainConfig(lr=1e-2, iters=iters,
                            num_rays=512 if smoke else 8192,
                            wavelet_regularization=0.1, renderer="occgrid",
                            eval_chunk=16384)
    if smoke:
        nerf_cfg = NeRFConfig(
            triplane=TriplaneConfig(channels=4, resolution=64,
                                    wavelet_scale=2, init_sigma=0.1),
            bound=BOUND, hidden_dim=16, hidden_dim_color=16)
        render_cfg = RenderConfig(bound=BOUND, grid_size=32,
                                  density_thresh=0.05, max_steps=256,
                                  dt_gamma=DT_GAMMA, samples_per_ray_budget=16,
                                  eval_samples_per_ray=32)
    trainer = Trainer(nerf_cfg, render_cfg, train_cfg)
    grid = mark_untrained_grid(scene.poses, scene.intrinsics, render_cfg)
    state = trainer.init_state(density_grid=grid)
    t0 = time.time()
    state = trainer.fit(state, scene, log_every=500)
    wall = time.time() - t0

    holdout = range(0, scene.num_views, 3 if smoke else 6)

    def eval_psnr(tag):
        vals = []
        for v in holdout:
            img, _ = trainer.render_image(
                state.params, state.occ, scene.poses[v], scene.intrinsics,
                scene.H, scene.W, bg_color=1.0)
            gt = scene.images[v]
            gt = gt[..., :3] * gt[..., 3:] + 1.0 * (1.0 - gt[..., 3:])
            vals.append(psnr(np.asarray(img), gt))
        print(f"{tag}: per-view {['%.3f' % p for p in vals]}")
        return float(np.mean(vals))

    p_ladder = eval_psnr("A closed-form ladder")

    orig = RM.dt_ladder
    RM.dt_ladder = dt_ladder_scan
    try:
        # march_candidates is module-jitted: drop its persistent cache AND
        # the trainer's jit wrappers so the patched ladder is re-traced
        RM.march_candidates.clear_cache()
        trainer._build_jits()
        p_scan = eval_psnr("B sequential scan  ")
    finally:
        RM.dt_ladder = orig
        RM.march_candidates.clear_cache()
        trainer._build_jits()

    out = {
        "scene": "hf synthetic, 24 views 200^2, radius 3, bound 4, "
                 f"dt_gamma {DT_GAMMA:.6f}, max_steps 1024",
        "train": f"{iters} iters, 8192 rays, wall {wall:.0f}s",
        "deep_eval_views": list(holdout),
        "psnr_closed_form_ladder": round(p_ladder, 4),
        "psnr_sequential_scan": round(p_scan, 4),
        "delta_db": round(p_ladder - p_scan, 5),
        "bar": "|delta| <= 0.1 dB",
        "pass": bool(abs(p_ladder - p_scan) <= 0.1),
    }
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()
