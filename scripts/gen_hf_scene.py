"""Generate the high-frequency benchmark scene ON THE TPU (this host has one
CPU core; numpy GT rendering is ~30 s/view while the jitted renderer does the
whole scene in seconds).

Usage: python -m scripts.gen_hf_scene /tmp/hf_scene [H] [train_views]
"""
import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

from trinerflet_tpu.data.rays import rays_full_image
from trinerflet_tpu.data.synthetic import _ngp_to_blender, field_hf, orbit_pose


def make_render(H, W, num_steps=384, near=0.8, far=3.2):
    t = jnp.linspace(near, far, num_steps, dtype=jnp.float32)
    dt = float(t[1] - t[0])

    @jax.jit
    def render(rays_o, rays_d):
        def body(carry, tk):
            img, acc, T = carry
            pts = rays_o + rays_d * tk
            sigma, rgb = field_hf(pts, xp=jnp)
            alpha = 1.0 - jnp.exp(-sigma * dt)
            w = alpha * T
            return (img + w[:, None] * rgb, acc + w, T * (1.0 - alpha)), None

        n = rays_o.shape[0]
        init = (jnp.zeros((n, 3)), jnp.zeros((n,)), jnp.ones((n,)))
        (img, acc, _), _ = jax.lax.scan(body, init, t)
        return img, acc

    return render


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hf_scene"
    H = W = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    n_train = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    n_test = 8
    import cv2

    intr = (0.9 * W, 0.9 * W, W / 2.0, H / 2.0)
    render = make_render(H, W)
    chunk = 40000

    for split, n, seed in [("train", n_train, 0), ("val", n_test, 1), ("test", n_test, 1)]:
        os.makedirs(os.path.join(root, split), exist_ok=True)
        rng = np.random.default_rng(seed)
        frames = []
        for v in range(n):
            theta = np.arccos(1 - 1.6 * (v + 0.5) / n)
            phi = (v * 2.399963) % (2 * np.pi) + rng.uniform(0, 0.1)
            pose = orbit_pose(theta, phi, 2.0)
            ro, rd = rays_full_image(pose, intr, H, W)
            imgs, accs = [], []
            for s in range(0, H * W, chunk):
                re, ae = render(jnp.asarray(ro[s:s + chunk]), jnp.asarray(rd[s:s + chunk]))
                imgs.append(np.asarray(re))
                accs.append(np.asarray(ae))
            img = np.concatenate(imgs).reshape(H, W, 3)
            acc = np.concatenate(accs).reshape(H, W, 1)
            rgba = np.concatenate([img, acc], -1)
            u8 = (np.clip(rgba, 0, 1) * 255).astype(np.uint8)
            bgra = u8.copy()
            bgra[..., :3] = u8[..., 2::-1]
            cv2.imwrite(os.path.join(root, split, f"r_{v}.png"), bgra)
            frames.append({"file_path": f"./{split}/r_{v}",
                           "transform_matrix": _ngp_to_blender(pose).tolist()})
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": float(2 * np.arctan(0.5 / 0.9)),
                       "frames": frames}, f)
        print("split done:", split, flush=True)
    print("done:", root)


if __name__ == "__main__":
    main()
