import os
import numpy as np
import pytest

from trinerflet_tpu.data.llff import load_llff_scene, ndc_rays
from trinerflet_tpu.data.synthetic import field as analytic_field
from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.render.renderer import RenderConfig
from trinerflet_tpu.train.trainer import Trainer, TrainConfig


def _write_llff_dataset(root, V=6, H=40, W=52):
    """Tiny forward-facing dataset: cameras at z ~ +3.5 looking at -z (LLFF
    convention: z backward), imaging the analytic sphere scene."""
    import cv2

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    focal = 1.1 * W
    pb = []
    rngnp = np.random.default_rng(0)
    for v in range(V):
        c2w = np.eye(4, dtype=np.float32)[:3]
        c2w[:, 3] = [0.25 * np.sin(v), 0.15 * np.cos(v), 3.5 + 0.1 * rngnp.random()]
        # render: rays x right, y up, z backward
        i, j = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy")
        dirs = np.stack([(i - W / 2) / focal, -(j - H / 2) / focal, -np.ones_like(i)], -1)
        rays_d = dirs @ c2w[:3, :3].T
        rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape)
        img = np.zeros((H, W, 3), np.float32)
        T = np.ones((H, W), np.float32)
        ts = np.linspace(2.2, 4.8, 96)
        dt = ts[1] - ts[0]
        for t in ts:
            pts = rays_o + rays_d * t
            sigma, rgb = analytic_field(pts)
            a = 1 - np.exp(-sigma * dt)
            img += (a * T)[..., None] * rgb
            T *= 1 - a
        img += T[..., None] * 1.0  # white background
        cv2.imwrite(os.path.join(root, f"images/img_{v:03d}.png"),
                    (np.clip(img[..., ::-1], 0, 1) * 255).astype(np.uint8))
        # poses_bounds row: 3x5 [down right back | t | hwf] flattened + near/far
        m = np.zeros((3, 5), np.float32)
        # convert [right, up, back] -> storage convention [down, right, back]
        m[:, 0] = -c2w[:, 1]   # down = -up
        m[:, 1] = c2w[:, 0]    # right
        m[:, 2] = c2w[:, 2]    # back
        m[:, 3] = c2w[:, 3]
        m[:, 4] = [H, W, focal]
        pb.append(np.concatenate([m.ravel(), [2.0, 5.0]]))
    np.save(os.path.join(root, "poses_bounds.npy"), np.stack(pb))
    return root


class TestLLFF:
    @pytest.fixture(scope="class")
    def root(self, tmp_path_factory):
        return _write_llff_dataset(str(tmp_path_factory.mktemp("llff")))

    def test_load_shapes_and_split(self, root):
        train = load_llff_scene(root, "train", downscale=1, llff_hold=3)
        test = load_llff_scene(root, "test", downscale=1, llff_hold=3)
        assert train.num_views == 4 and test.num_views == 2
        assert train.rays_o.shape == (4, 40, 52, 3)
        assert train.images.shape == (4, 40, 52, 3)

    def test_ndc_rays_in_unit_cube(self, root):
        scene = load_llff_scene(root, "train", downscale=1)
        ends = scene.rays_o + scene.rays_d
        assert np.abs(scene.rays_o).max() <= 1.0 + 1e-5
        assert np.abs(ends).max() <= 1.0 + 1e-5

    def test_ndc_math(self):
        """NDC warp: rays through the image center map near plane->z=-1-ish
        consistent with the projective convention (o_z in [-1, 1])."""
        o = np.array([[0.0, 0.0, 0.0]], np.float32)
        d = np.array([[0.0, 0.0, -1.0]], np.float32)
        no, nd = ndc_rays(100, 100, 120.0, 1.0, o, d)
        assert abs(no[0, 0]) < 1e-6 and abs(no[0, 1]) < 1e-6
        np.testing.assert_allclose(no[0, 2], -1.0, atol=1e-6)  # at near plane
        np.testing.assert_allclose(nd[0, 2], 2.0, atol=1e-6)   # spans to +1 at inf

    @pytest.mark.e2e
    def test_fit_llff_scene(self, root):
        scene = load_llff_scene(root, "train", downscale=1, llff_hold=3)
        nerf_cfg = NeRFConfig(
            triplane=TriplaneConfig(channels=8, resolution=128, wavelet_scale=4),
            bound=1.0, hidden_dim=32, hidden_dim_color=32,
        )
        render_cfg = RenderConfig(bound=1.0, grid_size=32, density_thresh=0.5,
                                  max_steps=256, samples_per_ray_budget=48,
                                  min_near=0.0)
        train_cfg = TrainConfig(lr=2e-2, iters=120, num_rays=1024,
                                wavelet_regularization=0.01, renderer="occgrid",
                                background_color=1.0)
        tr = Trainer(nerf_cfg, render_cfg, train_cfg)
        state = tr.init_state()
        losses = []
        state = tr.fit(state, scene, log_every=0,
                       callback=lambda s, a: losses.append(float(a["loss"])))
        assert np.mean(losses[:15]) > 1.5 * np.mean(losses[-15:]), (
            np.mean(losses[:15]), np.mean(losses[-15:]))
        img, _ = tr.render_rays(state.params, state.occ, scene.rays_o[0],
                                scene.rays_d[0], scene.H, scene.W, bg_color=1.0)
        assert np.isfinite(img).all()
