"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trinerflet_tpu.data.synthetic import make_synthetic_scene
from trinerflet_tpu.models.nerf import NeRFConfig
from trinerflet_tpu.models.triplane import TriplaneConfig
from trinerflet_tpu.render.renderer import RenderConfig
from trinerflet_tpu.train.trainer import Trainer, TrainConfig
from trinerflet_tpu.parallel.sharding import make_mesh, state_shardings, param_shardings


def _configs(num_rays=512):
    nerf_cfg = NeRFConfig(
        triplane=TriplaneConfig(channels=8, resolution=64, wavelet_scale=4),
        bound=1.0, hidden_dim=32, hidden_dim_color=32,
    )
    render_cfg = RenderConfig(bound=1.0, grid_size=32, density_thresh=1.0,
                              max_steps=128, samples_per_ray_budget=16)
    train_cfg = TrainConfig(lr=1e-2, iters=50, num_rays=num_rays,
                            renderer="occgrid")
    return nerf_cfg, render_cfg, train_cfg


@pytest.fixture(scope="module")
def scene():
    return make_synthetic_scene(num_views=4, H=48, W=48, num_steps=96)


class TestMesh:
    def test_make_mesh_shapes(self):
        assert len(jax.devices()) == 8
        m = make_mesh(model_parallel=2)
        assert m.shape == {"data": 4, "model": 2}

    def test_param_shardings_channel_split(self):
        nerf_cfg, _, _ = _configs()
        from trinerflet_tpu.models.nerf import init_nerf_params

        params = init_nerf_params(jax.random.PRNGKey(0), nerf_cfg)
        mesh = make_mesh(model_parallel=2)
        sh = param_shardings(mesh, params)
        assert sh["encoder"]["base"].spec == jax.sharding.PartitionSpec(None, "model")
        assert sh["sigma_net"]["w0"].spec == jax.sharding.PartitionSpec()


@pytest.mark.e2e
class TestShardedTraining:
    @pytest.mark.parametrize("model_parallel", [1, 2])
    def test_sharded_step_matches_single_device(self, scene, model_parallel):
        """The dp(+tp) sharded step must produce (numerically close) the same
        loss trajectory as the unsharded step with identical rng."""
        nerf_cfg, render_cfg, train_cfg = _configs()

        ref = Trainer(nerf_cfg, render_cfg, train_cfg)
        s_ref = ref.init_state()

        mesh = make_mesh(model_parallel=model_parallel)
        par = Trainer(nerf_cfg, render_cfg, train_cfg, mesh=mesh)
        s_par = par.init_state()
        shardings = state_shardings(mesh, s_par)
        s_par = jax.device_put(s_par, shardings)

        data = ref.scene_to_device(scene)

        losses_ref, losses_par = [], []
        for _ in range(3):
            s_ref, aux_r = ref._train_step(s_ref, data)
            s_par, aux_p = par._train_step(s_par, data)
            losses_ref.append(float(aux_r["loss"]))
            losses_par.append(float(aux_p["loss"]))
        np.testing.assert_allclose(losses_par, losses_ref, rtol=2e-3, atol=1e-5)

    def test_full_fit_on_mesh(self, scene):
        """A short sharded fit must actually reduce the loss."""
        nerf_cfg, render_cfg, train_cfg = _configs()
        mesh = make_mesh(model_parallel=2)
        tr = Trainer(nerf_cfg, render_cfg, train_cfg, mesh=mesh)
        state = jax.device_put(tr.init_state(), state_shardings(mesh, tr.init_state()))
        losses = []
        state = tr.fit(state, scene, log_every=0,
                       callback=lambda s, a: losses.append(float(a["loss"])))
        assert np.mean(losses[:5]) > np.mean(losses[-5:])


class TestMultihost:
    """Multi-host eval collation (reference DDP all_gather, utils.py:1270-1289).
    Single-process here: slicing covers all views and allgather is identity."""

    def test_view_slice_and_allgather_single_process(self):
        import numpy as np
        from trinerflet_tpu.parallel.multihost import (
            allgather_rows, is_primary, process_view_slice)

        assert is_primary()
        assert process_view_slice(5) == [0, 1, 2, 3, 4]
        rows = np.asarray([[2, 30.0, 0.9], [0, 28.0, 0.8], [1, 29.0, 0.85]], np.float32)
        out = allgather_rows(rows, 3)
        assert out[:, 0].tolist() == [0.0, 1.0, 2.0]

    def test_trainer_eval_reports_ssim_per_image(self, tmp_path):
        import numpy as np
        from trinerflet_tpu.data.synthetic import make_synthetic_scene
        from trinerflet_tpu.models.nerf import NeRFConfig
        from trinerflet_tpu.models.triplane import TriplaneConfig
        from trinerflet_tpu.render.renderer import RenderConfig
        from trinerflet_tpu.train.trainer import Trainer, TrainConfig

        scene = make_synthetic_scene(num_views=2, H=24, W=24, num_steps=32)
        tr = Trainer(
            NeRFConfig(triplane=TriplaneConfig(channels=4, resolution=32,
                                               wavelet_scale=2),
                       bound=1.0, hidden_dim=16, hidden_dim_color=16),
            RenderConfig(bound=1.0, grid_size=16, max_steps=64,
                         samples_per_ray_budget=8),
            TrainConfig(iters=1, num_rays=64, eval_chunk=1024),
            workspace=str(tmp_path),
        )
        state = tr.init_state()
        res = tr.evaluate(state, scene)
        assert len(res["per_image"]) == 2
        assert {"view", "PSNR", "SSIM"} <= set(res["per_image"][0])
        assert np.isfinite(res["PSNR"]) and np.isfinite(res["SSIM"])
