"""LPIPS network: shapes, metric axioms, torch-state-dict conversion, and the
SR perceptual-consistency wiring (reference nerf/utils.py:316-362,
triplane_wavelet_sr.py:622-628). Runs with random weights — the architecture
and plumbing are what's under test; no pretrained weights exist offline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trinerflet_tpu.utils.lpips import (
    ALEX_CHANNELS,
    VGG_CHANNELS,
    init_lpips_params,
    load_torch_state_dict,
    lpips,
    make_lpips_fn,
)


@pytest.mark.parametrize("net,chans", [("alex", ALEX_CHANNELS), ("vgg", VGG_CHANNELS)])
def test_shapes_and_axioms(net, chans):
    params = init_lpips_params(jax.random.PRNGKey(0), net)
    assert [l.shape[0] for l in params["lins"]] == list(chans)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    d_ab = lpips(params, a, b, net=net)
    assert d_ab.shape == (2,)
    # identity -> 0; distinct -> > 0; symmetric
    np.testing.assert_allclose(np.asarray(lpips(params, a, a, net=net)), 0.0, atol=1e-5)
    assert float(d_ab.min()) > 0
    np.testing.assert_allclose(
        np.asarray(d_ab), np.asarray(lpips(params, b, a, net=net)), rtol=1e-5
    )


def test_differentiable():
    params = init_lpips_params(jax.random.PRNGKey(1), "alex")
    a = jnp.ones((1, 32, 32, 3)) * 0.5

    def f(x):
        return lpips(params, x, a, net="alex").sum()

    g = jax.grad(f)(a + 0.1)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_torch_state_dict_conversion():
    # build a fake torchvision alexnet state dict (OIHW) + lpips lin dict
    layout = [(64, 11, 3), (192, 5, 64), (384, 3, 192), (256, 3, 384), (256, 3, 256)]
    feat_idx = [0, 3, 6, 8, 10]  # torchvision alexnet conv positions
    rng = np.random.default_rng(2)
    bsd = {}
    for fi, (co, k, ci) in zip(feat_idx, layout):
        bsd[f"features.{fi}.weight"] = rng.standard_normal((co, ci, k, k)).astype(np.float32)
        bsd[f"features.{fi}.bias"] = rng.standard_normal((co,)).astype(np.float32)
    lsd = {
        f"lin{i}.model.1.weight": rng.uniform(0, 1, (1, c, 1, 1)).astype(np.float32)
        for i, c in enumerate(ALEX_CHANNELS)
    }
    params = load_torch_state_dict(bsd, lsd, net="alex")
    # HWIO conversion check on conv0
    w0 = np.asarray(params["backbone"]["conv0"]["w"])
    assert w0.shape == (11, 11, 3, 64)
    np.testing.assert_allclose(
        w0[..., 0, 5], bsd["features.0.weight"][5, 0], rtol=1e-6
    )
    a = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    d = lpips(params, a, jnp.roll(a, 5, axis=1), net="alex")
    assert np.isfinite(np.asarray(d)).all()


def test_meter_and_fn():
    from trinerflet_tpu.train.metrics import LPIPSMeter

    params = init_lpips_params(jax.random.PRNGKey(3), "alex")
    meter = LPIPSMeter.from_params(params, net="alex")
    assert meter.available
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    meter.update(x[None], x[None] * 0.5)
    assert np.isfinite(meter.measure()) and meter.measure() > 0
    # no weights -> unavailable, NaN
    empty = LPIPSMeter()
    assert not empty.available and np.isnan(empty.measure())
    assert make_lpips_fn() is None


def test_sr_perceptual_consistency_loss_runs():
    """Full SR HR-phase step with the LPIPS term enabled (random weights)."""
    from trinerflet_tpu.models.nerf import NeRFConfig
    from trinerflet_tpu.models.triplane import TriplaneConfig
    from trinerflet_tpu.render.renderer import RenderConfig
    from trinerflet_tpu.sr.guidance import make_resize_guidance
    from trinerflet_tpu.sr.system import SRConfig, SRSystem

    nerf_cfg = NeRFConfig(
        triplane=TriplaneConfig(channels=4, resolution=32, wavelet_scale=2,
                                low_res_scale=2),
        bound=1.0, hidden_dim=16, hidden_dim_color=16,
    )
    render_cfg = RenderConfig(bound=1.0, grid_size=16, max_steps=64,
                              samples_per_ray_budget=8)
    cfg = SRConfig(total_steps=2, sr_start_step=0, crop_size_lr=16,
                   lambda_lr_consistency_perceptual=0.1)
    lp = init_lpips_params(jax.random.PRNGKey(4), "alex")
    sys_ = SRSystem(nerf_cfg, render_cfg, cfg, make_resize_guidance(2),
                    lpips_params=lp, lpips_net="alex")
    state = sys_.init_state()
    state = state._replace(occ=state.occ._replace(
        occ=jnp.ones_like(state.occ.occ),
        occ_coarse=jnp.ones_like(state.occ.occ_coarse)))

    rng = np.random.default_rng(5)
    n = (16 * 2) ** 2
    ro = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
    d = rng.standard_normal((n, 3))
    rd = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    pgt = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)), jnp.float32)
    lgt = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)), jnp.float32)
    w = {k: jnp.float32(v) for k, v in
         [("l2_hr", 1.0), ("l1_hr", 0.0), ("consistency", 1.0),
          ("reg", 0.0), ("percep", 0.1), ("sds", 0.0)]}
    state2, aux = sys_._hr_step(state, ro, rd, pgt, lgt, w)
    assert np.isfinite(float(aux["loss"]))
    assert float(aux["consistency_perceptual"]) > 0
