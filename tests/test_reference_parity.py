"""Operator-level parity against the ACTUAL reference implementation.

Every other quality protocol in this repo compares the framework against
itself; these tests run the reference's own torch code (CPU torch is
installed) on shared weights/inputs and assert agreement:

  * ``encoding.FreqEncoder``            vs ``ops.encoders.freq_encode``
  * ``activation.trunc_exp``            vs ``ops.activation.trunc_exp`` (+grad)
  * ``nerf.network.NeRFNetwork`` MLPs   vs ``models.nerf._mlp`` field math
  * ``nerf.renderer.NeRFRenderer.run``  vs ``render.renderer.render_dense``
    (reference renderer.py:126-254 — sampling law, compositing, upsampling,
    depth normalization, background blending)
  * ``triplaneencoder.TriPlaneVolume``  vs ``models.triplane`` (IDWT ladder
    pad/crop/2x semantics, plane projection bases, grid_sample border
    sampling, plane-major feature concat)

CUDA extensions and visualization-only deps are replaced with thin shims
(the raymarching near/far + SH/wavelet shims delegate to THIS framework, so
those specific ops are shared, not independently validated here — they have
their own golden tests; what these tests pin is all the reference-side math
AROUND them).
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from trinerflet_tpu.models.nerf import NeRFConfig, NeRFField, init_nerf_params, _mlp
from trinerflet_tpu.models.triplane import (TriplaneConfig, build_planes,
                                            init_triplane_params,
                                            sample_triplane)
from trinerflet_tpu.ops import raymarch as RM
from trinerflet_tpu.ops import wavelets as W
from trinerflet_tpu.ops.activation import trunc_exp
from trinerflet_tpu.ops.encoders import freq_encode, sh_encode
from trinerflet_tpu.render import renderer as R

REF = "/root/reference/reconstruction"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)


def _t2j(x):
    return jnp.asarray(x.detach().cpu().numpy())


def _j2t(x):
    return torch.from_numpy(np.asarray(x))


def _module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def _make_stubs():
    """sys.modules shims for the reference's CUDA extensions and
    vis/training-only deps, keyed by module name."""

    def near_far_from_aabb(rays_o, rays_d, aabb, min_near=0.2):
        n, f = RM.near_far_from_aabb(_t2j(rays_o), _t2j(rays_d), _t2j(aabb),
                                     float(min_near))
        return _j2t(n), _j2t(f)

    def sph_from_ray(rays_o, rays_d, radius):
        return _j2t(RM.sph_from_ray(_t2j(rays_o), _t2j(rays_d), float(radius)))

    class SHEncoder:
        """aux_libs/shencoder shim -> this repo's sh_encode."""

        def __init__(self, input_dim=3, degree=4):
            self.input_dim, self.degree = input_dim, degree
            self.output_dim = degree**2

        def __call__(self, inputs, size=1):
            return _j2t(sh_encode(_t2j(inputs) / size, self.degree))

    class DWTForward:
        def __init__(self, J=1, wave="bior6.8", mode="zero"):
            assert J == 1 and mode == "zero"
            self.wave = wave

        def __call__(self, x):
            yl, yh = W.dwt2d(_t2j(x), self.wave)
            return _j2t(yl), [_j2t(yh)]

    class DWTInverse:
        def __init__(self, wave="bior6.8", mode="zero"):
            assert mode == "zero"
            self.wave = wave

        def __call__(self, arg):
            yl, yhs = arg
            return _j2t(W.idwt2d(_t2j(yl), _t2j(yhs[0]), self.wave))

    class _EMA:  # torch_ema shim (never exercised)
        def __init__(self, *a, **k):
            pass

    tm = _module("torchmetrics")
    tm.functional = _module(
        "torchmetrics.functional",
        structural_similarity_index_measure=lambda *a, **k: None,
    )
    return {
        "raymarching": _module("raymarching",
                               near_far_from_aabb=near_far_from_aabb,
                               sph_from_ray=sph_from_ray),
        "shencoder": _module("shencoder", SHEncoder=SHEncoder),
        "pytorch_wavelets": _module("pytorch_wavelets",
                                    DWTForward=DWTForward,
                                    DWTInverse=DWTInverse),
        "trimesh": _module("trimesh"),
        "mcubes": _module("mcubes"),
        "lpips": _module("lpips"),
        "torch_ema": _module("torch_ema", ExponentialMovingAverage=_EMA),
        "torchvision": _module("torchvision"),
        "torchmetrics": tm,
        "torchmetrics.functional": tm.functional,
    }


@pytest.fixture(scope="module")
def ref():
    """The reference modules, imported once with extensions stubbed."""
    added_mods = []
    stubs = _make_stubs()
    for name, mod in stubs.items():
        if name not in sys.modules:
            sys.modules[name] = mod
            added_mods.append(name)
    sys.path.insert(0, REF)
    try:
        import activation as ref_activation
        import encoding as ref_encoding
        import nerf.network as ref_network
        import triplaneencoder.triplane_encoder as ref_tenc

        yield types.SimpleNamespace(
            activation=ref_activation,
            encoding=ref_encoding,
            network=ref_network,
            tenc=ref_tenc,
        )
    finally:
        sys.path.remove(REF)
        for name in added_mods:
            sys.modules.pop(name, None)


# ---------------------------------------------------------------------------
# encoders / activation
# ---------------------------------------------------------------------------


class TestFreqEncoder:
    def test_matches_reference(self, ref):
        """encoding.py FreqEncoder (pure torch; the math the CUDA freqencoder
        implements, per the commented-out line at encoding.py:56)."""
        multires = 6
        enc = ref.encoding.FreqEncoder(
            input_dim=3, max_freq_log2=multires - 1, N_freqs=multires,
            log_sampling=True, include_input=True,
        )
        x = np.random.default_rng(0).uniform(-2, 2, (64, 3)).astype(np.float32)
        theirs = enc(torch.from_numpy(x)).numpy()
        ours = np.asarray(freq_encode(jnp.asarray(x), multires))
        assert theirs.shape == ours.shape
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestTruncExp:
    def test_forward_and_grad_match_reference(self, ref):
        x = np.array([-20.0, -3.0, 0.0, 2.5, 14.0, 20.0], np.float32)
        tx = torch.tensor(x, requires_grad=True)
        ty = ref.activation.trunc_exp(tx)
        ty.sum().backward()
        ours = np.asarray(trunc_exp(jnp.asarray(x)))
        np.testing.assert_allclose(ours, ty.detach().numpy(), rtol=1e-6)
        g = jax.grad(lambda v: trunc_exp(v).sum())(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(g), tx.grad.numpy(), rtol=1e-6)


# ---------------------------------------------------------------------------
# NeRFNetwork MLPs (network.py:111-160) on shared weights
# ---------------------------------------------------------------------------


def _make_ref_network(ref, **kw):
    defaults = dict(
        encoding="None", encoding_dir="sphere_harmonics",
        num_layers=2, hidden_dim=32, geo_feat_dim=15,
        num_layers_color=3, hidden_dim_color=32,
        bound=1, cuda_ray=False, density_scale=1, min_near=0.2,
        density_thresh=0.01, bg_radius=-1,
    )
    defaults.update(kw)
    net = ref.network.NeRFNetwork(**defaults)
    net.eval()
    return net


def _port_mlp_weights(rng, modulelist):
    """Random-init a torch ModuleList of bias-free Linears and return the
    matching {w_i: (in, out)} jax dict."""
    params = {}
    for i, lin in enumerate(modulelist):
        w = rng.standard_normal(lin.weight.shape).astype(np.float32) * 0.3
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(w))
        params[f"w{i}"] = jnp.asarray(w.T)  # torch Linear stores (out, in)
    return params


class TestNeRFNetworkMLPs:
    def test_density_color_match_reference(self, ref):
        net = _make_ref_network(ref)
        rng = np.random.default_rng(1)
        sigma_params = _port_mlp_weights(rng, net.sigma_net)
        color_params = _port_mlp_weights(rng, net.color_net)

        x = rng.uniform(-1, 1, (128, 3)).astype(np.float32)
        d = rng.standard_normal((128, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)

        with torch.no_grad():
            t_sigma, t_color = net(torch.from_numpy(x), torch.from_numpy(d))

        # our field math on the same weights: encoding 'None' = identity, so
        # the MLP chain sees raw coords (the production _mlp/trunc_exp/
        # sh_encode path, exactly as NeRFField wires them)
        h = _mlp(sigma_params, jnp.asarray(x), jnp.float32)
        sigma = trunc_exp(h[..., 0])
        geo = h[..., 1:]
        sh = sh_encode(jnp.asarray(d), 4)
        rgb = jax.nn.sigmoid(
            _mlp(color_params, jnp.concatenate([sh, geo], -1), jnp.float32)
        )
        np.testing.assert_allclose(np.asarray(sigma), t_sigma.numpy(),
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rgb), t_color.numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# Pure-tensor renderer run() (renderer.py:126-254) vs render_dense
# ---------------------------------------------------------------------------


class TestDenseRendererParity:
    @pytest.mark.parametrize("upsample", [0, 16])
    def test_run_matches_render_dense(self, ref, upsample):
        net = _make_ref_network(ref)
        rng = np.random.default_rng(2)
        sigma_params = _port_mlp_weights(rng, net.sigma_net)
        color_params = _port_mlp_weights(rng, net.color_net)

        N, T = 64, 32
        rays_o = rng.uniform(-0.3, 0.3, (N, 3)).astype(np.float32)
        rays_d = rng.standard_normal((N, 3)).astype(np.float32)
        rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)

        with torch.no_grad():
            out_ref = net.run(
                torch.from_numpy(rays_o)[None], torch.from_numpy(rays_d)[None],
                num_steps=T, upsample_steps=upsample, perturb=False,
                bg_color=torch.tensor([0.2, 0.5, 0.8]),
            )

        def density_fn(pts):
            h = _mlp(sigma_params, pts, jnp.float32)
            return trunc_exp(h[..., 0]), h[..., 1:]

        def color_fn(d, geo):
            sh = sh_encode(d, 4)
            return jax.nn.sigmoid(
                _mlp(color_params, jnp.concatenate([sh, geo], -1), jnp.float32)
            )

        cfg = R.RenderConfig(bound=1.0, num_steps=T, upsample_steps=upsample,
                             min_near=0.2)
        ours = R.render_dense(density_fn, color_fn, jnp.asarray(rays_o),
                              jnp.asarray(rays_d), cfg,
                              bg_color=jnp.asarray([0.2, 0.5, 0.8]),
                              perturb=False)
        # upsampling goes through inverse-CDF resampling where a 1-ulp cdf
        # difference moves a sample across a bin edge — agreement there is
        # ~1e-4, not 1e-5
        atol = 2e-5 if upsample == 0 else 2e-4
        np.testing.assert_allclose(
            np.asarray(ours["image"]), out_ref["image"][0].numpy(), atol=atol)
        np.testing.assert_allclose(
            np.asarray(ours["depth"]), out_ref["depth"][0].numpy(), atol=atol)
        # note: the reference returns weights_sum un-reshaped as (N,) (run()
        # only views image/depth back to the [B, N] prefix)
        np.testing.assert_allclose(
            np.asarray(ours["weights_sum"]),
            out_ref["weights_sum"].reshape(-1).numpy(), atol=atol)


# ---------------------------------------------------------------------------
# TriPlaneVolume: IDWT ladder + projection + sampling on shared coefficients
# ---------------------------------------------------------------------------


class TestTriplaneEncoderParity:
    @pytest.mark.parametrize("wave,res,scale", [
        ("bior6.8", 64, 4),
        ("bior4.4", 48, 4),
        ("bior6.8", 64, 8),
    ])
    def test_planes_and_sampling_match_reference(self, ref, wave, res, scale):
        """The paper's core op end-to-end: reference TriPlaneVolume (with its
        DWT shimmed to this repo's verified transform) against
        models/triplane.py on identical coefficients. Validates the ladder
        (yl=2x scaling, pad gating, level order), the projection bases and
        the sampler's border/align-corners law, and the plane-major concat."""
        C = 4
        tpv = ref.tenc.TriPlaneVolume(
            number_of_features=C, plane_resolution=res, init_sigma=0.1,
            lbound=1, viewdir_plane_resolution=-1,
            apply_activation_on_features=False,
            inner_multi_res_scale=scale, inner_multi_res_scale_current=1,
            wavelet_type=wave,
        )
        cfg = TriplaneConfig(channels=C, resolution=res, wavelet_scale=scale,
                             wavelet_type=wave, lbound=1.0)
        params = init_triplane_params(jax.random.PRNGKey(3), cfg)
        rng = np.random.default_rng(4)
        # randomize detail levels (zero-init would hide level-order bugs)
        for i in range(cfg.num_learnable_levels):
            k = f"level_{i}"
            params["wavelets"][k] = jnp.asarray(
                rng.standard_normal(params["wavelets"][k].shape)
                .astype(np.float32) * 0.05
            )

        with torch.no_grad():
            tpv.planes_features.copy_(_j2t(params["base"]))
            assert len(tpv.planes_features_wavelet_coefs) == cfg.num_learnable_levels
            for i in range(cfg.num_learnable_levels):
                tpv.planes_features_wavelet_coefs[i].copy_(
                    _j2t(params["wavelets"][f"level_{i}"]))

        with torch.no_grad():
            planes_ref = tpv.get_planes()  # (3, C, H, W)
        ours = build_planes(params, cfg)["full"]  # (3, H, W, C)
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(ours, (0, 3, 1, 2))),
            planes_ref.numpy(), atol=1e-4,
        )

        coords = rng.uniform(-1.1, 1.1, (96, 3)).astype(np.float32)
        with torch.no_grad():
            feats_ref = tpv(torch.from_numpy(coords), bound=1)  # (N, 3C)
        feats_ours = sample_triplane({"full": ours}, jnp.asarray(coords), cfg)
        np.testing.assert_allclose(
            np.asarray(feats_ours), feats_ref.numpy(), atol=1e-4)


# ---------------------------------------------------------------------------
# Full field: reference NeRFNetwork with the triplane encoder
# ---------------------------------------------------------------------------


class TestFullFieldParity:
    def test_triplane_field_matches_reference(self, ref):
        """NeRFNetwork(encoding='triplane_wavelet') forward vs NeRFField on
        shared encoder coefficients AND shared MLP weights: the complete
        density+color query both frameworks run per sample."""
        C, res, scale = 4, 32, 2
        net = _make_ref_network(
            ref, encoding="triplane_wavelet", triplane_channels=C,
            triplane_resolution=res, triplane_wavelet_levels=scale,
            learn_rotation_axis=False, dropout=0, wavelet_type="bior6.8",
            lbound_auto_scale=False, upscale_ratio_bound=-1,
            upscale_levels=2, wavelet_base_resolution=0,
        )
        cfg = NeRFConfig(
            triplane=TriplaneConfig(channels=C, resolution=res,
                                    wavelet_scale=scale, lbound=1.0),
            num_layers=2, hidden_dim=32, geo_feat_dim=15,
            num_layers_color=3, hidden_dim_color=32, bound=1.0,
        )
        params = init_nerf_params(jax.random.PRNGKey(5), cfg)
        rng = np.random.default_rng(6)
        params["sigma_net"] = _port_mlp_weights(rng, net.sigma_net)
        params["color_net"] = _port_mlp_weights(rng, net.color_net)
        enc = params["encoder"]
        enc["wavelets"]["level_0"] = jnp.asarray(
            rng.standard_normal(enc["wavelets"]["level_0"].shape)
            .astype(np.float32) * 0.05)
        with torch.no_grad():
            net.encoder.planes_features.copy_(_j2t(enc["base"]))
            net.encoder.planes_features_wavelet_coefs[0].copy_(
                _j2t(enc["wavelets"]["level_0"]))
        net.encoder.reset_cahce()

        x = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
        d = rng.standard_normal((64, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        with torch.no_grad():
            t_sigma, t_rgb = net(torch.from_numpy(x), torch.from_numpy(d))

        field = NeRFField(cfg)
        planes = field.build_planes(params)
        sigma, rgb = field(params, planes, jnp.asarray(x), jnp.asarray(d))
        np.testing.assert_allclose(np.asarray(sigma), t_sigma.numpy(),
                                   rtol=3e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rgb), t_rgb.numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# Trained-model rendering parity: train a scene HERE, then render the SAME
# checkpoint through the reference's pure-tensor run() (renderer.py:126-254)
# and through this framework's render_dense / occgrid deep eval. Makes the
# 0.1 dB agreement bar cross-IMPLEMENTATION on trained weights, not just on
# random-weight operators (VERDICT r4 next #5).
# ---------------------------------------------------------------------------


def _img_psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


@pytest.mark.e2e
class TestTrainedModelRenderParity:
    def test_trained_checkpoint_matches_reference_run(self, ref):
        from trinerflet_tpu.data.rays import rays_full_image
        from trinerflet_tpu.data.synthetic import make_synthetic_scene
        from trinerflet_tpu.render.renderer import mark_untrained_grid
        from trinerflet_tpu.train.trainer import Trainer, TrainConfig

        C, res, scale = 8, 64, 2
        nerf_cfg = NeRFConfig(
            triplane=TriplaneConfig(channels=C, resolution=res,
                                    wavelet_scale=scale, init_sigma=0.1),
            bound=1.0, num_layers=2, hidden_dim=32, geo_feat_dim=15,
            num_layers_color=3, hidden_dim_color=32,
        )
        render_cfg = R.RenderConfig(
            bound=1.0, grid_size=32, density_thresh=1.0, max_steps=256,
            num_steps=128, samples_per_ray_budget=48, min_near=0.2,
        )
        train_cfg = TrainConfig(
            lr=2e-2, iters=300, num_rays=1024, wavelet_regularization=0.02,
            renderer="occgrid", eval_chunk=4096, update_extra_interval=16,
            ema_decay=0.0,
        )
        scene = make_synthetic_scene(num_views=10, H=48, W=48, num_steps=128)
        trainer = Trainer(nerf_cfg, render_cfg, train_cfg)
        grid = mark_untrained_grid(scene.poses, scene.intrinsics, render_cfg)
        state = trainer.init_state(density_grid=grid)
        state = trainer.fit(state, scene, log_every=0)
        params = jax.tree.map(lambda x: np.asarray(x, np.float32), state.params)

        # ---- port the trained checkpoint into the reference NeRFNetwork
        net = _make_ref_network(
            ref, encoding="triplane_wavelet", triplane_channels=C,
            triplane_resolution=res, triplane_wavelet_levels=scale,
            learn_rotation_axis=False, dropout=0, wavelet_type="bior6.8",
            lbound_auto_scale=False, upscale_ratio_bound=-1,
            upscale_levels=2, wavelet_base_resolution=0,
        )
        with torch.no_grad():
            for i, lin in enumerate(net.sigma_net):
                lin.weight.copy_(
                    torch.from_numpy(params["sigma_net"][f"w{i}"].T))
            for i, lin in enumerate(net.color_net):
                lin.weight.copy_(
                    torch.from_numpy(params["color_net"][f"w{i}"].T))
            net.encoder.planes_features.copy_(
                torch.from_numpy(params["encoder"]["base"]))
            net.encoder.planes_features_wavelet_coefs[0].copy_(
                torch.from_numpy(params["encoder"]["wavelets"]["level_0"]))
        net.encoder.reset_cahce()

        # ---- full-image render, matched sampling (dense, perturb off)
        H = W = scene.H
        rays_o, rays_d = rays_full_image(scene.poses[0], scene.intrinsics, H, W)
        rays_o = rays_o.reshape(-1, 3).astype(np.float32)
        rays_d = rays_d.reshape(-1, 3).astype(np.float32)
        with torch.no_grad():
            out_ref = net.run(
                torch.from_numpy(rays_o)[None], torch.from_numpy(rays_d)[None],
                num_steps=128, upsample_steps=0, perturb=False,
                bg_color=torch.ones(3),
            )
        ref_img = out_ref["image"][0].numpy().reshape(H, W, 3)

        jparams = state.params
        field = trainer.field
        planes = field.build_planes(jparams)
        out = R.render_dense(
            lambda x: field.density(jparams, planes, x),
            lambda d, g: field.color(jparams, d, g),
            jnp.asarray(rays_o), jnp.asarray(rays_d), R.RenderConfig(
                bound=1.0, num_steps=128, upsample_steps=0, min_near=0.2),
            bg_color=jnp.ones(3), perturb=False,
        )
        our_img = np.asarray(out["image"]).reshape(H, W, 3)

        gt = scene.images[0]
        gt = gt[..., :3] * gt[..., 3:] + 1.0 * (1.0 - gt[..., 3:])
        cross = _img_psnr(our_img, ref_img)
        p_ours, p_ref = _img_psnr(our_img, gt), _img_psnr(ref_img, gt)
        assert cross > 45.0, f"cross-implementation PSNR {cross:.2f}"
        assert abs(p_ours - p_ref) <= 0.1, (p_ours, p_ref, cross)

        # ---- occgrid deep eval on the same checkpoint: the production eval
        # path must not LOSE quality vs the reference's dense quadrature
        # (it is usually better — occupancy culling concentrates the sample
        # budget inside content, a finer effective dt than 128 uniform steps)
        img_occ, _ = trainer.render_image(
            state.params, state.occ, scene.poses[0], scene.intrinsics, H, W,
            bg_color=1.0)
        p_occ = _img_psnr(np.asarray(img_occ), gt)
        assert p_occ >= p_ref - 0.2, (p_occ, p_ref)
