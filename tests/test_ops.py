import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from trinerflet_tpu.ops.grid_sample import grid_sample_2d, sample_planes
from trinerflet_tpu.ops.encoders import sh_encode, freq_encode, sh_dim, freq_dim
from trinerflet_tpu.ops.activation import trunc_exp
from trinerflet_tpu.ops.morton import morton3d, morton3d_invert, packbits
from trinerflet_tpu.ops import raymarch as RM


class TestGridSample:
    def test_matches_torch_grid_sample(self):
        """Golden test vs torch F.grid_sample(bilinear, border, align_corners=True)
        — the exact call the reference makes (triplane_encoder.py:329)."""
        rng = np.random.default_rng(0)
        H, W, C, N = 17, 23, 5, 400
        plane = rng.standard_normal((H, W, C)).astype(np.float32)
        coords = (rng.random((N, 2)).astype(np.float32) * 2.4 - 1.2)  # includes out-of-range

        ours = np.asarray(grid_sample_2d(jnp.asarray(plane), jnp.asarray(coords)))

        t_plane = torch.from_numpy(plane).permute(2, 0, 1)[None]  # 1,C,H,W
        t_coords = torch.from_numpy(coords)[None, :, None, :]     # 1,N,1,2
        t_out = F.grid_sample(t_plane, t_coords, mode="bilinear",
                              padding_mode="border", align_corners=True)
        t_out = t_out[0, :, :, 0].T.numpy()                       # N,C
        np.testing.assert_allclose(ours, t_out, atol=1e-5)

    def test_coordinate_gradient(self):
        """d(sample)/d(coords) must exist and be finite (SR analytic normals
        differentiate through the encoder; reference grid_backward.py)."""
        plane = jnp.asarray(np.random.default_rng(1).standard_normal((8, 8, 2)), jnp.float32)
        coords = jnp.asarray([[0.3, -0.2], [0.9, 0.9]], jnp.float32)
        g = jax.grad(lambda c: grid_sample_2d(plane, c).sum())(coords)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0

    def test_sample_planes_shapes(self):
        planes = jnp.zeros((3, 16, 16, 4))
        coords = jnp.zeros((3, 10, 2))
        out = sample_planes(planes, coords)
        assert out.shape == (10, 3, 4)


class TestEncoders:
    @pytest.mark.parametrize("degree", [1, 2, 3, 4, 5, 6, 7, 8])
    def test_sh_orthonormality(self, degree):
        """Real SH must be orthonormal over the unit sphere: this catches any
        wrong coefficient/normalization without fixing a sign convention."""
        rng = np.random.default_rng(0)
        v = rng.standard_normal((200000, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        Y = np.asarray(sh_encode(jnp.asarray(v, jnp.float32), degree), np.float64)
        G = (Y.T @ Y) / len(v) * (4 * np.pi)  # Monte-Carlo Gram matrix
        np.testing.assert_allclose(G, np.eye(sh_dim(degree)), atol=0.12)

    def test_sh_degree4_values(self):
        """Spot-check the degree-4 basis at canonical directions."""
        z = jnp.asarray([[0.0, 0.0, 1.0]])
        Y = np.asarray(sh_encode(z, 4))[0]
        assert abs(Y[0] - 0.28209479) < 1e-6
        assert abs(Y[2] - 0.48860251) < 1e-6  # the z component of l=1
        assert abs(Y[1]) < 1e-6 and abs(Y[3]) < 1e-6

    def test_freq_encode(self):
        x = jnp.asarray([[0.5, -0.25, 1.0]])
        out = np.asarray(freq_encode(x, degree=2))
        assert out.shape[-1] == freq_dim(3, 2)
        np.testing.assert_allclose(out[0, :3], [0.5, -0.25, 1.0], atol=1e-6)
        np.testing.assert_allclose(out[0, 3], np.sin(0.5), atol=1e-6)
        np.testing.assert_allclose(out[0, 9], np.sin(1.0), atol=1e-6)  # 2^1*x: sin(2*0.5)


class TestTruncExp:
    def test_forward_is_exp(self):
        x = jnp.asarray([-2.0, 0.0, 3.0])
        np.testing.assert_allclose(np.asarray(trunc_exp(x)), np.exp([-2, 0, 3]), rtol=1e-5)

    def test_gradient_clamped(self):
        g = jax.grad(lambda x: trunc_exp(x).sum())(jnp.asarray([20.0, -20.0, 1.0]))
        g = np.asarray(g)
        np.testing.assert_allclose(g[0], np.exp(15.0), rtol=1e-5)  # clamped at 15
        np.testing.assert_allclose(g[1], np.exp(-15.0), rtol=1e-5)
        np.testing.assert_allclose(g[2], np.exp(1.0), rtol=1e-5)


class TestMorton:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        coords = rng.integers(0, 128, (1000, 3)).astype(np.int32)
        codes = morton3d(jnp.asarray(coords))
        back = np.asarray(morton3d_invert(codes))
        np.testing.assert_array_equal(back, coords)

    def test_known_codes(self):
        assert int(morton3d(jnp.asarray([[1, 0, 0]], jnp.int32))[0]) == 1
        assert int(morton3d(jnp.asarray([[0, 1, 0]], jnp.int32))[0]) == 2
        assert int(morton3d(jnp.asarray([[0, 0, 1]], jnp.int32))[0]) == 4
        assert int(morton3d(jnp.asarray([[7, 7, 7]], jnp.int32))[0]) == 511

    def test_packbits(self):
        grid = jnp.asarray([0.5, 0.0, 0.5, 0.0, 0.0, 0.0, 0.0, 0.5], jnp.float32)
        bits = np.asarray(packbits(grid, 0.1))
        assert bits.shape == (1,)
        assert bits[0] == 0b10000101


class TestNearFar:
    def test_unit_cube(self):
        o = jnp.asarray([[0.0, 0.0, -3.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
        near, far = RM.near_far_from_aabb(o, d, aabb, min_near=0.2)
        np.testing.assert_allclose(float(near[0]), 2.0, atol=1e-5)
        np.testing.assert_allclose(float(far[0]), 4.0, atol=1e-5)

    def test_miss(self):
        o = jnp.asarray([[0.0, 5.0, -3.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
        near, far = RM.near_far_from_aabb(o, d, aabb)
        assert float(near[0]) > 1e30 and float(far[0]) > 1e30

    def test_min_near_clamp(self):
        o = jnp.asarray([[0.0, 0.0, 0.0]])  # inside the box
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
        near, _ = RM.near_far_from_aabb(o, d, aabb, min_near=0.2)
        np.testing.assert_allclose(float(near[0]), 0.2, atol=1e-6)


class TestMarchAndComposite:
    def _setup(self, occ_fill=True):
        N = 8
        rng = np.random.default_rng(0)
        o = np.zeros((N, 3), np.float32)
        o[:, 2] = -2.0
        d = np.zeros((N, 3), np.float32)
        d[:, 2] = 1.0
        aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
        near, far = RM.near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), aabb)
        occ = jnp.full((1, 32, 32, 32), occ_fill, bool)
        return o, d, near, far, occ

    def test_march_all_occupied(self):
        o, d, near, far, occ = self._setup()
        res = RM.march_candidates(
            jnp.asarray(o), jnp.asarray(d), near, far, occ,
            jnp.zeros(len(o)), num_steps=192, max_steps=128, grid_size=32,
            cascades=1, bound=1.0, dt_gamma=0.0)
        v = np.asarray(res.valid)
        # ray crosses [-1, 1] in z: length 2, dt = 2*sqrt3/128 => ~73 steps
        expect = int(np.ceil(2.0 / (2 * RM.SQRT3 / 128)))
        assert abs(v.sum(1)[0] - expect) <= 1

    def test_march_empty_grid(self):
        o, d, near, far, occ = self._setup(occ_fill=False)
        res = RM.march_candidates(
            jnp.asarray(o), jnp.asarray(d), near, far, occ,
            jnp.zeros(len(o)), num_steps=192, max_steps=128, grid_size=32,
            cascades=1, bound=1.0, dt_gamma=0.0)
        assert np.asarray(res.valid).sum() == 0

    def test_compact_and_composite_matches_dense(self):
        """The compacted segment compositing must agree with the dense
        cumprod reference on identical samples."""
        o, d, near, far, occ = self._setup()
        # random occupancy to create gaps
        rng = np.random.default_rng(3)
        occ = jnp.asarray(rng.random((1, 32, 32, 32)) > 0.4)
        N = len(o)
        res = RM.march_candidates(
            jnp.asarray(o), jnp.asarray(d), near, far, occ,
            jnp.zeros(N), num_steps=192, max_steps=128, grid_size=32,
            cascades=1, bound=1.0, dt_gamma=0.0)
        comp = RM.compact_samples(jnp.asarray(o), jnp.asarray(d), res,
                                  m_budget=1024, bound=1.0)
        M = comp.xyzs.shape[0]
        sig_np = rng.random(M).astype(np.float32) * 3.0
        rgb_np = rng.random((M, 3)).astype(np.float32)
        sig, rgb = jnp.asarray(sig_np), jnp.asarray(rgb_np)
        ws, depth, img, _zv = RM.composite_compact(sig, rgb, comp, N, T_thresh=0.0)

        # dense reference: scatter compacted samples back per ray
        ws_ref = np.zeros(N)
        img_ref = np.zeros((N, 3))
        dep_ref = np.zeros(N)
        rid = np.asarray(comp.ray_id)
        for n in range(N):
            idx = np.nonzero(rid == n)[0]
            T = 1.0
            for i in idx:
                a = 1 - np.exp(-sig_np[i] * float(comp.dts[i]))
                w = a * T
                ws_ref[n] += w
                img_ref[n] += w * rgb_np[i]
                dep_ref[n] += w * float(comp.ts[i])
                T *= 1 - a
        np.testing.assert_allclose(np.asarray(ws), ws_ref, atol=1e-4)
        np.testing.assert_allclose(np.asarray(img), img_ref, atol=1e-4)
        np.testing.assert_allclose(np.asarray(depth), dep_ref, atol=1e-4)

    def test_early_termination_masks_tail(self):
        """Samples after transmittance collapse must get zero weight."""
        o, d, near, far, occ = self._setup()
        N = len(o)
        res = RM.march_candidates(
            jnp.asarray(o), jnp.asarray(d), near, far, occ,
            jnp.zeros(N), num_steps=128, max_steps=128, grid_size=32,
            cascades=1, bound=1.0, dt_gamma=0.0)
        comp = RM.compact_samples(jnp.asarray(o), jnp.asarray(d), res,
                                  m_budget=1024, bound=1.0)
        sig = jnp.full((1024,), 1e4, jnp.float32)  # opaque everywhere
        rgb = jnp.ones((1024, 3), jnp.float32)
        ws, _, img, _zv = RM.composite_compact(sig, rgb, comp, N, T_thresh=1e-4)
        np.testing.assert_allclose(np.asarray(ws), 1.0, atol=1e-3)
        np.testing.assert_allclose(np.asarray(img), 1.0, atol=1e-3)

    def test_composite_gradients_finite(self):
        o, d, near, far, occ = self._setup()
        N = len(o)
        res = RM.march_candidates(
            jnp.asarray(o), jnp.asarray(d), near, far, occ,
            jnp.zeros(N), num_steps=64, max_steps=64, grid_size=32,
            cascades=1, bound=1.0, dt_gamma=0.0)
        comp = RM.compact_samples(jnp.asarray(o), jnp.asarray(d), res,
                                  m_budget=512, bound=1.0)

        def loss(sig):
            ws, dep, img, _zv = RM.composite_compact(sig, jnp.ones((512, 3)), comp, N)
            return img.sum() + ws.sum()

        g = jax.grad(loss)(jnp.full((512,), 0.5, jnp.float32))
        assert np.isfinite(np.asarray(g)).all()

    def test_dense_composite_white_box(self):
        """Constant density sigma: weights_sum = 1 - exp(-sigma * span)."""
        N, T = 4, 64
        sig = jnp.full((N, T), 2.0)
        rgb = jnp.ones((N, T, 3)) * 0.5
        deltas = jnp.full((N, T), 1.0 / T)
        ts = jnp.broadcast_to(jnp.linspace(0, 1, T), (N, T))
        ws, dep, img, _ = RM.composite_dense(sig, rgb, deltas, ts)
        np.testing.assert_allclose(np.asarray(ws), 1 - np.exp(-2.0), atol=1e-3)
        np.testing.assert_allclose(np.asarray(img), 0.5 * (1 - np.exp(-2.0)), atol=1e-3)


class TestSamplePdf:
    def test_uniform_weights_give_uniform_samples(self):
        B, T, S = 2, 16, 64
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, T), (B, T))
        w = jnp.ones((B, T - 1))
        u = jnp.broadcast_to(jnp.linspace(0.5 / S, 1 - 0.5 / S, S), (B, S))
        out = np.asarray(RM.sample_pdf(bins, w, S, u))
        assert (np.diff(out, axis=-1) > 0).all()
        np.testing.assert_allclose(out.mean(), 0.5, atol=0.02)

    def test_concentrated_weights(self):
        B, T, S = 1, 16, 128
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, T), (B, T))
        w = np.full((B, T - 1), 1e-4, np.float32)
        w[0, 7] = 1.0  # all mass in one bin
        u = jnp.broadcast_to(jnp.linspace(0.5 / S, 1 - 0.5 / S, S), (B, S))
        out = np.asarray(RM.sample_pdf(bins, jnp.asarray(w), S, u))
        lo, hi = bins[0, 7], bins[0, 8]
        assert ((out > lo - 0.02) & (out < hi + 0.02)).mean() > 0.95


class TestQuadSampler:
    def test_matches_reference_sampler_exactly(self):
        """The quad-packed sampler must reproduce grid_sample_2d bitwise-close
        (same bilinear math, border padding, align_corners)."""
        from trinerflet_tpu.ops.grid_sample import grid_sample_2d, grid_sample_2d_quad
        rng = np.random.default_rng(0)
        plane = jnp.asarray(rng.standard_normal((19, 23, 6)), jnp.float32)
        coords = jnp.asarray(rng.random((500, 2)) * 2.4 - 1.2, jnp.float32)
        a = np.asarray(grid_sample_2d(plane, coords))
        b = np.asarray(grid_sample_2d_quad(plane, coords))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_plane_gradients_match_reference(self):
        """d(loss)/d(plane) of the quad path must equal autodiff of the
        reference path (the custom scatter+fold backward)."""
        from trinerflet_tpu.ops.grid_sample import grid_sample_2d, grid_sample_2d_quad
        rng = np.random.default_rng(1)
        plane = jnp.asarray(rng.standard_normal((12, 14, 4)), jnp.float32)
        coords = jnp.asarray(rng.random((200, 2)) * 2.0 - 1.0, jnp.float32)
        gref = jax.grad(lambda p: (grid_sample_2d(p, coords) ** 2).sum())(plane)
        gq = jax.grad(lambda p: (grid_sample_2d_quad(p, coords) ** 2).sum())(plane)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(gref), atol=1e-4)

    def test_coord_grads_are_zero(self):
        from trinerflet_tpu.ops.grid_sample import grid_sample_2d_quad
        plane = jnp.ones((8, 8, 2))
        coords = jnp.asarray([[0.3, -0.4]], jnp.float32)
        g = jax.grad(lambda c: grid_sample_2d_quad(plane, c).sum())(coords)
        np.testing.assert_array_equal(np.asarray(g), 0.0)


class TestDtGammaLadder:
    """dt_gamma > 0 growing-step ladder (the LLFF/colmap recipes' sampling
    law, reference raymarching.cu:345-399) — closed form vs the recurrence."""

    def _recurrence(self, t0, n, dt_min, dt_max, g):
        ts, dts = [], []
        t = np.asarray(t0, np.float64).copy()
        for _ in range(n):
            dt = np.clip(t * g, dt_min, dt_max)
            ts.append(t.copy())
            dts.append(dt.copy())
            t = t + dt
        return np.stack(ts, -1), np.stack(dts, -1)

    @pytest.mark.parametrize("g,max_steps,grid", [
        (1.0 / 128, 1024, 128),   # the colmap/LLFF default (cli.py --dt_gamma)
        (1.0 / 256, 512, 64),
        (0.05, 256, 128),         # aggressive growth: phase 3 reached fast
    ])
    def test_closed_form_matches_recurrence(self, g, max_steps, grid):
        dt_min = 2 * RM.SQRT3 / max_steps
        dt_max = 2 * RM.SQRT3 * 4 / grid   # cascades=3 -> 2^(C-1)=4
        t0 = jnp.asarray([0.05, 0.2, 1.7, 25.0, 200.0], jnp.float32)
        n = 300
        ts, dts = RM.dt_ladder(t0, n, dt_min, dt_max, g)
        ts_ref, dts_ref = self._recurrence(np.asarray(t0), n, dt_min, dt_max, g)
        np.testing.assert_allclose(np.asarray(ts), ts_ref, rtol=3e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dts), dts_ref, rtol=3e-5, atol=1e-7)

    def test_ladder_satisfies_step_law_pairwise(self):
        g, dt_min, dt_max = 1.0 / 128, 0.003, 0.2
        t0 = jnp.asarray(np.random.default_rng(0).uniform(0.1, 30, 64), jnp.float32)
        ts, dts = RM.dt_ladder(t0, 500, dt_min, dt_max, g)
        ts, dts = np.asarray(ts, np.float64), np.asarray(dts)
        # diff() of f32 t-values cancels to ulp(t) ~ 1e-5 at t ~ 1e2; the
        # tolerance reflects representation error, not a law violation
        np.testing.assert_allclose(
            np.diff(ts, axis=1), np.clip(ts[:, :-1] * g, dt_min, dt_max),
            rtol=1e-3, atol=2e-5)
        np.testing.assert_allclose(
            dts, np.clip(ts * g, dt_min, dt_max), rtol=1e-5, atol=1e-8)
        assert np.asarray(ts[:, 0] == np.asarray(t0, np.float64)).all()

    def test_worst_case_steps_cover_span_and_beat_uniform(self):
        g, max_steps, grid, bound = 1.0 / 128, 1024, 128, 8.0
        dt_min = 2 * RM.SQRT3 / max_steps
        cascades = 4
        dt_max = 2 * RM.SQRT3 * (2 ** (cascades - 1)) / grid
        span = 2 * bound * RM.SQRT3
        n = RM.worst_case_ladder_steps(span, 0.2, dt_min, dt_max, g)
        # covers: the ladder from t0=0.2 must pass t0+span within n steps
        ts, _ = RM.dt_ladder(jnp.asarray([0.2], jnp.float32), n, dt_min, dt_max, g)
        assert float(ts[0, -1]) >= 0.2 + span
        # and beats the uniform allocation by ~an order of magnitude
        assert n < int(np.ceil(bound * max_steps)) / 8, n

    def test_march_candidates_dt_gamma_end_to_end(self):
        """Growing-dt flat march: candidates obey the law, occupancy+range
        masking still applies, and the renderer-sized enumeration covers the
        box crossing."""
        from trinerflet_tpu.render.renderer import RenderConfig

        cfg = RenderConfig(bound=4.0, grid_size=64, max_steps=512,
                           dt_gamma=1.0 / 128, march="flat")
        n_cand = cfg.num_candidates
        assert n_cand < int(np.ceil(cfg.bound * cfg.max_steps)) / 3
        N = 8
        o = np.zeros((N, 3), np.float32); o[:, 2] = -6.0
        d = np.zeros((N, 3), np.float32); d[:, 2] = 1.0
        aabb = jnp.asarray([-4.0, -4, -4, 4, 4, 4])
        near, far = RM.near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), aabb)
        occ = jnp.ones((cfg.cascades, 64, 64, 64), bool)
        res = RM.march_candidates(
            jnp.asarray(o), jnp.asarray(d), near, far, occ, jnp.zeros(N),
            num_steps=n_cand, max_steps=cfg.max_steps, grid_size=64,
            cascades=cfg.cascades, bound=4.0, dt_gamma=cfg.dt_gamma)
        ts, dts, valid = (np.asarray(res.ts), np.asarray(res.dts),
                          np.asarray(res.valid))
        # valid samples span the whole box crossing (t in [2, 10])
        vt = ts[valid.astype(bool)]
        assert vt.min() < 2.1 and vt.max() > 9.5
        # no sample past far is valid
        assert (ts[0][valid[0]] <= float(far[0]) + 1e-5).all()
        # step law holds on the enumerated ladder
        np.testing.assert_allclose(
            np.diff(ts[0]),
            np.clip(ts[0, :-1] / 128, 2 * RM.SQRT3 / 512,
                    2 * RM.SQRT3 * 2 ** (cfg.cascades - 1) / 64),
            rtol=1e-3, atol=2e-5)


class TestGlobalCompactPrefixPath:
    """compact_global_dense(prefix_mask=True) — the sort-free boundary-scatter
    source map — must reproduce the flat-sort path bit-for-bit on any mask
    whose per-row valid entries form a prefix (the structure first_k_valid
    guarantees: mask = (rank <= count))."""

    def _random_prefix_case(self, seed, N=37, B=12, m_budget=None):
        rng = np.random.default_rng(seed)
        counts = rng.integers(0, B + 1, size=N)
        counts[rng.integers(0, N, size=max(1, N // 5))] = 0  # empty rays
        mask = np.arange(B)[None, :] < counts[:, None]
        t = np.where(mask, rng.uniform(0.5, 2.5, size=(N, B)), 0.0)
        dt = np.where(mask, rng.uniform(0.01, 0.05, size=(N, B)), 0.0)
        o = rng.normal(size=(N, 3)).astype(np.float32)
        d = rng.normal(size=(N, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        t0 = rng.uniform(0.4, 0.6, size=N).astype(np.float32)
        if m_budget is None:
            m_budget = int(counts.sum())
        args = tuple(jnp.asarray(x, jnp.float32) for x in (o, d, t, dt))
        return args + (jnp.asarray(mask), jnp.asarray(t0)), m_budget

    @pytest.mark.parametrize("seed,buffer", [
        (0, "exact"),      # buffer == total valid
        (1, "ample"),      # no overflow, trailing invalid slots
        (2, "overflow"),   # tail dropping engaged
    ])
    def test_matches_sort_path(self, seed, buffer):
        (o, d, t, dt, mask, t0), total = self._random_prefix_case(seed)
        m_budget = {"exact": total, "ample": total + 29,
                    "overflow": max(4, total // 2)}[buffer]
        a = RM.compact_global_dense(o, d, t, dt, mask, t0,
                                    m_budget=m_budget, bound=1.5)
        b = RM.compact_global_dense(o, d, t, dt, mask, t0,
                                    m_budget=m_budget, bound=1.5,
                                    prefix_mask=True)
        for f in ("xyzs", "dirs", "ts", "dts", "ray_id", "offsets", "counts",
                  "num_valid"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
                err_msg=f"field {f} diverged ({buffer})")

    def test_all_rays_empty(self):
        (o, d, t, dt, mask, t0), _ = self._random_prefix_case(3)
        mask = jnp.zeros_like(mask)
        t = jnp.zeros_like(t)
        dt = jnp.zeros_like(dt)
        a = RM.compact_global_dense(o, d, t, dt, mask, t0, m_budget=8,
                                    bound=1.5)
        b = RM.compact_global_dense(o, d, t, dt, mask, t0, m_budget=8,
                                    bound=1.5, prefix_mask=True)
        assert int(b.num_valid) == 0
        np.testing.assert_array_equal(np.asarray(a.ray_id), np.asarray(b.ray_id))
        np.testing.assert_array_equal(np.asarray(a.dts), np.asarray(b.dts))
