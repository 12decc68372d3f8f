import numpy as np
import jax.numpy as jnp
import pytest

from trinerflet_tpu.ops import wavelets as W


# Golden values cross-checked against the PyWavelets coefficient tables
# (bior4.4 == CDF 9/7; bior6.8 == the classic 17/11 pair).
BIOR44_DEC_CENTER = 0.852698679009
BIOR44_REC_CENTER = 0.788485616406
BIOR68_DEC_CENTER = 0.825922997458
BIOR68_REC_CENTER = 0.758907729454
BIOR68_DEC_EDGE = 0.001908831736
BIOR22_DEC = np.array([-0.17677669529663689, 0.35355339059327379, 1.0606601717798214,
                       0.35355339059327379, -0.17677669529663689])


def _nonzero(f):
    f = np.asarray(f)
    nz = np.nonzero(np.abs(f) > 1e-14)[0]
    return f[nz[0]:nz[-1] + 1]


class TestFilterBanks:
    @pytest.mark.parametrize("name", W.SUPPORTED_WAVELETS)
    def test_even_common_length_and_dc_gain(self, name):
        dec_lo, dec_hi, rec_lo, rec_hi = W.filter_bank(name)
        L = len(dec_lo)
        assert L % 2 == 0
        assert len(dec_hi) == len(rec_lo) == len(rec_hi) == L
        assert abs(dec_lo.sum() - np.sqrt(2)) < 1e-12
        assert abs(rec_lo.sum() - np.sqrt(2)) < 1e-12
        assert abs(dec_hi.sum()) < 1e-10
        assert abs(rec_hi.sum()) < 1e-10

    def test_lengths_match_reference_pad_dict(self):
        # reference triplane_encoder.py:174-180: pad = (L-2)/4
        for name, pad in {"bior6.8": 4, "bior2.6": 3, "bior4.4": 2,
                          "bior2.2": 1, "haar": 0}.items():
            assert W.idwt_pad(name) == pad

    def test_golden_coefficients(self):
        dec44, _, rec44, _ = W.filter_bank("bior4.4")
        assert abs(dec44.max() - BIOR44_DEC_CENTER) < 1e-10
        assert abs(rec44.max() - BIOR44_REC_CENTER) < 1e-10
        dec68, _, rec68, _ = W.filter_bank("bior6.8")
        assert abs(dec68.max() - BIOR68_DEC_CENTER) < 1e-10
        assert abs(rec68.max() - BIOR68_REC_CENTER) < 1e-10
        assert abs(_nonzero(dec68)[0] - BIOR68_DEC_EDGE) < 1e-10
        dec22, _, _, _ = W.filter_bank("bior2.2")
        np.testing.assert_allclose(_nonzero(dec22), BIOR22_DEC, atol=1e-12)

    @pytest.mark.parametrize("name", W.SUPPORTED_WAVELETS)
    def test_biorthogonality(self, name):
        # sum_n dec_lo[n] rec_lo[n + 2k] = delta_k after center alignment
        dec_lo, dec_hi, rec_lo, rec_hi = W.filter_bank(name)
        h, g = _nonzero(dec_lo), _nonzero(rec_lo)
        for k in range(-4, 5):
            s = sum(h[n] * g[n - (len(h) - len(g)) // 2 + 2 * k]
                    for n in range(len(h))
                    if 0 <= n - (len(h) - len(g)) // 2 + 2 * k < len(g))
            assert abs(s - (1.0 if k == 0 else 0.0)) < 1e-9, (name, k, s)


class TestTransforms:
    @pytest.mark.parametrize("name", W.SUPPORTED_WAVELETS)
    def test_perfect_reconstruction(self, name):
        """idwt(dwt(x)) recovers x exactly when x is compactly supported away
        from the borders (zero padding is then exact)."""
        rng = np.random.default_rng(0)
        L = len(W.filter_bank(name)[0])
        n = 64
        x = np.zeros((2, 3, n, n), np.float32)
        inner = rng.standard_normal((2, 3, n - 2 * L, n - 2 * L)).astype(np.float32)
        x[:, :, L:-L, L:-L] = inner
        yl, yh = W.dwt2d(jnp.asarray(x), name)
        assert yl.shape[-1] == W.dwt_output_size(n, name)
        assert yh.shape[2] == 3
        rec = W.idwt2d(yl, yh, name)
        # The synthesis output size is 2*n' - L + 2; crop both to common center
        # and compare the interior.
        m = min(rec.shape[-1], n)
        off_r = (rec.shape[-1] - m) // 2
        off_x = (n - m) // 2
        rec_c = np.asarray(rec)[:, :, off_r:off_r + m, off_r:off_r + m]
        x_c = x[:, :, off_x:off_x + m, off_x:off_x + m]
        pad = 2 * L
        np.testing.assert_allclose(
            rec_c[:, :, pad:-pad, pad:-pad], x_c[:, :, pad:-pad, pad:-pad],
            atol=2e-5,
        )

    @pytest.mark.parametrize("name", W.SUPPORTED_WAVELETS)
    def test_idwt_doubles_resolution_with_pad(self, name):
        """The reference's core trick: pad yl/yh by idwt_pad then IDWT gives
        exactly 2R (triplane_encoder.py:391-394)."""
        pad = W.idwt_pad(name)
        R = 16
        yl = jnp.ones((1, 2, R, R))
        yh = jnp.zeros((1, 2, 3, R, R))
        p = [(0, 0), (0, 0), (pad, pad), (pad, pad)]
        ylp = jnp.pad(yl, p)
        yhp = jnp.pad(yh, [(0, 0), (0, 0), (0, 0), (pad, pad), (pad, pad)])
        out = W.idwt2d(ylp, yhp, name)
        assert out.shape == (1, 2, 2 * R, 2 * R), out.shape

    def test_haar_constant_refinement(self):
        """For haar, yl = 2*x with yh = 0 reconstructs each input pixel into a
        2x2 block of the same value (the wavelet-triplane upsampling identity)."""
        x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 1, 8, 8)), jnp.float32)
        out = W.idwt2d(2.0 * x, jnp.zeros((1, 1, 3, 8, 8)), "haar")
        expect = np.repeat(np.repeat(np.asarray(x), 2, axis=2), 2, axis=3)
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)

    def test_pyramid_shapes_base_recipe(self):
        """512-res / 8-level (log2=3) recipe: base 64, yh sizes [64,128,256]."""
        base, sizes = W.wavelet_pyramid_shapes(512, 3, "bior6.8")
        assert base == 64
        assert sizes == [64, 128, 256]
        base, sizes = W.wavelet_pyramid_shapes(2048, 5, "bior6.8")
        assert base == 64
        assert sizes == [64, 128, 256, 512, 1024]

    def test_linearity(self):
        x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 2, 32, 32)), jnp.float32)
        yl1, yh1 = W.dwt2d(x, "bior6.8")
        yl2, yh2 = W.dwt2d(2.0 * x, "bior6.8")
        np.testing.assert_allclose(np.asarray(yl2), 2 * np.asarray(yl1), atol=1e-4)
        np.testing.assert_allclose(np.asarray(yh2), 2 * np.asarray(yh1), atol=1e-4)

    def test_lowpass_one_larger_is_cropped(self):
        """pytorch_wavelets DWTInverse crops the trailing lowpass row/col when
        the lowpass is one larger than the detail bands (odd-size forward
        inputs reconstruct to n+1); the reference ladder leans on this. The
        cropped-yl reconstruction must equal passing the pre-cropped yl."""
        rng = np.random.default_rng(3)
        yl = jnp.asarray(rng.standard_normal((1, 2, 10, 10)), jnp.float32)
        yh = jnp.asarray(rng.standard_normal((1, 2, 3, 9, 9)), jnp.float32)
        out = W.idwt2d(yl, yh, "bior6.8")
        ref = W.idwt2d(yl[:, :, :9, :9], yh, "bior6.8")
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_inconsistent_band_sizes_raise(self):
        yl = jnp.zeros((1, 2, 24, 24))
        yh = jnp.zeros((1, 2, 3, 16, 16))
        with pytest.raises(ValueError, match="more than one"):
            W.idwt2d(yl, yh, "bior6.8")

    @pytest.mark.parametrize("name", ["bior6.8", "bior2.2"])
    def test_odd_input_roundtrip(self, name):
        """Forward DWT of an ODD-sized input then inverse: size comes back as
        n+1 (trailing growth only) and the interior reconstructs exactly."""
        rng = np.random.default_rng(4)
        L = len(W.filter_bank(name)[0])
        n = 8 * L + 1
        x = np.zeros((1, 2, n, n), np.float32)
        x[:, :, L:-L - 1, L:-L - 1] = rng.standard_normal(
            (1, 2, n - 2 * L - 1, n - 2 * L - 1)).astype(np.float32)
        yl, yh = W.dwt2d(jnp.asarray(x), name)
        rec = np.asarray(W.idwt2d(yl, yh, name))
        m = min(rec.shape[-1], n)
        or_, ox = (rec.shape[-1] - m) // 2, (n - m) // 2
        pad = 2 * L
        np.testing.assert_allclose(
            rec[:, :, or_:or_ + m, or_:or_ + m][:, :, pad:-pad, pad:-pad],
            x[:, :, ox:ox + m, ox:ox + m][:, :, pad:-pad, pad:-pad],
            atol=2e-5)


class TestNonPow2Ladder:
    def test_cli_deep_ladder_config(self):
        """Regression: resolution=64 / wavelet_scale=128 (more levels than the
        resolution supports cleanly) drives the pyramid through 1x1/odd sizes;
        the inverse ladder must still produce exactly resolution-sized planes
        (previously crashed with a lo/hi operator size mismatch)."""
        import jax
        from trinerflet_tpu.models.triplane import (
            TriplaneConfig, init_triplane_params, build_planes)
        cfg = TriplaneConfig(channels=4, resolution=64, wavelet_scale=128)
        params = init_triplane_params(jax.random.PRNGKey(0), cfg)
        planes = build_planes(params, cfg)
        assert planes["full"].shape == (3, 64, 64, 4), planes["full"].shape

    def test_nonpow2_resolution_ladder(self):
        """Odd intermediate sizes (res=300: 150 -> 75 -> 38) exercise the
        pytorch_wavelets-style lowpass crop inside the ladder."""
        import jax
        from trinerflet_tpu.models.triplane import (
            TriplaneConfig, init_triplane_params, build_planes)
        cfg = TriplaneConfig(channels=2, resolution=300, wavelet_scale=8)
        params = init_triplane_params(jax.random.PRNGKey(0), cfg)
        planes = build_planes(params, cfg)
        assert planes["full"].shape == (3, 300, 300, 2), planes["full"].shape
