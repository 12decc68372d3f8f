import os
import numpy as np
import pytest

from trinerflet_tpu import native
from trinerflet_tpu.train.metrics import psnr as py_psnr, ssim as py_ssim


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i in range(6):
        img = (rng.random((40, 56, 4)) * 255).astype(np.uint8)
        p = str(root / f"im_{i}.png")
        bgra = img.copy()
        bgra[..., :3] = img[..., 2::-1]
        cv2.imwrite(p, bgra)
        paths.append(p)
        arrays.append(img)
    return paths, np.stack(arrays)


class TestNative:
    def test_builds(self):
        assert native.available(), "native lib failed to build"

    def test_png_decode_matches_cv2(self, pngs):
        paths, arrays = pngs
        out = native.decode_png(paths[0])
        np.testing.assert_array_equal(out, arrays[0])

    def test_batch_load(self, pngs):
        paths, arrays = pngs
        out = native.load_image_batch(paths, 40, 56, downscale=1, out_channels=4)
        np.testing.assert_allclose(out, arrays.astype(np.float32) / 255.0, atol=1e-6)

    def test_batch_load_downscale(self, pngs):
        paths, arrays = pngs
        out = native.load_image_batch(paths, 40, 56, downscale=2, out_channels=3)
        assert out.shape == (6, 20, 28, 3)
        # box filter reference
        ref = arrays.astype(np.float32) / 255.0
        ref = ref[:, : 40, : 56, :3].reshape(6, 20, 2, 28, 2, 3).mean((2, 4))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_psnr_matches_python(self):
        rng = np.random.default_rng(1)
        a = rng.random((64, 64, 3)).astype(np.float32)
        b = np.clip(a + 0.05 * rng.standard_normal(a.shape), 0, 1).astype(np.float32)
        np.testing.assert_allclose(native.psnr(a, b), py_psnr(a, b), atol=1e-4)

    def test_ssim_matches_python(self):
        rng = np.random.default_rng(2)
        a = rng.random((48, 48, 3)).astype(np.float32)
        b = np.clip(a + 0.1 * rng.standard_normal(a.shape), 0, 1).astype(np.float32)
        np.testing.assert_allclose(native.ssim(a, b), py_ssim(a, b), atol=5e-3)


class TestNativeMarchingTets:
    def test_matches_python_implementation(self):
        """Native soup must equal the numpy soup as a vertex multiset."""
        from trinerflet_tpu import native
        from trinerflet_tpu.ops import meshing

        if not native.available():
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(0)
        x = np.linspace(-1, 1, 24, dtype=np.float32)
        X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
        grid = 10.0 * np.exp(-4 * (X**2 + 1.3 * Y**2 + 0.7 * Z**2))
        nat = native.marching_tetrahedra(grid, 3.0, origin=(-1, -1, -1),
                                         spacing=2 / 23)
        # force the pure-python path for the reference result
        import unittest.mock as mock

        with mock.patch.object(native, "marching_tetrahedra", lambda *a, **k: None):
            ref = meshing.marching_tetrahedra(grid, 3.0, origin=(-1, -1, -1),
                                              spacing=2 / 23)
        assert nat.shape == ref.shape
        a = np.sort(np.round(nat.reshape(-1, 3), 4).view([('x','f4'),('y','f4'),('z','f4')]).ravel())
        b = np.sort(np.round(ref.reshape(-1, 3), 4).view([('x','f4'),('y','f4'),('z','f4')]).ravel())
        assert np.array_equal(a, b)

    def test_empty_and_full(self):
        from trinerflet_tpu import native

        if not native.available():
            pytest.skip("native lib unavailable")
        grid = np.zeros((8, 8, 8), np.float32)
        assert native.marching_tetrahedra(grid, 1.0).shape == (0, 3, 3)
        grid[:] = 5.0
        assert native.marching_tetrahedra(grid, 1.0).shape == (0, 3, 3)
