import numpy as np

from trinerflet_tpu.ops.meshing import marching_tetrahedra, extract_mesh, write_obj


class TestMarchingTetrahedra:
    def test_sphere_surface(self):
        """Extract a sphere iso-surface; vertices must lie near the true
        radius and the mesh must be reasonably complete."""
        R = 48
        axis = np.linspace(-1, 1, R, dtype=np.float32)
        g = np.stack(np.meshgrid(axis, axis, axis, indexing="ij"), -1)
        field = 1.0 - np.linalg.norm(g, axis=-1)  # >0 inside unit... radius 1 too big
        field = 0.6 - np.linalg.norm(g, axis=-1)  # radius 0.6 sphere
        soup = marching_tetrahedra(field, 0.0, origin=(-1, -1, -1), spacing=2 / (R - 1))
        assert len(soup) > 500
        radii = np.linalg.norm(soup.reshape(-1, 3), axis=-1)
        assert abs(radii.mean() - 0.6) < 0.02
        assert radii.std() < 0.02

    def test_empty_field(self):
        g = np.zeros((8, 8, 8), np.float32)
        soup = marching_tetrahedra(g, 0.5)
        assert soup.shape == (0, 3, 3)

    def test_extract_mesh_and_obj(self, tmp_path):
        def density(p):
            return 20.0 * (np.linalg.norm(p, axis=-1) < 0.5)

        verts, faces = extract_mesh(density, bound=1.0, resolution=32, threshold=10.0)
        assert len(verts) > 50 and len(faces) > 50
        assert faces.max() < len(verts)
        path = str(tmp_path / "m.obj")
        write_obj(path, verts, faces)
        txt = open(path).read()
        assert txt.count("\nf ") + txt.startswith("f ") == len(faces)
