import numpy as np
import jax.numpy as jnp

from ppsurf_tpu.ops.encoding import cartesian_to_polar, pos_encoding
from ppsurf_tpu.io.point_cloud import load_pcd, load_pts


class TestEncoding:
    def test_polar_roundtrip_3d(self):
        rng = np.random.RandomState(0)
        pts = rng.randn(1, 50, 3).astype(np.float32)
        pol = np.asarray(cartesian_to_polar(jnp.asarray(pts)))
        az, el, r = pol[..., 0], pol[..., 1], pol[..., 2]
        back = np.stack(
            [r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az), r * np.sin(el)],
            axis=-1,
        )
        np.testing.assert_allclose(back, pts, atol=1e-5)

    def test_polar_2d(self):
        pts = jnp.asarray([[[1.0, 0.0], [0.0, 2.0]]])
        pol = np.asarray(cartesian_to_polar(pts))
        np.testing.assert_allclose(pol[0, 0], [1.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(pol[0, 1], [2.0, np.pi / 2], atol=1e-6)

    def test_pos_encoding_shapes(self):
        pts = jnp.asarray(np.random.rand(2, 10, 3).astype(np.float32))
        enc = pos_encoding(pts, 4)
        assert enc.shape == (2, 10, 3 * 2 * 4)
        assert pos_encoding(pts, 0) is pts


class TestPcd:
    def test_load_ascii_pcd(self, tmp_path):
        content = """# .PCD v0.7
VERSION 0.7
FIELDS x y z rgb
SIZE 4 4 4 4
TYPE F F F F
COUNT 1 1 1 1
WIDTH 2
HEIGHT 1
POINTS 2
DATA ascii
1.0 2.0 3.0 0
4.0 5.0 6.0 0
"""
        p = tmp_path / "scan.pcd"
        p.write_text(content)
        pts = load_pcd(str(p))
        np.testing.assert_allclose(pts, [[1, 2, 3], [4, 5, 6]])
        pts2 = load_pts(str(p))
        np.testing.assert_allclose(pts2, pts)
