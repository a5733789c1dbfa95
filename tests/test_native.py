"""Native C++ COLMAP reader vs the pure-Python parser."""

import numpy as np
import pytest

from gof_tpu import native
from gof_tpu.data import colmap
from test_data import write_colmap_binary


@pytest.fixture(scope="module")
def built():
    if native.load() is None:
        from gof_tpu.native import build

        build.build()
        native._TRIED = False
    return native.load() is not None


class TestNativeIO:
    def test_matches_python_parser(self, built, tmp_path):
        if not built:
            pytest.skip("native lib unavailable")
        sparse = str(tmp_path / "sparse" / "0")
        write_colmap_binary(sparse, n_images=12)
        py_cams = colmap.read_cameras_binary(f"{sparse}/cameras.bin")
        py_imgs = colmap.read_images_binary(f"{sparse}/images.bin")
        py_xyz, py_rgb, py_err = colmap.read_points3d_binary(f"{sparse}/points3D.bin")

        nat = colmap._load_model_native(sparse)
        assert nat is not None
        cams, imgs, (xyz, rgb, err) = nat
        assert set(cams) == set(py_cams)
        c, pc = cams[1], py_cams[1]
        assert (c.model, c.width, c.height) == (pc.model, pc.width, pc.height)
        np.testing.assert_allclose(c.params[:4], pc.params)
        assert set(imgs) == set(py_imgs)
        for k in imgs:
            np.testing.assert_allclose(imgs[k].qvec, py_imgs[k].qvec)
            np.testing.assert_allclose(imgs[k].tvec, py_imgs[k].tvec)
            assert imgs[k].name == py_imgs[k].name
            assert imgs[k].camera_id == py_imgs[k].camera_id
        np.testing.assert_allclose(xyz, py_xyz)
        np.testing.assert_array_equal(rgb, py_rgb)
        np.testing.assert_allclose(err, py_err)
