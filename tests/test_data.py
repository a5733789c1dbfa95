"""Tests for COLMAP/Blender readers, PLY I/O, Scene, config."""

import json
import os
import struct

import numpy as np
import pytest
from PIL import Image

from gof_tpu import config as config_lib
from gof_tpu.data import colmap, readers, scene as scene_lib
from gof_tpu.utils import ply


def write_colmap_binary(sparse_dir, n_images=10, width=64, height=48):
    os.makedirs(sparse_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    # cameras.bin: one PINHOLE camera
    with open(os.path.join(sparse_dir, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, width, height))
        f.write(struct.pack("<4d", 60.0, 60.0, width / 2, height / 2))
    # images.bin
    with open(os.path.join(sparse_dir, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_images))
        for i in range(n_images):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            t = rng.normal(size=3)
            f.write(struct.pack("<idddddddi", i + 1, *q, *t, 1))
            f.write(f"img_{i:03d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 2))
            f.write(struct.pack("<ddq", 1.0, 2.0, -1) * 2)
    # points3D.bin
    n_pts = 50
    with open(os.path.join(sparse_dir, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_pts))
        for i in range(n_pts):
            f.write(struct.pack("<QdddBBBd", i, *rng.normal(size=3), 10, 20, 30, 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))
    return n_images, n_pts


class TestColmap:
    def test_binary_roundtrip(self, tmp_path):
        sparse = str(tmp_path / "sparse" / "0")
        n_img, n_pts = write_colmap_binary(sparse)
        cams, imgs, (xyz, rgb, err) = colmap.load_model(sparse)
        assert len(cams) == 1 and cams[1].model == "PINHOLE"
        assert len(imgs) == n_img
        assert xyz.shape == (n_pts, 3)
        assert rgb[0].tolist() == [10, 20, 30]
        # quaternions normalized, names parsed
        assert imgs[1].name == "img_000.png"

    def test_scene_info_split(self, tmp_path):
        sparse = str(tmp_path / "sparse" / "0")
        write_colmap_binary(sparse, n_images=16)
        info = readers.read_colmap_scene(str(tmp_path), eval_split=True)
        assert len(info.test_cameras) == 2  # every 8th
        assert len(info.train_cameras) == 14
        assert info.nerf_normalization["radius"] > 0

    def test_qvec_rotmat_orthonormal(self, rng):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R = colmap.qvec_to_rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(R) == pytest.approx(1.0)


def write_blender_scene(root, n_frames=4, size=32):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(1)
    frames = []
    for i in range(n_frames):
        img = (rng.random((size, size, 4)) * 255).astype(np.uint8)
        Image.fromarray(img, "RGBA").save(os.path.join(root, f"r_{i}.png"))
        c2w = np.eye(4)
        c2w[:3, 3] = [0, 0, 4.0 + i]
        frames.append({"file_path": f"r_{i}", "transform_matrix": c2w.tolist()})
    meta = {"camera_angle_x": 0.7, "frames": frames}
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump(meta, f)


class TestBlender:
    def test_read(self, tmp_path):
        write_blender_scene(str(tmp_path))
        info = readers.read_blender_scene(str(tmp_path), white_background=True)
        assert len(info.train_cameras) == 4
        c = info.train_cameras[0]
        assert c.image.shape == (32, 32, 3)
        assert info.point_cloud_xyz.shape == (100_000, 3)

    def test_white_background_composite(self, tmp_path):
        root = str(tmp_path / "w")
        os.makedirs(root)
        img = np.zeros((8, 8, 4), np.uint8)  # fully transparent
        Image.fromarray(img, "RGBA").save(os.path.join(root, "r_0.png"))
        c2w = np.eye(4)
        with open(os.path.join(root, "transforms_train.json"), "w") as f:
            json.dump({"camera_angle_x": 0.7, "frames": [
                {"file_path": "r_0", "transform_matrix": c2w.tolist()}]}, f)
        info = readers.read_blender_scene(root, white_background=True)
        np.testing.assert_allclose(info.train_cameras[0].image, 1.0)


class TestPly:
    def test_roundtrip(self, tmp_path, rng):
        path = str(tmp_path / "t.ply")
        props = {
            "x": rng.random(10).astype(np.float32),
            "y": rng.random(10).astype(np.float32),
            "red": (rng.random(10) * 255).astype(np.uint8),
        }
        faces = np.array([[0, 1, 2], [3, 4, 5]])
        ply.write_ply(path, props, faces)
        verts, f2 = ply.read_ply(path)
        np.testing.assert_allclose(verts["x"], props["x"])
        assert verts["red"].dtype == np.uint8
        np.testing.assert_array_equal(f2, faces)


class TestGaussianSnapshot:
    def test_save_load_roundtrip(self, tmp_path, rng):
        from gof_tpu.model import gaussians as gm

        pts = rng.normal(size=(15, 3)).astype(np.float32)
        cols = rng.random((15, 3)).astype(np.float32)
        params, state = gm.init_from_points(pts, cols, sh_degree=2, capacity=32)
        path = str(tmp_path / "pc" / "point_cloud.ply")
        scene_lib.save_gaussians_ply(path, params, state, 2)
        p2, s2 = scene_lib.load_gaussians_ply(path, 2, capacity=32)
        act = np.asarray(state.active)
        np.testing.assert_allclose(np.asarray(p2.xyz)[:15], np.asarray(params.xyz)[:15], rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(p2.features_rest)[:15], np.asarray(params.features_rest)[:15], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(s2.filter_3d)[:15], np.asarray(state.filter_3d)[:15], rtol=1e-6
        )
        assert int(np.asarray(s2.active).sum()) == 15


class TestConfig:
    def test_cfg_roundtrip(self, tmp_path):
        mp = str(tmp_path / "model")
        m = config_lib.ModelParams(source_path="/x", model_path=mp, kernel_size=0.3)
        p = config_lib.PipelineParams()
        o = config_lib.OptimizationParams(iterations=123)
        config_lib.save_cfg(mp, m, p, o)
        m2, p2, o2 = config_lib.load_cfg(mp)
        assert m2.kernel_size == 0.3
        assert o2.iterations == 123

    def test_argparse_reflection(self):
        import argparse

        ap = argparse.ArgumentParser()
        config_lib.add_group(ap, config_lib.ModelParams)
        config_lib.add_group(ap, config_lib.OptimizationParams)
        ns = ap.parse_args(["-s", "/data", "--iterations", "7000", "--white_background"])
        m = config_lib.extract(config_lib.ModelParams, ns)
        o = config_lib.extract(config_lib.OptimizationParams, ns)
        assert m.source_path == "/data"
        assert m.white_background is True
        assert o.iterations == 7000
