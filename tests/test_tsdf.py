"""TSDF fusion tests: reconstruct a known sphere from synthetic depth maps."""

import numpy as np
import pytest

from gof_tpu import cameras
from gof_tpu.mesh import tsdf as tsdf_lib
from gof_tpu.ops.blend import pixel_rays


def sphere_depth(cam, center, radius):
    """Analytic depth map (view-space z at the first ray-sphere hit)."""
    rx, ry = pixel_rays(cam.width, cam.height, cam.focal_x, cam.focal_y)
    d = np.stack([np.asarray(rx), np.asarray(ry), np.ones_like(np.asarray(rx))], -1)
    wv = np.asarray(cam.world_view)
    R = wv[:3, :3]
    o = np.asarray(cam.cam_center)
    dirs = d @ R  # view->world (rows of R are world axes in view coords)
    oc = o - center
    b = 2 * dirs @ oc
    a = (dirs * dirs).sum(-1)
    c = oc @ oc - radius**2
    disc = b * b - 4 * a * c
    t = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a), 0.0)
    return np.where(t > 0, t, 0.0).astype(np.float32)


class TestTSDF:
    def test_sphere_reconstruction(self):
        center = np.array([0.0, 0.0, 0.0])
        radius = 0.5
        cams, depths = [], []
        for i, th in enumerate(np.linspace(0, 2 * np.pi, 8, endpoint=False)):
            cam = cameras.look_at_camera(
                eye=(2.5 * np.sin(th), 0.8, 2.5 * np.cos(th)), target=(0, 0, 0),
                width=96, height=96, uid=i,
            )
            cams.append(cam)
            depths.append(sphere_depth(cam, center, radius))

        lo = np.array([-0.8, -0.8, -0.8], np.float32)
        voxel = 0.025
        dims = (65, 65, 65)
        tsdf, weight = tsdf_lib.fuse_depth_maps(
            depths, cams, lo, voxel, dims, sdf_trunc=0.1, depth_min=0.3, depth_max=6.0
        )
        # narrow-band behavior: a voxel just inside the surface is negative,
        # just outside positive (the deep interior stays unobserved = +1)
        p_in = center + np.array([radius - 1.5 * voxel, 0, 0])
        p_out = center + np.array([radius + 1.5 * voxel, 0, 0])
        vi = tuple(((p_in - lo) / voxel).astype(int))
        vo = tuple(((p_out - lo) / voxel).astype(int))
        assert weight[vi] > 0 and tsdf[vi] < 0, (tsdf[vi], weight[vi])
        assert weight[vo] > 0 and tsdf[vo] > 0, (tsdf[vo], weight[vo])

        verts, faces = tsdf_lib.grid_to_mesh(tsdf, weight, lo, voxel)
        assert len(verts) > 200 and len(faces) > 200
        r = np.linalg.norm(verts - center, axis=-1)
        # reconstructed surface within ~1.5 voxels of the true sphere
        assert abs(np.median(r) - radius) < 1.5 * voxel
        assert np.quantile(np.abs(r - radius), 0.9) < 3 * voxel


class TestSparseTSDF:
    def _cams_depths(self, center, radius, n=8, size=96):
        cams, depths = [], []
        for i, th in enumerate(np.linspace(0, 2 * np.pi, n, endpoint=False)):
            cam = cameras.look_at_camera(
                eye=(2.5 * np.sin(th), 0.8, 2.5 * np.cos(th)), target=(0, 0, 0),
                width=size, height=size, uid=i,
            )
            cams.append(cam)
            depths.append(sphere_depth(cam, center, radius))
        return cams, depths

    def test_sparse_sphere_matches_protocol(self):
        """Sparse block fusion at a FINE voxel (no dense-grid cap):
        reconstructed sphere radius within ~1.5 voxels; block count is a
        small fraction of the dense grid; colors fuse to the painted value."""
        center = np.array([0.0, 0.0, 0.0])
        radius = 0.5
        voxel = 0.01
        trunc = 8 * voxel
        cams, depths = self._cams_depths(center, radius)
        colors = [np.tile(np.array([0.8, 0.1, 0.2], np.float32)[:, None, None],
                          (1, d.shape[0], d.shape[1])) for d in depths]

        blocks = tsdf_lib.discover_blocks(
            depths, cams, voxel, block_res=16, sdf_trunc=trunc,
            depth_min=0.3, depth_max=6.0)
        assert len(blocks) > 0
        # sparsity: the truncation band's blocks are far fewer than the
        # dense bounding grid of the camera ring
        dense_equiv = (5.0 / (16 * voxel)) ** 3
        assert len(blocks) < dense_equiv * 0.2

        tsdf, weight, color = tsdf_lib.fuse_blocks(
            depths, colors, cams, blocks, voxel, block_res=16,
            sdf_trunc=trunc, depth_min=0.3, depth_max=6.0, batch=256)
        verts, faces, vcol = tsdf_lib.blocks_to_mesh(
            tsdf, weight, color, blocks, voxel, block_res=16)
        assert len(verts) > 500 and len(faces) > 500
        r = np.linalg.norm(verts - center, axis=-1)
        assert abs(np.median(r) - radius) < 1.5 * voxel
        assert np.quantile(np.abs(r - radius), 0.9) < 3 * voxel
        # color fused to the painted constant on observed vertices
        np.testing.assert_allclose(
            np.median(vcol, axis=0), [0.8, 0.1, 0.2], atol=0.05)
        # no unreferenced/degenerate faces after seam dedupe
        assert faces.min() >= 0 and faces.max() < len(verts)

    def test_sparse_matches_dense_surface(self):
        """Sparse and dense fusion agree: every sparse vertex lies within a
        voxel of some dense vertex."""
        center = np.array([0.05, -0.03, 0.02])
        radius = 0.45
        voxel = 0.025
        cams, depths = self._cams_depths(center, radius)
        lo = np.array([-0.8, -0.8, -0.8], np.float32)
        t_d, w_d = tsdf_lib.fuse_depth_maps(
            depths, cams, lo, voxel, (65, 65, 65), sdf_trunc=0.1,
            depth_min=0.3, depth_max=6.0)
        v_dense, _ = tsdf_lib.grid_to_mesh(t_d, w_d, lo, voxel)

        blocks = tsdf_lib.discover_blocks(
            depths, cams, voxel, block_res=8, sdf_trunc=0.1,
            depth_min=0.3, depth_max=6.0)
        t_s, w_s, _ = tsdf_lib.fuse_blocks(
            depths, None, cams, blocks, voxel, block_res=8, sdf_trunc=0.1,
            depth_min=0.3, depth_max=6.0, batch=128)
        v_sparse, f_sparse, _ = tsdf_lib.blocks_to_mesh(
            t_s, w_s, None, blocks, voxel, block_res=8)
        assert len(v_sparse) > 200
        from scipy.spatial import cKDTree

        d, _ = cKDTree(v_dense).query(v_sparse)
        assert np.quantile(d, 0.95) < voxel, np.quantile(d, 0.95)

    @pytest.mark.slow
    def test_protocol_voxel_0002_smoke(self):
        """Reference-protocol voxel 0.002 (extract_mesh_tsdf.py:22): the
        dense design needed a 500^3+ grid here; the sparse band stays in the
        thousands of blocks and fusion proceeds within memory."""
        center = np.array([0.0, 0.0, 0.0])
        radius = 0.5
        voxel = 0.002
        trunc = 8 * voxel
        cams, depths = self._cams_depths(center, radius, n=2, size=128)
        blocks = tsdf_lib.discover_blocks(
            depths, cams, voxel, block_res=16, sdf_trunc=trunc,
            depth_min=0.3, depth_max=6.0)
        # truncation band only: worlds away from the 500^3 dense grid
        assert 500 < len(blocks) < 100_000, len(blocks)
        # fuse + mesh a bounded subset to validate memory/shape behavior
        sub = blocks[:768]
        t_s, w_s, _ = tsdf_lib.fuse_blocks(
            depths, None, cams, sub, voxel, block_res=16, sdf_trunc=trunc,
            depth_min=0.3, depth_max=6.0, batch=256)
        v, f, _ = tsdf_lib.blocks_to_mesh(t_s, w_s, None, sub, voxel,
                                          block_res=16)
        if len(v):
            r = np.linalg.norm(v - center, axis=-1)
            assert abs(np.median(r) - radius) < 3 * voxel
