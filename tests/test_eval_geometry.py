"""Tests for the geometry evaluation toolbox (chamfer, F-score, ICP)."""

import numpy as np

from gof_tpu.eval import geometry as geo


def sphere_points(n, r, rng, center=(0, 0, 0)):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v * r + np.asarray(center)


class TestGeometryEval:
    def test_chamfer_identical(self, rng):
        p = sphere_points(2000, 1.0, rng)
        res = geo.chamfer_dtu(p, p.copy())
        assert res["overall"] < 1e-9

    def test_chamfer_scales_with_offset(self, rng):
        gt = sphere_points(3000, 1.0, rng)
        pred = gt + np.array([0.1, 0, 0])
        res = geo.chamfer_dtu(pred, gt)
        assert 0.01 < res["overall"] < 0.12

    def test_fscore(self, rng):
        gt = sphere_points(3000, 1.0, rng)
        res = geo.precision_recall_fscore(gt + 0.001, gt, tau=0.01)
        assert res["fscore"] > 0.95
        res2 = geo.precision_recall_fscore(gt + 0.05, gt, tau=0.01)
        assert res2["fscore"] < res["fscore"]

    def test_best_fit_transform(self, rng):
        A = rng.normal(size=(500, 3))
        Rtrue, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(Rtrue) < 0:
            Rtrue[:, 0] *= -1
        B = 1.7 * A @ Rtrue.T + np.array([1, 2, 3])
        R, t, s = geo.best_fit_transform(A, B)
        np.testing.assert_allclose(R, Rtrue, atol=1e-8)
        assert abs(s - 1.7) < 1e-8
        np.testing.assert_allclose(s * A @ R.T + t, B, atol=1e-8)

    def test_icp_recovers_small_offset(self, rng):
        gt = sphere_points(5000, 1.0, rng)
        Rz = np.array([[np.cos(0.05), -np.sin(0.05), 0],
                       [np.sin(0.05), np.cos(0.05), 0], [0, 0, 1]])
        pred = gt @ Rz.T + np.array([0.02, -0.01, 0.03])
        T = geo.icp_point_to_point(pred, gt, threshold=0.5)
        aligned = pred @ T[:3, :3].T + T[:3, 3]
        d = geo.nn_distances(aligned, gt)
        assert d.mean() < 0.01

    def test_sample_mesh_surface(self, rng):
        # unit square split in two triangles
        verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float)
        faces = np.array([[0, 1, 2], [0, 2, 3]])
        pts = geo.sample_mesh_surface(verts, faces, density=0.05, rng=rng)
        assert len(pts) > 300
        assert pts[:, 2].max() == 0
        assert pts[:, 0].min() >= 0 and pts[:, 0].max() <= 1

    def test_reduce_pcd(self, rng):
        pts = rng.random((5000, 3))
        red = geo.reduce_pcd(pts, 0.2)
        assert len(red) <= 6**3
        assert len(red) > 50
