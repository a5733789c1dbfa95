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


class TestTrajectoryAlignment:
    def _make_traj(self, rng, n=60):
        centers = rng.normal(size=(n, 3)) * 3.0
        poses = np.tile(np.eye(4), (n, 1, 1))
        poses[:, :3, 3] = centers
        return poses

    def test_log_roundtrip(self, rng, tmp_path):
        from gof_tpu.eval import tnt

        poses = self._make_traj(rng, 12)
        p = tmp_path / "traj.log"
        with open(p, "w") as f:
            for i, m in enumerate(poses):
                f.write(f"{i} {i} 0\n")
                for row in m:
                    f.write(" ".join(str(v) for v in row) + "\n")
        got = tnt.read_trajectory_log(str(p))
        np.testing.assert_allclose(got, poses, atol=1e-12)

    def test_recovers_known_similarity(self, rng):
        from gof_tpu.eval import tnt

        pred = rng.normal(size=(80, 3)) * 2.0
        Rtrue, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(Rtrue) < 0:
            Rtrue[:, 0] *= -1
        strue, ttrue = 2.3, np.array([0.5, -1.0, 2.0])
        gt = strue * pred @ Rtrue.T + ttrue
        T, info = tnt.trajectory_alignment(pred, gt)
        np.testing.assert_allclose(T[:3, :3], strue * Rtrue, atol=1e-6)
        np.testing.assert_allclose(T[:3, 3], ttrue, atol=1e-6)
        assert info["inliers"] == 80

    def test_robust_to_outliers(self, rng):
        from gof_tpu.eval import tnt

        pred = rng.normal(size=(100, 3)) * 2.0
        Rtrue = np.eye(3)
        gt = 1.5 * pred @ Rtrue.T + np.array([1.0, 0.0, 0.0])
        gt[::10] += rng.normal(size=(10, 3)) * 5.0  # 10% corrupted poses
        T, info = tnt.trajectory_alignment(pred, gt)
        np.testing.assert_allclose(T[:3, :3], 1.5 * Rtrue, atol=1e-3)
        assert info["inliers"] >= 85

    def test_icp_reports_convergence(self, rng):
        gt = sphere_points(3000, 1.0, rng)
        pred = gt + np.array([0.02, 0.0, 0.0])
        T, err = geo.icp_point_to_point(pred, gt, threshold=0.5, return_error=True)
        assert err["inlier_frac"] > 0.99
        assert err["rmse"] < 0.02
        assert err["iters"] >= 1


class TestDtuProtocol:
    def test_alignment_scale_normalization(self, rng):
        from gof_tpu.eval import dtu

        pred = rng.normal(size=(49, 3))
        Rtrue, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(Rtrue) < 0:
            Rtrue[:, 0] *= -1
        gt = 7.0 * pred @ Rtrue.T + np.array([10.0, -3.0, 5.0])
        # exact 1:1 correspondences (the caller pairs by DTU image index)
        scale, R, t = dtu.dtu_alignment(pred, gt)
        aligned = (pred * scale) @ R.T + t
        np.testing.assert_allclose(aligned, gt, atol=1e-6)

    def test_cull_mesh_all_views_semantics(self, rng):
        """Reference rule (evaluate_dtu_mesh.py:118-127): keep a vertex iff
        EVERY view sees it in the dilated mask or not at all."""
        from gof_tpu import cameras
        from gof_tpu.eval import dtu

        cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0),
                                     width=64, height=64)
        # vertex A: center of image, masked-in; B: center, masked-out;
        # C: far outside the frustum
        verts = np.array([[0, 0, 5.0], [-1.5, 0, 5.0], [100.0, 0, 5.0]])
        mask = np.zeros((64, 64), np.float32)
        mask[20:44, 20:44] = 1.0  # center box only
        faces = np.array([[0, 1, 2]])
        keep_v, faces_k = dtu.cull_mesh_by_masks(verts, faces, [cam], [mask],
                                                 dilate_px=2)
        assert keep_v[0]       # in mask
        assert not keep_v[1]   # visible but outside mask
        assert keep_v[2]       # outside frustum -> passes this view
        assert len(faces_k) == 0  # face lost vertex B

    def test_cull_without_mask_keeps_all(self, rng):
        from gof_tpu import cameras
        from gof_tpu.eval import dtu

        cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0),
                                     width=64, height=64)
        verts = np.array([[0, 0, 5.0], [0.5, 0.2, 4.0], [100.0, 0, 5.0]])
        keep_v, _ = dtu.cull_mesh_by_masks(verts, None, [cam], [None])
        assert keep_v.all()
