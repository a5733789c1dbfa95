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


class TestAnalyticGTChain:
    """End-to-end proof of the geometry-eval stack (VERDICT r2 item 4): an
    extracted level-set mesh from an ANALYTIC gaussian shell is scored
    against the exact GT sphere by both the TNT F-score and the DTU chamfer
    cores, with a negative control proving sensitivity."""

    @staticmethod
    def _extracted_sphere_mesh(tmp_path, rng):
        import jax.numpy as jnp

        from gof_tpu import cameras
        from gof_tpu.mesh import extract
        from gof_tpu.model import gaussians as gm
        from gof_tpu.sh import rgb_to_sh_dc
        from gof_tpu.utils import ply

        r = 0.8
        n = 220
        # Fibonacci sphere: even surface coverage
        i = np.arange(n) + 0.5
        phi = np.arccos(1 - 2 * i / n)
        th = np.pi * (1 + 5**0.5) * i
        centers = np.stack([np.sin(phi) * np.cos(th), np.sin(phi) * np.sin(th),
                            np.cos(phi)], -1).astype(np.float32) * r
        params = gm.GaussianParams(
            xyz=jnp.asarray(centers),
            features_dc=rgb_to_sh_dc(jnp.full((n, 3), 0.6))[:, None, :],
            features_rest=jnp.zeros((n, 0, 3)),
            scaling=jnp.log(jnp.full((n, 3), 0.12)),
            rotation=jnp.asarray(np.tile([1.0, 0, 0, 0], (n, 1)), jnp.float32),
            opacity=gm.inverse_sigmoid(jnp.full((n,), 0.95)),
        )
        z = jnp.zeros((n,))
        state = gm.GaussianState(
            active=jnp.ones((n,), bool), filter_3d=z + 1e-4,
            max_radii2d=z, grad_accum=z, grad_abs_accum=z, denom=z,
        )
        cams = [
            cameras.look_at_camera(
                eye=(3.2 * np.sin(t), 1.2 * np.sin(2 * t), 3.2 * np.cos(t)),
                target=(0, 0, 0), width=64, height=64, uid=k,
            )
            for k, t in enumerate(np.linspace(0, 2 * np.pi, 8, endpoint=False))
        ]
        cam_meta = (
            jnp.stack([c.world_view for c in cams]),
            jnp.stack([c.focal_x for c in cams]),
            jnp.stack([c.focal_y for c in cams]),
            jnp.full((len(cams),), 64.0),
            jnp.full((len(cams),), 64.0),
        )
        out = extract.extract_level_set_mesh(
            params, state, cams, cam_meta, str(tmp_path / "fusion"),
            sh_degree=0, kernel_size=0.1, key_capacity=4096,
            n_binary_steps=5, interpret=True, quiet=True)
        verts_d, faces = ply.read_ply(out)
        verts = np.stack([verts_d["x"], verts_d["y"], verts_d["z"]], -1)
        return verts.astype(np.float64), faces, r

    def test_full_chain_fscore_and_chamfer(self, rng, tmp_path):
        verts, faces, r = self._extracted_sphere_mesh(tmp_path, rng)
        assert len(verts) > 100

        # The 0.5 opacity level set of a shell of sigma=0.12 gaussians is
        # the shell's OUTER envelope, ~1.5 sigma outside the generating
        # sphere — assert that known bias explicitly, then score against
        # the exact GT sphere with a tau that absorbs it.
        sigma = 0.12
        rad = np.linalg.norm(verts, axis=1)
        assert r < np.median(rad) < r + 2 * sigma, np.median(rad)
        assert np.std(rad) < 0.05  # a clean sphere, not noise

        gt = sphere_points(20000, r, rng)
        pred_pts = geo.sample_mesh_surface(verts, faces, density=0.02,
                                           max_points=100_000)
        tau = 0.25
        res = geo.precision_recall_fscore(pred_pts, gt, tau)
        assert res["fscore"] > 0.95, res

        # DTU-style chamfer through dtu_chamfer (synthetic all-observed
        # ObsMask + no plane): bounded by the envelope bias
        from gof_tpu.eval.dtu import dtu_chamfer

        bb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])
        res_mask = 0.05
        dims = np.ceil((bb[1] - bb[0]) / res_mask).astype(int) + 1
        obs = np.ones(tuple(dims), np.uint8)
        ch = dtu_chamfer(pred_pts, gt, obs, bb, res_mask, plane=None)
        assert ch["overall"] < 2 * sigma, ch

        # negative control: a shifted mesh must score clearly worse
        res_bad = geo.precision_recall_fscore(pred_pts + 0.6, gt, tau)
        assert res_bad["fscore"] < res["fscore"] * 0.5
        ch_bad = dtu_chamfer(pred_pts + 0.6, gt, obs, bb, res_mask, plane=None)
        assert ch_bad["overall"] > ch["overall"] * 2
