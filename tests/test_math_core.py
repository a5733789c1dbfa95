"""Unit tests for transforms, SH, and the quadric preprocess math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gof_tpu import cameras, sh, transforms
from gof_tpu.ops import blend, quadrics

jax.config.update("jax_enable_x64", False)


def random_gaussians(rng, n):
    means = rng.normal(size=(n, 3)).astype(np.float32)
    scales = np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.5 - 2.0)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q)


class TestTransforms:
    def test_quat_identity(self):
        R = transforms.quat_to_rot(jnp.array([1.0, 0, 0, 0]))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_quat_orthonormal(self, rng):
        q = rng.normal(size=(32, 4)).astype(np.float32)
        R = np.asarray(transforms.quat_to_rot(jnp.asarray(q)), dtype=np.float64)
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
        dets = np.linalg.det(np.asarray(R))
        np.testing.assert_allclose(dets, 1.0, atol=1e-5)

    def test_projection_roundtrip(self):
        cam = cameras.look_at_camera(eye=(0, 0, -4), target=(0, 0, 0), width=64, height=48)
        # A point straight ahead projects to the image center.
        ndc = transforms.project_points(jnp.array([[0.0, 0.0, 0.0]]), cam.full_proj)
        np.testing.assert_allclose(ndc[0, :2], [0.0, 0.0], atol=1e-5)
        # View-space depth is the eye distance.
        pv = transforms.transform_points(jnp.array([[0.0, 0.0, 0.0]]), cam.world_view)
        np.testing.assert_allclose(pv[0, 2], 4.0, atol=1e-5)

    def test_world_view_inverse_center(self):
        cam = cameras.look_at_camera(eye=(1.0, 2.0, -3.0), target=(0, 0, 0))
        np.testing.assert_allclose(cam.cam_center, [1.0, 2.0, -3.0], atol=1e-5)


class TestSH:
    def test_degree0_constant(self, rng):
        shs = jnp.asarray(rng.normal(size=(5, 16, 3)).astype(np.float32))
        dirs = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = sh.eval_sh(0, shs, dirs)
        np.testing.assert_allclose(out, sh.C0 * shs[:, 0, :], atol=1e-6)

    def test_rgb_roundtrip(self):
        rgb = jnp.array([[0.2, 0.5, 0.9]])
        np.testing.assert_allclose(sh.sh_dc_to_rgb(sh.rgb_to_sh_dc(rgb)), rgb, atol=1e-6)

    def test_degrees_nested(self, rng):
        """Higher degrees must extend, not alter, lower-degree output."""
        shs = jnp.asarray(rng.normal(size=(4, 16, 3)).astype(np.float32))
        shs = shs.at[:, 1:, :].set(0.0)
        dirs = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        for deg in (1, 2, 3):
            np.testing.assert_allclose(
                sh.eval_sh(deg, shs, dirs), sh.eval_sh(0, shs, dirs), atol=1e-6
            )


class TestQuadrics:
    def test_cov3d_isotropic(self):
        s = jnp.array([[0.5, 0.5, 0.5]])
        q = jnp.array([[0.7, 0.3, -0.2, 0.1]])
        cov = quadrics.cov3d_from_scaling_rotation(s, q)
        np.testing.assert_allclose(cov[0], [0.25, 0, 0, 0.25, 0, 0.25], atol=1e-6)

    def test_cov3d_rotation_invariant_trace(self, rng):
        means, s, q = random_gaussians(rng, 16)
        cov = quadrics.cov3d_from_scaling_rotation(s, q)
        trace = cov[:, 0] + cov[:, 3] + cov[:, 5]
        np.testing.assert_allclose(trace, jnp.sum(s * s, axis=-1), rtol=1e-5)

    def test_v2g_matches_ten_float_form(self, rng):
        """The factored (M, u0) form must reproduce the reference's 10-float
        [Sigma, B, C] quadric (forward.cu:268-277) evaluated along rays."""
        means, s, q = random_gaussians(rng, 8)
        means = means + jnp.array([0.0, 0.0, 6.0])
        cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 6.0), width=32, height=32)
        v2g = quadrics.view_to_gaussian(means, s, q, cam.world_view)
        ten = quadrics.v2g_ten_floats(v2g)

        ray = jnp.array([0.05, -0.03, 1.0])
        t, min_value, normal = quadrics.ray_gaussian_peak(v2g.M, v2g.u0, ray)

        # Reference evaluation: AA = r^T Sigma r, BB = 2 B.r, CC = C
        S6, B, C = ten[:, :6], ten[:, 6:9], ten[:, 9]
        rx, ry = ray[0], ray[1]
        n0 = S6[:, 0] * rx + S6[:, 1] * ry + S6[:, 2]
        n1 = S6[:, 1] * rx + S6[:, 3] * ry + S6[:, 4]
        n2 = S6[:, 2] * rx + S6[:, 4] * ry + S6[:, 5]
        AA = rx * n0 + ry * n1 + n2
        BB = 2.0 * (B[:, 0] * rx + B[:, 1] * ry + B[:, 2])
        t_ref = -BB / (2 * AA)
        min_ref = -(BB / AA) * (BB / 4.0) + C

        np.testing.assert_allclose(t, t_ref, rtol=1e-4)
        np.testing.assert_allclose(min_value, min_ref, rtol=1e-2, atol=1e-3)
        np.testing.assert_allclose(normal, jnp.stack([n0, n1, n2], -1), rtol=1e-3, atol=1e-4)

    def test_peak_matches_bruteforce(self, rng):
        """t*/min_value must equal the numerical minimum along the ray."""
        means, s, q = random_gaussians(rng, 4)
        means = means + jnp.array([0.0, 0.0, 5.0])
        cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0))
        v2g = quadrics.view_to_gaussian(means, s, q, cam.world_view)
        ray = jnp.array([0.02, 0.01, 1.0])
        t, min_value, _ = quadrics.ray_gaussian_peak(v2g.M, v2g.u0, ray)

        ts = jnp.linspace(0.1, 20.0, 20000)
        pts = ts[:, None] * ray[None, :]  # view-space ray samples
        u = jnp.einsum("nij,mj->nmi", v2g.M, pts) + v2g.u0[:, None, :]
        vals = jnp.sum(u * u, axis=-1)  # [N, M]
        idx = jnp.argmin(vals, axis=1)
        np.testing.assert_allclose(t, ts[idx], atol=2e-3)
        np.testing.assert_allclose(min_value, jnp.min(vals, axis=1), rtol=1e-3, atol=1e-5)

    def test_preprocess_culling(self):
        """Gaussians behind the camera are culled (auxiliary.h:177-202)."""
        means = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, -2.0]])
        s = jnp.full((2, 3), 0.1)
        q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
        shs = jnp.zeros((2, 1, 3))
        cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 1.0))
        pre = quadrics.preprocess(means, s, q, shs, 0, cam, 0.0)
        assert bool(pre.valid[0])
        assert not bool(pre.valid[1])

    def test_mip_dilation_coef(self, rng):
        """Dilation shrinks opacity: coef <= 1, and = 1 at kernel_size 0."""
        means, s, q = random_gaussians(rng, 16)
        means = means + jnp.array([0.0, 0.0, 6.0])
        cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 6.0))
        cov3d = quadrics.cov3d_from_scaling_rotation(s, q)
        _, coef0 = quadrics.cov2d_ewa(
            means, cov3d, cam.world_view, cam.focal_x, cam.focal_y,
            cam.tan_fovx, cam.tan_fovy, 0.0,
        )
        _, coef = quadrics.cov2d_ewa(
            means, cov3d, cam.world_view, cam.focal_x, cam.focal_y,
            cam.tan_fovx, cam.tan_fovy, 0.3,
        )
        np.testing.assert_allclose(coef0, 1.0, atol=1e-2)
        assert np.all(np.asarray(coef) <= 1.0 + 1e-5)


class TestBlend:
    def test_ndc_depth_range(self):
        assert float(blend.ndc_depth(jnp.asarray(blend.NEAR_PLANE if False else 0.2))) == pytest.approx(0.0, abs=1e-6)
        assert float(blend.ndc_depth(jnp.asarray(100.0))) == pytest.approx(1.0, abs=1e-6)

    def test_pixel_rays_center(self):
        rx, ry = blend.pixel_rays(4, 4, 10.0, 10.0)
        # symmetric around the center
        np.testing.assert_allclose(np.asarray(rx)[:, 0], -np.asarray(rx)[:, -1], atol=1e-7)
        np.testing.assert_allclose(np.asarray(ry)[0, :], -np.asarray(ry)[-1, :], atol=1e-7)
