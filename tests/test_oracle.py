"""Sanity tests of the dense oracle renderer (the rasterizer spec)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gof_tpu import cameras
from gof_tpu.constants import ALPHA_OFFSET, DEPTH_OFFSET, DISTORTION_OFFSET
from gof_tpu.ops import oracle
from gof_tpu.sh import rgb_to_sh_dc


def single_gaussian_scene(color=(1.0, 0.0, 0.0), z=4.0, scale=0.3):
    means = jnp.array([[0.0, 0.0, z]])
    scales = jnp.full((1, 3), scale)
    rots = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    opac = jnp.array([0.9])
    shs = jnp.zeros((1, 1, 3)).at[0, 0].set(rgb_to_sh_dc(jnp.asarray(color)))
    cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, z), width=32, height=32)
    return means, scales, rots, opac, shs, cam


class TestOracle:
    @pytest.mark.slow
    def test_center_blob(self):
        means, scales, rots, opac, shs, cam = single_gaussian_scene()
        out = oracle.render_oracle(
            means, scales, rots, opac, shs, 0, cam, 0.0, jnp.zeros(3)
        )
        img = np.asarray(out.image)
        # center pixel is red-ish, corners near background (black)
        assert img[0, 16, 16] > 0.5
        assert img[1, 16, 16] < 1e-3
        assert img[0, 0, 0] < 1e-2
        # alpha channel peaks at the center
        assert img[ALPHA_OFFSET, 16, 16] > 0.8
        # median depth at the center equals the Gaussian depth
        assert abs(img[DEPTH_OFFSET, 16, 16] - 4.0) < 1e-2

    def test_background_blend(self):
        means, scales, rots, opac, shs, cam = single_gaussian_scene()
        bg = jnp.array([0.0, 0.0, 1.0])
        out = oracle.render_oracle(means, scales, rots, opac, shs, 0, cam, 0.0, bg)
        img = np.asarray(out.image)
        # empty corner shows the background
        assert img[2, 0, 0] > 0.99
        # out = C + T * bg consistency at the center
        T = np.asarray(out.transmittance)[16, 16]
        assert abs(img[2, 16, 16] - T * 1.0) < 1e-5

    def test_depth_ordering_occlusion(self):
        """A nearer opaque red Gaussian occludes a farther green one."""
        means = jnp.array([[0.0, 0.0, 3.0], [0.0, 0.0, 6.0]])
        scales = jnp.full((2, 3), 0.4)
        rots = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
        opac = jnp.array([0.99, 0.99])
        shs = jnp.zeros((2, 1, 3))
        shs = shs.at[0, 0].set(rgb_to_sh_dc(jnp.array([1.0, 0.0, 0.0])))
        shs = shs.at[1, 0].set(rgb_to_sh_dc(jnp.array([0.0, 1.0, 0.0])))
        cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 1.0), width=16, height=16)
        out = oracle.render_oracle(means, scales, rots, opac, shs, 0, cam, 0.0, jnp.zeros(3))
        img = np.asarray(out.image)
        assert img[0, 8, 8] > 5 * img[1, 8, 8]
        # and the permuted input gives the identical image (order-invariance
        # through the depth sort)
        out2 = oracle.render_oracle(
            means[::-1], scales, rots, opac, shs[::-1], 0, cam, 0.0, jnp.zeros(3)
        )
        np.testing.assert_allclose(img, np.asarray(out2.image), atol=1e-5)

    def test_normals_face_camera(self):
        means, scales, rots, opac, shs, cam = single_gaussian_scene(scale=0.3)
        out = oracle.render_oracle(means, scales, rots, opac, shs, 0, cam, 0.0, jnp.zeros(3))
        img = np.asarray(out.image)
        n = img[3:6, 16, 16]
        alpha = img[ALPHA_OFFSET, 16, 16]
        n = n / max(alpha, 1e-6)
        # view-space normal at the silhouette center points toward the camera (-z)
        assert n[2] < -0.9

    def test_distortion_two_surfaces(self):
        """Two semi-transparent surfaces at different depths must produce more
        depth distortion than a single surface (train.py:163-167 loss)."""
        rots = jnp.array([[1.0, 0, 0, 0]])
        scales = jnp.full((1, 3), 0.5)
        shs = jnp.zeros((1, 1, 3))
        cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 1.0), width=16, height=16)
        one = oracle.render_oracle(
            jnp.array([[0, 0, 4.0]]), scales, rots, jnp.array([0.5]), shs, 0, cam, 0.0, jnp.zeros(3)
        )
        two = oracle.render_oracle(
            jnp.array([[0, 0, 4.0], [0, 0, 8.0]]),
            jnp.tile(scales, (2, 1)),
            jnp.tile(rots, (2, 1)),
            jnp.array([0.5, 0.5]),
            jnp.tile(shs, (2, 1, 1)),
            0, cam, 0.0, jnp.zeros(3),
        )
        d1 = np.asarray(one.image)[DISTORTION_OFFSET, 8, 8]
        d2 = np.asarray(two.image)[DISTORTION_OFFSET, 8, 8]
        assert d2 > d1 + 1e-5

    @pytest.mark.slow

    def test_gradients_flow(self):
        """All model tensors receive gradients through the oracle."""
        means, scales, rots, opac, shs, cam = single_gaussian_scene()

        def loss(params):
            out = oracle.render_oracle(
                params["m"], params["s"], params["r"], params["o"], params["sh"],
                0, cam, 0.1, jnp.zeros(3),
            )
            return jnp.sum(out.image[:3] ** 2) + jnp.sum(out.image[8])

        grads = jax.grad(loss)({"m": means, "s": scales, "r": rots, "o": opac, "sh": shs})
        for k, g in grads.items():
            assert np.all(np.isfinite(np.asarray(g))), k
        assert np.any(np.asarray(grads["m"]) != 0)
        assert np.any(np.asarray(grads["o"]) != 0)
        assert np.any(np.asarray(grads["s"]) != 0)
