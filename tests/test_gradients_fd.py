"""Finite-difference anchors for the differentiable rendering chain.

The Pallas VJP is tested against autodiff of the XLA path elsewhere; here the
*math itself* (oracle autodiff) is checked against central differences, and
depth_to_normal against analytic plane normals.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gof_tpu import cameras
from gof_tpu.ops import oracle
from gof_tpu.sh import rgb_to_sh_dc
from gof_tpu.train import depth_to_normal


class TestFiniteDifference:
    @pytest.mark.slow
    def test_oracle_grads_match_fd(self, rng):
        n = 4
        means = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.3
                            + np.array([0, 0, 5], np.float32))
        scales = jnp.asarray(rng.uniform(0.2, 0.5, (n, 3)), jnp.float32)
        q = rng.normal(size=(n, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        rots = jnp.asarray(q, jnp.float32)
        opac = jnp.asarray(rng.uniform(0.4, 0.8, n), jnp.float32)
        shs = rgb_to_sh_dc(jnp.asarray(rng.uniform(0.2, 0.8, (n, 3)), jnp.float32))[:, None, :]
        cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0), width=24, height=24)
        key = jax.random.PRNGKey(0)
        gw = jax.random.normal(key, (8, 24, 24)) * 0.1
        # ch6 (median depth) selects one contributor discretely — a finite
        # difference across the selection switch measures the jump, not the
        # gradient; exclude it (its routing is tested in test_rasterize)
        gw = gw.at[6].set(0.0)

        def loss64(means, scales, opac):
            out = oracle.render_oracle(means, scales, rots, opac, shs, 0, cam, 0.1, jnp.zeros(3))
            return jnp.sum(out.image[:8] * gw)

        g_means, g_scales, g_opac = jax.grad(loss64, argnums=(0, 1, 2))(means, scales, opac)

        def fd(fun, x, i, eps):
            xp = np.asarray(x, np.float64).copy().reshape(-1)
            xm = xp.copy()
            xp[i] += eps
            xm[i] -= eps
            shape = x.shape
            return (
                float(fun(jnp.asarray(xp.reshape(shape), jnp.float32)))
                - float(fun(jnp.asarray(xm.reshape(shape), jnp.float32)))
            ) / (2 * eps)

        # a handful of components per tensor; eps must stay small enough not
        # to straddle the 1/255 / clamp mask boundaries (verified: FD at
        # eps=3e-4 converges to the autodiff value)
        for i in (0, 4, 7):
            got = float(np.asarray(g_means).reshape(-1)[i])
            want = fd(lambda m: loss64(m, scales, opac), means, i, 3e-4)
            assert abs(got - want) <= 0.1 * max(abs(want), 0.05), ("means", i, got, want)
        for i in (1, 5):
            got = float(np.asarray(g_scales).reshape(-1)[i])
            want = fd(lambda s: loss64(means, s, opac), scales, i, 3e-4)
            assert abs(got - want) <= 0.1 * max(abs(want), 0.05), ("scales", i, got, want)
        for i in (0, 2):
            got = float(np.asarray(g_opac).reshape(-1)[i])
            want = fd(lambda o: loss64(means, scales, o), opac, i, 3e-4)
            assert abs(got - want) <= 0.1 * max(abs(want), 0.05), ("opac", i, got, want)


class TestDepthToNormal:
    def test_fronto_parallel_plane(self):
        """Constant-depth plane -> normals along -view z in world space."""
        cam = cameras.look_at_camera(eye=(0, 0, -3.0), target=(0, 0, 0), width=32, height=32)
        depth = jnp.full((32, 32), 3.0)
        n = np.asarray(depth_to_normal(cam, depth))
        inner = n[:, 8:-8, 8:-8]
        # world forward is +z here; plane normal faces the camera (-z)... up to
        # sign convention the dominant axis must be z with |z| ~ 1
        zcomp = inner[2]
        assert np.all(np.abs(np.abs(zcomp) - 1.0) < 1e-3)
        assert np.all(np.abs(inner[0]) < 2e-2) and np.all(np.abs(inner[1]) < 2e-2)

    def test_tilted_plane(self):
        """Depth of a plane z = 5 + x (view space): recovered normals match
        the analytic plane normal."""
        cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 1.0), width=48, height=48)
        from gof_tpu.ops.blend import pixel_rays

        rx, ry = pixel_rays(48, 48, cam.focal_x, cam.focal_y)
        # plane x_view = (z - 5) => along a ray x = rx * t, z = t:
        # t*rx = t - 5 -> t = 5 / (1 - rx)
        depth = 5.0 / (1.0 - rx)
        n = np.asarray(depth_to_normal(cam, jnp.asarray(depth)))[:, 10:-10, 10:-10]
        n_unit = n / (np.linalg.norm(n, axis=0, keepdims=True) + 1e-12)
        # analytic plane normal (view space): plane x - z + 5 = 0 -> (1,0,-1)/sqrt2
        want = np.array([1.0, 0.0, -1.0]) / np.sqrt(2)
        R_c2w = np.asarray(cam.world_view)[:3, :3].T
        want_world = R_c2w @ want
        dots = np.abs(np.einsum("i,ihw->hw", want_world, n_unit))
        assert np.quantile(dots, 0.05) > 0.999
