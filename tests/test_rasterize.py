"""Pallas rasterizer tests (interpret mode on CPU) vs the XLA reference path.

Validates the production kernel against the differentiable tiled XLA
renderer: forward bit-closeness, hand-written VJP vs autodiff, the
reference's documented gradient quirks (distortion-through-depth-only,
median routing), and the densification stat carrier.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gof_tpu import cameras
from gof_tpu.ops import binning, quadrics, tiled_ref
from gof_tpu.ops import rasterize_pallas as rp
from gof_tpu.ops.binning import CHUNK_SIZE
from gof_tpu.sh import rgb_to_sh_dc


def scene(rng, n=24, width=96, height=64, scale_rng=(0.3, 1.0)):
    z = rng.uniform(4, 7, n)
    x = rng.uniform(-1, 1, n) * z * 0.2
    y = rng.uniform(-1, 1, n) * z * 0.2
    means = jnp.asarray(np.stack([x, y, z], -1), jnp.float32)
    scales = jnp.asarray(rng.uniform(*scale_rng, (n, 3)), jnp.float32)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    rots = jnp.asarray(q, jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.9, n), jnp.float32)
    shs = rgb_to_sh_dc(jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32))[:, None, :]
    cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0), width=width, height=height)
    return means, scales, rots, opac, shs, cam


def setup(rng, **kw):
    means, scales, rots, opac, shs, cam = scene(rng, **kw)
    pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1)
    ntx, nty = binning.tile_grid(cam.width, cam.height)
    rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty)
    b = binning.bin_gaussians(pre.depth, rects, ntx, nty, capacity=2048)
    op_eff = opac * jnp.where(pre.valid, jax.lax.stop_gradient(pre.coef), 0.0)
    bg = jnp.array([0.15, 0.1, 0.2])
    meta = rp.RasterMeta(ntx=ntx, nty=nty, width=cam.width, height=cam.height, interpret=True)
    return pre, b, op_eff, bg, cam, meta, ntx, nty


def pallas_image(pre, b, op_eff, bg, cam, meta, ntx, nty, carrier=None):
    if carrier is None:
        carrier = jnp.zeros((pre.rgb.shape[0], 3))
    out = rp.rasterize(meta, pre.rgb, op_eff, pre.v2g_M, pre.v2g_u0,
                       pre.conic, pre.mean2d, carrier, cam.focal_x, cam.focal_y, bg, b)
    return tiled_ref.assemble_image(out, ntx, nty, cam.width, cam.height)


def xla_image(pre, b, op_eff, bg, cam, ntx, nty):
    payload = tiled_ref.build_payload(pre.rgb, op_eff, pre.v2g_M, pre.v2g_u0, b)
    max_len = max(int(np.asarray(b.bounds[1:] - b.bounds[:-1]).max()), 1)
    out = tiled_ref.render_tiles_xla(payload, b, ntx, nty, cam.width, cam.height,
                                     cam.focal_x, cam.focal_y, bg, max_len)
    return tiled_ref.assemble_image(out, ntx, nty, cam.width, cam.height)


class TestPallasForward:
    @pytest.mark.slow
    def test_matches_xla_reference(self, rng):
        pre, b, op_eff, bg, cam, meta, ntx, nty = setup(rng)
        img_p = np.asarray(pallas_image(pre, b, op_eff, bg, cam, meta, ntx, nty))
        img_x = np.asarray(xla_image(pre, b, op_eff, bg, cam, ntx, nty))
        np.testing.assert_allclose(img_p[:9], img_x[:9], atol=5e-6, rtol=1e-4)
        # aux channels too (T_final, sum w*m)
        np.testing.assert_allclose(
            img_p[tiled_ref.CH_TFINAL], img_x[tiled_ref.CH_TFINAL], atol=5e-6, rtol=1e-4
        )

    @pytest.mark.slow

    def test_multi_chunk_lists(self, rng):
        """>128 gaussians per tile exercise the chunk loop + carry."""
        pre, b, op_eff, bg, cam, meta, ntx, nty = setup(rng, n=300, width=64, height=32)
        img_p = np.asarray(pallas_image(pre, b, op_eff, bg, cam, meta, ntx, nty))
        img_x = np.asarray(xla_image(pre, b, op_eff, bg, cam, ntx, nty))
        assert int(np.asarray(b.bounds[1:] - b.bounds[:-1]).max()) > CHUNK_SIZE
        np.testing.assert_allclose(img_p[:9], img_x[:9], atol=1e-5, rtol=1e-4)

    def test_empty_scene(self, rng):
        pre, b, op_eff, bg, cam, meta, ntx, nty = setup(rng)
        img = np.asarray(pallas_image(pre, b, op_eff * 0.0, bg, cam, meta, ntx, nty))
        np.testing.assert_allclose(img[0], float(bg[0]), atol=1e-6)
        np.testing.assert_allclose(img[tiled_ref.CH_TFINAL], 1.0, atol=1e-6)

    @pytest.mark.slow
    def test_giant_gaussian_image_parity(self, rng):
        """A near-camera Gaussian whose rect spans the whole tile grid (the
        reference's rects are unbounded, forward.cu:363-371; round 1 clamped
        them to 8x8 tiles — lifted since). The full image, including the far
        corners the clamp used to lose, must match the XLA reference."""
        means, scales, rots, opac, shs, cam = scene(rng, n=40, width=512, height=256)
        means = jnp.concatenate(
            [jnp.asarray([[0.0, 0.0, 2.2]], jnp.float32), means])
        scales = jnp.concatenate(
            [jnp.asarray([[2.5, 2.5, 2.5]], jnp.float32), scales])
        rots = jnp.concatenate(
            [jnp.asarray([[1.0, 0.0, 0.0, 0.0]], jnp.float32), rots])
        opac = jnp.concatenate([jnp.asarray([0.55], jnp.float32), opac])
        shs = jnp.concatenate(
            [rgb_to_sh_dc(jnp.asarray([[0.2, 0.7, 0.3]], jnp.float32))[:, None, :],
             shs])
        pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1)
        ntx, nty = binning.tile_grid(cam.width, cam.height)
        rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty)
        assert int(rects.w[0]) * int(rects.h[0]) > 8 * 8  # rect >> old clamp
        b = binning.bin_gaussians(pre.depth, rects, ntx, nty, capacity=2048)
        op_eff = opac * jnp.where(pre.valid, jax.lax.stop_gradient(pre.coef), 0.0)
        bg = jnp.array([0.15, 0.1, 0.2])
        meta = rp.RasterMeta(ntx=ntx, nty=nty, width=cam.width, height=cam.height,
                             interpret=True)
        img_p = np.asarray(pallas_image(pre, b, op_eff, bg, cam, meta, ntx, nty))
        img_x = np.asarray(xla_image(pre, b, op_eff, bg, cam, ntx, nty))
        np.testing.assert_allclose(img_p[:9], img_x[:9], atol=1e-5, rtol=1e-4)
        # the giant gaussian must actually tint the extreme corners
        assert abs(img_p[1, 0, 0] - float(bg[1])) > 1e-3
        assert abs(img_p[1, -1, -1] - float(bg[1])) > 1e-3


class TestPallasBackward:
    @pytest.mark.slow
    def test_grads_match_autodiff(self, rng):
        pre, b, op_eff, bg, cam, meta, ntx, nty = setup(rng, n=16, width=64, height=32)
        key = jax.random.PRNGKey(1)
        gw = jax.random.normal(key, (8, nty * 32, ntx * 32)) * 0.1

        def loss_pallas(rgb, op, M, u0):
            out = rp.rasterize(meta, rgb, op, M, u0, pre.conic,
                               pre.mean2d, jnp.zeros((rgb.shape[0], 3)),
                               cam.focal_x, cam.focal_y, bg, b)
            img = tiled_ref.assemble_image(out, ntx, nty, ntx * 32, nty * 32)
            return jnp.sum(img[:8] * gw)

        def loss_xla(rgb, op, M, u0):
            P = rgb.shape[0]
            flat = jnp.concatenate([rgb, op[:, None], M.reshape(P, 9), u0], axis=1)
            flat = jnp.concatenate([flat, jnp.zeros((1, 16))], axis=0)
            payload = flat[b.slot_to_gaussian]
            max_len = max(int(np.asarray(b.bounds[1:] - b.bounds[:-1]).max()), 1)
            out = tiled_ref.render_tiles_xla(payload, b, ntx, nty, ntx * 32, nty * 32,
                                             cam.focal_x, cam.focal_y, bg, max_len)
            img = tiled_ref.assemble_image(out, ntx, nty, ntx * 32, nty * 32)
            return jnp.sum(img[:8] * gw)

        args = (pre.rgb, op_eff, pre.v2g_M, pre.v2g_u0)
        gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*args)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(*args)
        for name, a, c in zip(("rgb", "op", "M", "u0"), gp, gx):
            a, c = np.asarray(a), np.asarray(c)
            scale = max(np.abs(c).max(), 1e-6)
            assert np.abs(a - c).max() / scale < 1e-4, name

    @pytest.mark.slow

    def test_distortion_grad_reference_quirk(self, rng):
        """ch8 cotangent flows ONLY through the mapped depth m (weights and
        normalization detached), matching backward.cu:839-858. Verified
        against a hand-written jnp implementation of that exact rule."""
        pre, b, op_eff, bg, cam, meta, ntx, nty = setup(rng, n=10, width=32, height=32)

        def loss_pallas(M, u0):
            out = rp.rasterize(meta, pre.rgb, op_eff, M, u0, pre.conic,
                               pre.mean2d, jnp.zeros((10, 3)), cam.focal_x, cam.focal_y, bg, b)
            img = tiled_ref.assemble_image(out, ntx, nty, ntx * 32, nty * 32)
            return jnp.sum(img[8])

        g_pallas = jax.grad(loss_pallas, argnums=(0, 1))(pre.v2g_M, pre.v2g_u0)

        # hand-written quirk rule on the XLA path: recompute per-pair (w, m),
        # dL/dm_i = 2 w_i (m_i * acc_tot - d1_tot) * g8, m -> t -> (M, u0)
        from gof_tpu.constants import TRANSMITTANCE_EPS

        def quirk_loss(M, u0):
            # dense oracle-style blend over all gaussians sorted by depth
            order = jnp.argsort(jnp.where(pre.valid, pre.depth, jnp.inf))
            Mo, u0o, opo = M[order], u0[order], op_eff[order]
            from gof_tpu.ops import blend

            rx, ry = blend.pixel_rays(cam.width, cam.height, cam.focal_x, cam.focal_y)
            rx, ry = rx.reshape(1, -1), ry.reshape(1, -1)
            terms = blend.ray_terms(
                Mo[:, 0, 0, None], Mo[:, 0, 1, None], Mo[:, 0, 2, None],
                Mo[:, 1, 0, None], Mo[:, 1, 1, None], Mo[:, 1, 2, None],
                Mo[:, 2, 0, None], Mo[:, 2, 1, None], Mo[:, 2, 2, None],
                u0o[:, 0, None], u0o[:, 1, None], u0o[:, 2, None], opo[:, None],
                rx, ry,
            )
            sg = jax.lax.stop_gradient
            a = sg(terms.alpha)
            prod_incl = jnp.cumprod(1 - a, axis=0)
            T = jnp.concatenate([jnp.ones_like(prod_incl[:1]), prod_incl[:-1]], axis=0)
            w = sg(a * T * (T > TRANSMITTANCE_EPS))
            m = blend.ndc_depth(terms.t)  # gradient flows ONLY here
            acc = sg(jnp.sum(w, axis=0))
            d1 = sg(jnp.sum(w * m, axis=0))
            # linearized quirk rule: dL/dm_i = 2 w_i (m_i acc_tot - d1_tot),
            # with the (1-T)^2 normalization omitted exactly as the CUDA does
            return jnp.sum(2.0 * w * sg(m * acc - d1) * m)

        g_quirk = jax.grad(quirk_loss, argnums=(0, 1))(pre.v2g_M, pre.v2g_u0)
        for name, a, c in zip(("M", "u0"), g_pallas, g_quirk):
            a, c = np.asarray(a), np.asarray(c)
            scale = max(np.abs(c).max(), 1e-8)
            assert np.abs(a - c).max() / scale < 5e-3, (name, np.abs(a - c).max(), scale)

    @pytest.mark.slow

    def test_densify_stats_carrier(self, rng):
        """The carrier cotangent reproduces the reference's pseudo-gradient
        (backward.cu:896-909): |gx|+|gy| channel positive where visible."""
        pre, b, op_eff, bg, cam, meta, ntx, nty = setup(rng, n=12, width=64, height=32)

        def loss(carrier):
            img = pallas_image(pre, b, op_eff, bg, cam, meta, ntx, nty, carrier)
            return jnp.sum((img[:3] - 0.5) ** 2)

        g = np.asarray(jax.grad(loss)(jnp.zeros((12, 3))))
        valid = np.asarray(pre.valid)
        assert np.isfinite(g).all()
        # abs-channel is a sum of |.| terms: nonnegative, positive for visible
        assert (g[valid, 2] >= 0).all()
        assert g[valid, 2].max() > 0

    @pytest.mark.slow

    def test_median_depth_grad_routing(self, rng):
        """Depth-channel gradient reaches exactly the median contributor's
        parameters (backward.cu:879-882): perturbing depth changes only the
        front opaque gaussian."""
        # two gaussians on the same ray; front one opaque
        means = jnp.array([[0.0, 0.0, 4.0], [0.0, 0.0, 6.0]])
        scales = jnp.full((2, 3), 0.5)
        rots = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
        opac = jnp.array([0.95, 0.95])
        shs = rgb_to_sh_dc(jnp.full((2, 3), 0.5))[:, None, :]
        cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0), width=32, height=32)
        pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1)
        ntx, nty = binning.tile_grid(32, 32)
        rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty)
        b = binning.bin_gaussians(pre.depth, rects, ntx, nty, capacity=256)
        op_eff = opac * jax.lax.stop_gradient(pre.coef)
        meta = rp.RasterMeta(ntx=ntx, nty=nty, width=32, height=32, interpret=True)

        def depth_loss(u0):
            out = rp.rasterize(meta, pre.rgb, op_eff, pre.v2g_M, u0,
                               pre.conic, pre.mean2d, jnp.zeros((2, 3)),
                               cam.focal_x, cam.focal_y, jnp.zeros(3), b)
            img = tiled_ref.assemble_image(out, ntx, nty, 32, 32)
            return img[6, 16, 16]  # median depth at the center pixel

        g = np.asarray(jax.grad(depth_loss)(pre.v2g_u0))
        assert np.abs(g[0]).sum() > 1e-6  # front gaussian gets the gradient
        assert np.abs(g[1]).sum() < 1e-8  # occluded one does not


class TestWithRegOff:
    """with_reg=False: rgb/alpha/T channels unchanged, reg channels compiled
    out to zeros, and gradients of an rgb+alpha loss identical."""

    def test_forward_channels(self, rng):
        pre, b, op_eff, bg, cam, meta, ntx, nty = setup(rng)
        meta_off = meta._replace(with_reg=False)
        img_on = np.asarray(pallas_image(pre, b, op_eff, bg, cam, meta, ntx, nty))
        img_off = np.asarray(pallas_image(pre, b, op_eff, bg, cam, meta_off, ntx, nty))
        # rgb (0:3), alpha (7) and T_final unchanged
        np.testing.assert_array_equal(img_off[:3], img_on[:3])
        np.testing.assert_array_equal(img_off[7], img_on[7])
        np.testing.assert_array_equal(
            img_off[tiled_ref.CH_TFINAL], img_on[tiled_ref.CH_TFINAL]
        )
        # reg channels (normal 3:6, depth 6, distortion 8) render as zeros
        np.testing.assert_array_equal(img_off[3:6], 0.0)
        np.testing.assert_array_equal(img_off[6], 0.0)
        np.testing.assert_array_equal(img_off[8], 0.0)
        assert np.abs(img_on[3:6]).max() > 0  # the scene does have normals

    @pytest.mark.slow

    def test_rgb_alpha_grads_identical(self, rng):
        pre, b, op_eff, bg, cam, meta, ntx, nty = setup(rng, n=16, width=64, height=32)
        key = jax.random.PRNGKey(2)
        gw = jax.random.normal(key, (3, nty * 32, ntx * 32)) * 0.1
        ga = jax.random.normal(jax.random.PRNGKey(3), (nty * 32, ntx * 32)) * 0.1

        def loss(m):
            def f(rgb, op, M, u0):
                out = rp.rasterize(m, rgb, op, M, u0, pre.conic,
                                   pre.mean2d, jnp.zeros((rgb.shape[0], 3)),
                                   cam.focal_x, cam.focal_y, bg, b)
                img = tiled_ref.assemble_image(out, ntx, nty, ntx * 32, nty * 32)
                return jnp.sum(img[:3] * gw) + jnp.sum(img[7] * ga)

            return f

        args = (pre.rgb, op_eff, pre.v2g_M, pre.v2g_u0)
        g_on = jax.grad(loss(meta), argnums=(0, 1, 2, 3))(*args)
        g_off = jax.grad(loss(meta._replace(with_reg=False)), argnums=(0, 1, 2, 3))(*args)
        for name, a, c in zip(("rgb", "op", "M", "u0"), g_off, g_on):
            a, c = np.asarray(a), np.asarray(c)
            scale = max(np.abs(c).max(), 1e-6)
            assert np.abs(a - c).max() / scale < 1e-5, name
            assert np.abs(c).max() > 0, name
