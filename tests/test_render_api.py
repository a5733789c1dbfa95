"""Tests of the high-level ops.render API (both backends)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gof_tpu import cameras
from gof_tpu.ops import render as render_lib
from gof_tpu.sh import rgb_to_sh_dc


def scene(rng, n=16):
    z = rng.uniform(4, 7, n)
    means = jnp.asarray(
        np.stack([rng.uniform(-1, 1, n) * z * 0.2, rng.uniform(-1, 1, n) * z * 0.2, z], -1),
        jnp.float32,
    )
    scales = jnp.asarray(rng.uniform(0.1, 0.4, (n, 3)), jnp.float32)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    rots = jnp.asarray(q, jnp.float32)
    opac = jnp.asarray(rng.uniform(0.4, 0.9, n), jnp.float32)
    shs = rgb_to_sh_dc(jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32))[:, None, :]
    cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0), width=64, height=64)
    return means, scales, rots, opac, shs, cam


class TestRenderAPI:
    @pytest.mark.slow
    def test_backends_agree(self, rng):
        means, scales, rots, opac, shs, cam = scene(rng)
        bg = jnp.array([0.1, 0.2, 0.3])
        out_p = render_lib.render(cam, means, scales, rots, opac, shs, 0, 0.1, bg,
                                  capacity=2048, backend="pallas", interpret=True)
        out_x = render_lib.render(cam, means, scales, rots, opac, shs, 0, 0.1, bg,
                                  capacity=2048, backend="xla")
        np.testing.assert_allclose(np.asarray(out_p.image), np.asarray(out_x.image),
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(out_p.visibility), np.asarray(out_x.visibility))

    @pytest.mark.slow

    def test_overflow_reported(self, rng):
        means, scales, rots, opac, shs, cam = scene(rng, n=64)
        out = render_lib.render(cam, means, scales, rots, opac, shs, 0, 0.1,
                                jnp.zeros(3), capacity=8, backend="xla")
        assert bool(out.overflow)

    def test_active_mask_excludes(self, rng):
        means, scales, rots, opac, shs, cam = scene(rng)
        bg = jnp.zeros(3)
        mask = jnp.zeros((16,), bool)
        out = render_lib.render(cam, means, scales, rots, opac, shs, 0, 0.1, bg,
                                active_mask=mask, capacity=2048, backend="xla")
        np.testing.assert_allclose(np.asarray(out.image[:3]), 0.0, atol=1e-7)
        # masked-out gaussians contribute zero capacity demand (the class-
        # stride binning assigns culled gaussians no slots at all)
        assert int(out.num_keys) == 0
        assert not bool(out.overflow)

    @pytest.mark.slow

    def test_opacity_radius_tightening_is_lossless(self, rng):
        """The opacity-aware radius must not change the image beyond the
        1/255-cutoff tolerance."""
        means, scales, rots, opac, shs, cam = scene(rng)
        opac_low = opac * 0.2  # low opacities -> much tighter radii
        bg = jnp.zeros(3)
        from gof_tpu.ops import binning, quadrics, tiled_ref
        from gof_tpu.ops.binning import CHUNK_SIZE

        def img_with(radius_opac):
            pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1,
                                      opacities=radius_opac)
            ntx, nty = binning.tile_grid(cam.width, cam.height)
            rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty)
            b = binning.bin_gaussians(pre.depth, rects, ntx, nty, 4096)
            op_eff = opac_low * jnp.where(pre.valid, pre.coef, 0.0)
            payload = tiled_ref.build_payload(pre.rgb, op_eff, pre.v2g_M, pre.v2g_u0, b)
            L = max(int(np.asarray(b.bounds[1:] - b.bounds[:-1]).max()), 1)
            out = tiled_ref.render_tiles_xla(payload, b, ntx, nty, 64, 64,
                                             cam.focal_x, cam.focal_y, bg, L)
            return np.asarray(tiled_ref.assemble_image(out, ntx, nty, 64, 64)), int(b.num_keys)

        img_tight, nk_tight = img_with(opac_low)
        img_wide, nk_wide = img_with(None)
        assert nk_tight <= nk_wide
        np.testing.assert_allclose(img_tight[:9], img_wide[:9], atol=2e-2, rtol=1e-3)


class TestLivenessCulling:
    """Temporal liveness compaction (binning.compact_live): bit-identical
    render when bounds are valid, flagged when they are stale."""

    def test_compact_live_unbounded_is_identity(self, rng):
        from gof_tpu.ops import binning as b_lib

        means, scales, rots, opac, shs, cam = scene(rng, n=64)
        from gof_tpu.ops import quadrics
        pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1)
        ntx, nty = b_lib.tile_grid(cam.width, cam.height)
        rects = b_lib.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty)
        b = b_lib.bin_gaussians(pre.depth, rects, ntx, nty, 2048)
        lim = jnp.full((ntx * nty,), b_lib.LIM_INF, jnp.int32)
        bc, truncated, ov, demand = b_lib.compact_live(b, lim, 2048, 64)
        assert not bool(ov)
        assert not bool(truncated.any())
        assert int(demand) == int(b.num_keys)
        np.testing.assert_array_equal(np.asarray(bc.bounds), np.asarray(b.bounds))
        nk = int(b.num_keys)
        np.testing.assert_array_equal(
            np.asarray(bc.slot_to_gaussian[:nk]),
            np.asarray(b.slot_to_gaussian[:nk]))

    def test_compact_live_prefixes(self, rng):
        from gof_tpu.ops import binning as b_lib

        means, scales, rots, opac, shs, cam = scene(rng, n=64)
        from gof_tpu.ops import quadrics
        pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1)
        ntx, nty = b_lib.tile_grid(cam.width, cam.height)
        rects = b_lib.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty)
        b = b_lib.bin_gaussians(pre.depth, rects, ntx, nty, 2048)
        ntiles = ntx * nty
        lim = jnp.asarray(rng.integers(0, 3, ntiles), jnp.int32)
        bc, truncated, ov, demand = b_lib.compact_live(b, lim, 2048, 64)
        sb, sl = np.asarray(b.bounds), np.asarray(b.slot_to_gaussian)
        cb, cl = np.asarray(bc.bounds), np.asarray(bc.slot_to_gaussian)
        limn = np.asarray(lim) * b_lib.CHUNK_SIZE
        for t in range(ntiles):
            seg = sl[sb[t]: sb[t + 1]]
            want = seg[: limn[t]]
            got = cl[cb[t]: cb[t + 1]]
            np.testing.assert_array_equal(want, got)
            assert bool(np.asarray(truncated)[t]) == (len(seg) > limn[t])

    def test_render_with_warm_bounds_is_bit_identical(self, rng):
        means, scales, rots, opac, shs, cam = scene(rng, n=48)
        bg = jnp.array([0.1, 0.2, 0.3])
        kw = dict(capacity=2048, backend="pallas", interpret=True)
        full = render_lib.render(cam, means, scales, rots, opac, shs, 0, 0.1,
                                 bg, **kw)
        lim = full.live_counts + 2
        out = render_lib.render(cam, means, scales, rots, opac, shs, 0, 0.1,
                                bg, live_limit_chunks=lim, live_capacity=2048,
                                **kw)
        assert not bool(out.live_bad.any())
        assert not bool(out.live_overflow)
        np.testing.assert_array_equal(np.asarray(full.image), np.asarray(out.image))

    def test_stale_bound_is_flagged(self, rng):
        means, scales, rots, opac, shs, cam = scene(rng, n=400)
        # translucent gaussians: tiles do NOT saturate, so a tight bound
        # must trip the truncated & unsaturated detector
        opac = opac * 0.2
        bg = jnp.array([0.1, 0.2, 0.3])
        kw = dict(capacity=4096, backend="pallas", interpret=True)
        full = render_lib.render(cam, means, scales, rots, opac, shs, 0, 0.1,
                                 bg, **kw)
        assert int(full.live_counts.max()) >= 2  # a tile with >= 2 chunks?
        lim = jnp.maximum(full.live_counts - 1, 0)
        out = render_lib.render(cam, means, scales, rots, opac, shs, 0, 0.1,
                                bg, live_limit_chunks=lim, live_capacity=4096,
                                **kw)
        assert bool(out.live_bad.any())
