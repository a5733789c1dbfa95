"""Tests for the scatter-free tile binning and the tiled XLA renderer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gof_tpu import cameras
from gof_tpu.ops import binning, oracle, quadrics, tiled_ref
from gof_tpu.ops.binning import CHUNK_SIZE
from gof_tpu.sh import rgb_to_sh_dc


def make_scene(rng, n=40, width=96, height=64, scale=0.15, z_span=(3.0, 8.0)):
    """Random Gaussians inside the frustum of a simple camera."""
    z = rng.uniform(*z_span, size=n)
    x = rng.uniform(-1.0, 1.0, size=n) * z * 0.2
    y = rng.uniform(-1.0, 1.0, size=n) * z * 0.2
    means = jnp.asarray(np.stack([x, y, z], -1), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.5, 1.5, size=(n, 3)) * scale, jnp.float32)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    rots = jnp.asarray(q, jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.95, size=n), jnp.float32)
    colors = jnp.asarray(rng.uniform(0.05, 0.95, size=(n, 3)), jnp.float32)
    shs = rgb_to_sh_dc(colors)[:, None, :]
    cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0), width=width, height=height)
    return means, scales, rots, opac, shs, cam


def brute_force_bins(pre, ntx, nty):
    """Reference per-tile (gaussian, depth) lists in numpy."""
    rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty)
    x0, y0, w, h = (np.asarray(v) for v in rects)
    depth = np.asarray(pre.depth)
    per_tile = {t: [] for t in range(ntx * nty)}
    for g in range(len(depth)):
        for dy in range(h[g]):
            for dx in range(w[g]):
                per_tile[(y0[g] + dy) * ntx + (x0[g] + dx)].append(g)
    for t in per_tile:
        per_tile[t].sort(key=lambda g: (depth[g], 0))
    return rects, per_tile


def segments(b):
    bounds = np.asarray(b.bounds)
    return bounds[:-1], bounds[1:]


class TestBinning:
    @pytest.mark.slow
    def test_matches_brute_force(self, rng):
        means, scales, rots, opac, shs, cam = make_scene(rng, n=60)
        pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1)
        ntx, nty = binning.tile_grid(cam.width, cam.height)
        rects, per_tile = brute_force_bins(pre, ntx, nty)
        b = binning.bin_gaussians(pre.depth, rects, ntx, nty, capacity=4096)
        assert not bool(b.overflow)

        s2g = np.asarray(b.slot_to_gaussian)
        depth = np.asarray(pre.depth)
        starts, ends = segments(b)
        for t in range(ntx * nty):
            got = list(s2g[starts[t] : ends[t]])
            # same multiset of gaussians, sorted by depth (ties in any order)
            assert sorted(got) == sorted(per_tile[t]), f"tile {t}"
            d = depth[got]
            assert np.all(d[1:] >= d[:-1]), f"tile {t} not depth-sorted"

    def test_segments_partition_capacity(self, rng):
        means, scales, rots, opac, shs, cam = make_scene(rng, n=30)
        pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1)
        ntx, nty = binning.tile_grid(cam.width, cam.height)
        rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty)
        b = binning.bin_gaussians(pre.depth, rects, ntx, nty, capacity=4096)
        starts, ends = segments(b)
        # contiguous, increasing, and the union covers exactly the real keys
        assert starts[0] == 0
        assert np.all(ends >= starts)
        assert np.all(starts[1:] == ends[:-1])
        assert ends[-1] == int(b.num_keys)
        # slots outside every segment are sentinels
        P = means.shape[0]
        s2g = np.asarray(b.slot_to_gaussian)
        assert np.all(s2g[ends[-1]:] == P)
        assert np.all(s2g[: ends[-1]] < P)

    def test_key_counts(self, rng):
        means, scales, rots, opac, shs, cam = make_scene(rng, n=50)
        pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1)
        ntx, nty = binning.tile_grid(cam.width, cam.height)
        rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty)
        b = binning.bin_gaussians(pre.depth, rects, ntx, nty, capacity=4096)
        counts = np.asarray(rects.w) * np.asarray(rects.h)
        assert int(b.num_keys) == counts.sum()
        # class-padded demand: per-gaussian counts rounded up the size ladder
        sizes = np.asarray(binning.class_sizes(ntx * nty))
        padded = sizes[np.searchsorted(sizes, counts)]
        assert int(b.num_slots) == padded[counts > 0].sum()
        assert int(b.num_slots) >= int(b.num_keys)
        # each gaussian appears exactly counts[g] times in the sorted list
        s2g = np.asarray(b.slot_to_gaussian)
        P = means.shape[0]
        got_counts = np.bincount(s2g[s2g < P], minlength=P)
        np.testing.assert_array_equal(got_counts, counts)

    def test_tie_order_is_gaussian_id(self, rng):
        """Bitwise-equal depths in one tile (post-clone state) must blend in
        original gaussian-id order — cub's stable radix tie behavior
        (rasterizer_impl.cu:355-363), reproduced here by the explicit id
        sort key."""
        n = 64
        ntx, nty = 3, 3
        mean2d = jnp.asarray(np.tile(rng.uniform(10, 80, (8, 2)), (8, 1)), jnp.float32)
        radius = jnp.full((n,), 24.0)
        depth = jnp.asarray(np.tile([3.0, 3.0, 5.0, 5.0], 16), jnp.float32)
        rects = binning.gaussian_rects(mean2d, radius, jnp.ones(n, bool), ntx, nty)
        b = binning.bin_gaussians(depth, rects, ntx, nty, capacity=2048)
        assert not bool(b.overflow)
        s2g = np.asarray(b.slot_to_gaussian)
        d = np.asarray(depth)
        starts = np.asarray(b.bounds[:-1])
        ends = np.asarray(b.bounds[1:])
        for t in range(ntx * nty):
            seg = s2g[starts[t]:ends[t]]
            dt = d[seg]
            assert np.all(dt[1:] >= dt[:-1])
            for k in range(1, len(seg)):  # equal depth -> ascending id
                if dt[k] == dt[k - 1]:
                    assert seg[k] > seg[k - 1]

    def test_giant_rect_class(self, rng):
        """Counts past EXACT_MAX land in power-of-two classes; the padded
        slots must stay dead (sentinel) and the real keys complete."""
        n = 5
        ntx, nty = 16, 16
        mean2d = jnp.asarray(rng.uniform(100, 400, (n, 2)), jnp.float32)
        radius = jnp.asarray([400.0, 300.0, 8.0, 60.0, 200.0], jnp.float32)
        depth = jnp.asarray(rng.uniform(1, 10, n), jnp.float32)
        rects = binning.gaussian_rects(mean2d, radius, jnp.ones(n, bool), ntx, nty)
        counts = np.asarray(rects.w) * np.asarray(rects.h)
        assert counts.max() > binning.EXACT_MAX  # exercises the pow2 ladder
        b = binning.bin_gaussians(depth, rects, ntx, nty, capacity=4096)
        assert not bool(b.overflow)
        s2g = np.asarray(b.slot_to_gaussian)
        got = np.bincount(s2g[s2g < n], minlength=n)
        np.testing.assert_array_equal(got, counts)
        assert int(b.bounds[-1]) == counts.sum()

    def test_circle_cull_is_image_lossless(self, rng):
        """Dropping bbox-corner tiles outside the alpha circle must not
        change the rendered image (those contributions are below the 1/255
        cutoff and blend to exactly zero), while shrinking the key list."""
        means, scales, rots, opac, shs, cam = make_scene(rng, n=50, scale=0.4)
        pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1)
        ntx, nty = binning.tile_grid(cam.width, cam.height)
        rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty)
        b0 = binning.bin_gaussians(pre.depth, rects, ntx, nty, capacity=8192)
        b1 = binning.bin_gaussians(pre.depth, rects, ntx, nty, capacity=8192,
                                   mean2d=pre.mean2d, radius=pre.radius)
        assert int(b1.num_keys) <= int(b0.num_keys)
        assert int(b1.num_slots) == int(b0.num_slots)  # demand unchanged

        def img(b):
            op_eff = opac * jnp.where(pre.valid, pre.coef, 0.0)
            payload = tiled_ref.build_payload(pre.rgb, op_eff, pre.v2g_M,
                                              pre.v2g_u0, b)
            seg = np.asarray(b.bounds[1:]) - np.asarray(b.bounds[:-1])
            out = tiled_ref.render_tiles_xla(
                payload, b, ntx, nty, cam.width, cam.height,
                cam.focal_x, cam.focal_y, jnp.zeros(3),
                max(int(seg.max()), 1))
            return np.asarray(tiled_ref.assemble_image(
                out, ntx, nty, cam.width, cam.height))

        # Culled keys sit below the 1/255 2D-splat cutoff; their 3D ray
        # alpha exceeds it only by the EWA affine-approximation error, so
        # rgb/alpha agree to well under one 8-bit level. The median-depth
        # channel (6) is a discrete selection: on near-background pixels a
        # sub-cutoff contributor can be the depth median, so its deviation
        # is bounded in AREA, not value (the same approximation class as the
        # reference's own 3-sigma rect cutoff, forward.cu:363-371).
        a, c = img(b1), img(b0)
        rgba = np.concatenate([a[:3], a[7:8]])
        rgbc = np.concatenate([c[:3], c[7:8]])
        assert np.abs(rgba - rgbc).max() < 2e-3
        assert (np.abs(a[6] - c[6]) > 1e-3).mean() < 0.01  # <1% of pixels

    def test_reduce_per_gaussian(self, rng):
        means, scales, rots, opac, shs, cam = make_scene(rng, n=50)
        pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1)
        ntx, nty = binning.tile_grid(cam.width, cam.height)
        rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty)
        b = binning.bin_gaussians(pre.depth, rects, ntx, nty, capacity=4096)
        cap = b.slot_to_gaussian.shape[0]
        dslot = jnp.asarray(rng.normal(size=(cap, 3)), jnp.float32)
        got = np.asarray(binning.reduce_per_gaussian(dslot, b, means.shape[0]))
        # numpy reference: sum dslot rows by gaussian id over valid slots
        want = np.zeros_like(got)
        s2g = np.asarray(b.slot_to_gaussian)
        P = means.shape[0]
        d = np.asarray(dslot)
        for s in range(cap):
            if s2g[s] < P:
                want[s2g[s]] += d[s]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_overflow_flag(self, rng):
        means, scales, rots, opac, shs, cam = make_scene(rng, n=60)
        pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1)
        ntx, nty = binning.tile_grid(cam.width, cam.height)
        rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty)
        b = binning.bin_gaussians(pre.depth, rects, ntx, nty, capacity=128)
        assert bool(b.overflow)
        # segments never extend past the capacity
        assert int(b.bounds[-1]) <= 128

    @pytest.mark.slow
    def test_jit_clean(self, rng):
        """bin_gaussians must be jittable with static grid/capacity."""
        means, scales, rots, opac, shs, cam = make_scene(rng, n=20)
        pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1)
        ntx, nty = binning.tile_grid(cam.width, cam.height)
        rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty)
        f = jax.jit(binning.bin_gaussians, static_argnums=(2, 3, 4))
        b = f(pre.depth, rects, ntx, nty, 1024)
        assert b.slot_to_gaussian.shape[0] == 1024


class TestUnboundedRects:
    def test_giant_gaussian_covers_grid(self, rng):
        """A near-camera Gaussian's rect is unbounded (forward.cu:363-371):
        it must bin into every tile it truly covers."""
        means = jnp.asarray([[0.0, 0.0, 2.0]], jnp.float32)
        scales = jnp.asarray([[2.0, 2.0, 2.0]], jnp.float32)
        rots = jnp.asarray([[1.0, 0.0, 0.0, 0.0]], jnp.float32)
        shs = rgb_to_sh_dc(jnp.asarray([[0.8, 0.2, 0.2]], jnp.float32))[:, None, :]
        cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0), width=512, height=256)
        pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1)
        ntx, nty = binning.tile_grid(cam.width, cam.height)
        rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty)
        assert int(rects.w[0]) == ntx and int(rects.h[0]) == nty
        b = binning.bin_gaussians(pre.depth, rects, ntx, nty, capacity=256)
        assert int(b.num_keys) == ntx * nty


class TestAlignedItemBins:
    def test_one_tile_per_item(self, rng):
        ntiles = 7
        tile = jnp.asarray(rng.integers(0, ntiles + 1, 50), jnp.int32)  # incl invalid
        b = binning.bin_items_aligned(tile, ntiles, capacity=64, block=8)
        s2i = np.asarray(b.slot_to_item)
        start = np.asarray(b.tile_start)
        blocks = np.asarray(b.tile_blocks)
        t_np = np.asarray(tile)
        for t in range(ntiles):
            seg = s2i[start[t] : start[t] + blocks[t] * 8]
            got = sorted(i for i in seg if i < 50)
            want = sorted(np.nonzero(t_np == t)[0].tolist())
            assert got == want, f"tile {t}"
        assert np.all(start % 8 == 0)


def full_cover_scene(rng, n=12, width=96, height=64):
    """Scene whose Gaussians' 3-sigma rects cover the whole image, so the
    tiled renderer is exactly the oracle (no culling discrepancy)."""
    return make_scene(rng, n=n, width=width, height=height, scale=0.9, z_span=(4.0, 7.0))


def run_tiled(means, scales, rots, opac, shs, cam, kernel_size, bg):
    pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, kernel_size)
    ntx, nty = binning.tile_grid(cam.width, cam.height)
    rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty)
    b = binning.bin_gaussians(pre.depth, rects, ntx, nty, capacity=8192)
    op_eff = opac * jnp.where(pre.valid, jax.lax.stop_gradient(pre.coef), 0.0)
    payload = tiled_ref.build_payload(pre.rgb, op_eff, pre.v2g_M, pre.v2g_u0, b)
    seg_len = np.asarray(b.bounds[1:]) - np.asarray(b.bounds[:-1])
    max_len = max(int(seg_len.max()), 1)
    out = tiled_ref.render_tiles_xla(
        payload, b, ntx, nty, cam.width, cam.height, cam.focal_x, cam.focal_y, bg, max_len
    )
    return tiled_ref.assemble_image(out, ntx, nty, cam.width, cam.height), b


class TestTiledRenderer:
    @pytest.mark.slow
    def test_matches_oracle_exactly(self, rng):
        means, scales, rots, opac, shs, cam = full_cover_scene(rng)
        bg = jnp.array([0.2, 0.3, 0.4])
        img_tiled, b = run_tiled(means, scales, rots, opac, shs, cam, 0.1, bg)
        ref = oracle.render_oracle(means, scales, rots, opac, shs, 0, cam, 0.1, bg)
        np.testing.assert_allclose(
            np.asarray(img_tiled[:9]), np.asarray(ref.image), rtol=2e-4, atol=2e-5
        )
        # T_final channel matches too
        np.testing.assert_allclose(
            np.asarray(img_tiled[tiled_ref.CH_TFINAL]),
            np.asarray(ref.transmittance),
            rtol=2e-4, atol=2e-6,
        )

    def test_culled_close_to_oracle(self, rng):
        """With small Gaussians, tile culling only drops sub-1% alpha tails
        (same approximation the reference makes at its 3-sigma rect)."""
        means, scales, rots, opac, shs, cam = make_scene(rng, n=60, scale=0.1)
        bg = jnp.zeros(3)
        img_tiled, _ = run_tiled(means, scales, rots, opac, shs, cam, 0.1, bg)
        ref = oracle.render_oracle(means, scales, rots, opac, shs, 0, cam, 0.1, bg)
        diff = np.abs(np.asarray(img_tiled[:3]) - np.asarray(ref.image[:3]))
        assert diff.max() < 0.05
        assert diff.mean() < 2e-3


class TestClassGatherKernel:
    """The windowed indicator-matmul gather (class_gather.py) must be
    bit-identical to the XLA gather it replaces, including float bit
    patterns riding int32 columns."""

    def _random_monotone_gidx(self, rng, cap, P):
        steps = (rng.random(cap) < min(1.0, P / cap)).astype(np.int32)
        steps[0] = 0
        return jnp.asarray(np.minimum(np.cumsum(steps), P - 1), jnp.int32)

    @pytest.mark.parametrize("cap,P", [(2048, 700), (5000, 4999), (1024, 1)])
    def test_interpret_matches_xla(self, rng, cap, P):
        from gof_tpu.ops import class_gather

        gidx = self._random_monotone_gidx(rng, cap, P)
        cols = [
            (jnp.asarray(rng.integers(-2**31, 2**31, P, dtype=np.int64)
                         .astype(np.int32)), 4),
            (jnp.asarray(rng.integers(0, 2**16, P).astype(np.int32)), 2),
            (jnp.asarray(rng.integers(0, 2**24, P).astype(np.int32)), 3),
            (jax.lax.bitcast_convert_type(
                jnp.asarray(rng.standard_normal(P), jnp.float32), jnp.int32), 4),
        ]
        want = class_gather.expand(cols, gidx, P, force="xla")
        got = class_gather.expand(cols, gidx, P, force="interpret")
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(w), np.asarray(g))

    def test_binning_with_interpret_kernel_matches(self, rng):
        """Full bin_gaussians parity: interpret-mode kernel vs XLA gather."""
        means, scales, rots, opac, shs, cam = make_scene(rng, n=120)
        pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1)
        ntx, nty = binning.tile_grid(cam.width, cam.height)
        rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid,
                                       ntx, nty, radius_xy=pre.radius_xy)
        kw = dict(mean2d=pre.mean2d, radius=pre.radius)
        b_x = binning.bin_gaussians(pre.depth, rects, ntx, nty, 4096,
                                    gather_force="xla", **kw)
        b_k = binning.bin_gaussians(pre.depth, rects, ntx, nty, 4096,
                                    gather_force="interpret", **kw)
        np.testing.assert_array_equal(np.asarray(b_x.slot_to_gaussian),
                                      np.asarray(b_k.slot_to_gaussian))
        np.testing.assert_array_equal(np.asarray(b_x.bounds),
                                      np.asarray(b_k.bounds))
        assert int(b_x.num_keys) == int(b_k.num_keys)


class TestPayloadCarry:
    """Sort-carried payload (Binning.payload) vs the post-sort row gather."""

    def test_payload_matches_gather(self, rng):
        means, scales, rots, opac, shs, cam = make_scene(rng, n=48)
        pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1)
        ntx, nty = binning.tile_grid(cam.width, cam.height)
        rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid,
                                       ntx, nty, radius_xy=pre.radius_xy)
        P = means.shape[0]
        cols = [jnp.asarray(rng.normal(size=P) * 10.0 ** rng.uniform(-6, 6, P),
                            jnp.float32) for _ in range(5)]
        b = binning.bin_gaussians(pre.depth, rects, ntx, nty, capacity=4096,
                                  mean2d=pre.mean2d, radius=pre.radius,
                                  payload_cols=cols, gather_force="xla")
        assert b.payload.shape == (5, 4096)
        pay = jax.lax.bitcast_convert_type(b.payload, jnp.float32)
        flat = jnp.stack(cols, axis=1)
        flat = jnp.concatenate([flat, jnp.zeros((1, 5), jnp.float32)], axis=0)
        want = flat[b.slot_to_gaussian].T
        nk = int(b.num_keys)
        # live slots must match the gather BIT-EXACTLY (f32 bits ride int32)
        np.testing.assert_array_equal(np.asarray(pay[:, :nk]),
                                      np.asarray(want[:, :nk]))

    def test_payload_survives_compact_live(self, rng):
        means, scales, rots, opac, shs, cam = make_scene(rng, n=48)
        pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1)
        ntx, nty = binning.tile_grid(cam.width, cam.height)
        rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid,
                                       ntx, nty, radius_xy=pre.radius_xy)
        P = means.shape[0]
        cols = [jnp.asarray(rng.normal(size=P), jnp.float32)
                for _ in range(3)]
        b = binning.bin_gaussians(pre.depth, rects, ntx, nty, capacity=4096,
                                  payload_cols=cols, gather_force="xla")
        ntiles = ntx * nty
        lim = jnp.full((ntiles,), binning.LIM_INF, jnp.int32)
        bc, truncated, ovf, demand = binning.compact_live(b, lim, 4096, P)
        assert not bool(ovf)
        # unbounded limits: compaction is the identity on live slots,
        # payload included
        pay = jax.lax.bitcast_convert_type(bc.payload, jnp.float32)
        flat = jnp.stack(cols, axis=1)
        flat = jnp.concatenate([flat, jnp.zeros((1, 3), jnp.float32)], axis=0)
        want = flat[bc.slot_to_gaussian].T
        nk = int(bc.num_keys)
        np.testing.assert_array_equal(np.asarray(pay[:, :nk]),
                                      np.asarray(want[:, :nk]))
