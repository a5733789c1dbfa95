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

    def test_dup_offsets(self, rng):
        means, scales, rots, opac, shs, cam = make_scene(rng, n=50)
        pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1)
        ntx, nty = binning.tile_grid(cam.width, cam.height)
        rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty)
        b = binning.bin_gaussians(pre.depth, rects, ntx, nty, capacity=4096)
        off = np.asarray(b.dup_offsets)
        counts = np.asarray(rects.w) * np.asarray(rects.h)
        np.testing.assert_array_equal(np.diff(off), counts)
        assert off[-1] == int(b.num_keys)
        # each gaussian appears exactly counts[g] times in the sorted list
        s2g = np.asarray(b.slot_to_gaussian)
        P = means.shape[0]
        got_counts = np.bincount(s2g[s2g < P], minlength=P)
        np.testing.assert_array_equal(got_counts, counts)

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


class TestExpandKernel:
    """The sliding-window Pallas expansion (ops/expand.py) must reproduce
    the XLA scatter+cumsum+gather chain bit-for-bit (interpret mode)."""

    def _compare(self, depth, rects, ntx, nty, capacity):
        a = binning.bin_gaussians(depth, rects, ntx, nty, capacity,
                                  use_expand_kernel=False)
        b = binning.bin_gaussians(depth, rects, ntx, nty, capacity,
                                  use_expand_kernel=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(a.num_keys), np.asarray(b.num_keys))
        np.testing.assert_array_equal(np.asarray(a.num_slots), np.asarray(b.num_slots))
        np.testing.assert_array_equal(np.asarray(a.overflow), np.asarray(b.overflow))
        np.testing.assert_array_equal(np.asarray(a.bounds), np.asarray(b.bounds))
        np.testing.assert_array_equal(
            np.asarray(a.slot_to_gaussian), np.asarray(b.slot_to_gaussian))

    def test_random_scene_matches_xla(self, rng):
        n = 700
        ntx, nty = 6, 5
        mean2d = jnp.asarray(rng.uniform(-20, 200, (n, 2)), jnp.float32)
        radius = jnp.asarray(rng.uniform(1, 40, n), jnp.float32)
        valid = jnp.asarray(rng.random(n) > 0.15)
        depth = jnp.asarray(rng.uniform(0.5, 30, n), jnp.float32)
        rects = binning.gaussian_rects(mean2d, radius, valid, ntx, nty)
        self._compare(depth, rects, ntx, nty, 8192)

    def test_overflow_and_partial_drop(self, rng):
        """capacity inside the key list: surplus keys of the highest-offset
        gaussians drop identically in both paths."""
        n = 300
        ntx, nty = 8, 8
        mean2d = jnp.asarray(rng.uniform(0, 250, (n, 2)), jnp.float32)
        radius = jnp.asarray(rng.uniform(10, 80, n), jnp.float32)
        valid = jnp.ones(n, bool)
        depth = jnp.asarray(rng.uniform(0.5, 30, n), jnp.float32)
        rects = binning.gaussian_rects(mean2d, radius, valid, ntx, nty)
        self._compare(depth, rects, ntx, nty, 1024)  # far under demand

    def test_empty_and_single(self, rng):
        ntx, nty = 4, 4
        depth = jnp.asarray([5.0, 7.0], jnp.float32)
        mean2d = jnp.asarray([[40.0, 40.0], [90.0, 70.0]], jnp.float32)
        # nothing valid
        rects0 = binning.gaussian_rects(mean2d, jnp.asarray([5.0, 5.0]),
                                        jnp.zeros(2, bool), ntx, nty)
        self._compare(depth, rects0, ntx, nty, 256)
        # one valid gaussian covering several tiles
        rects1 = binning.gaussian_rects(mean2d, jnp.asarray([50.0, 0.0]),
                                        jnp.asarray([True, False]), ntx, nty)
        self._compare(depth, rects1, ntx, nty, 256)

    def test_depth_tie_order_matches(self, rng):
        """Bitwise-equal depths in one tile (post-clone state): stable tie
        order must match the XLA path."""
        n = 64
        ntx, nty = 3, 3
        mean2d = jnp.asarray(np.tile(rng.uniform(10, 80, (8, 2)), (8, 1)), jnp.float32)
        radius = jnp.full((n,), 24.0)
        depth = jnp.asarray(np.tile([3.0, 3.0, 5.0, 5.0], 16), jnp.float32)
        rects = binning.gaussian_rects(mean2d, radius, jnp.ones(n, bool), ntx, nty)
        self._compare(depth, rects, ntx, nty, 2048)

    def test_window_slide_stress(self, rng):
        """Many tiny-count gaussians force repeated window slides (> 2048
        gaussians per 1024-slot span)."""
        n = 6000
        ntx, nty = 10, 8
        mean2d = jnp.asarray(rng.uniform(0, 300, (n, 2)), jnp.float32)
        radius = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)  # ~1 tile
        valid = jnp.asarray(rng.random(n) > 0.5)  # half empty -> id jumps
        depth = jnp.asarray(rng.uniform(0.5, 30, n), jnp.float32)
        rects = binning.gaussian_rects(mean2d, radius, valid, ntx, nty)
        self._compare(depth, rects, ntx, nty, 8192)
