"""Tests for the opacity-field integration and mesh extraction stack."""

import jax.numpy as jnp
import numpy as np
import pytest

from gof_tpu import cameras
from gof_tpu.mesh import extract, tetmesh
from gof_tpu.model import gaussians as gm
from gof_tpu.ops import binning, integrate, quadrics
from gof_tpu.ops import rasterize_pallas as rp
from gof_tpu.sh import rgb_to_sh_dc


def grid_tets(n=12, lo=-1.5, hi=1.5):
    """Regular grid tetrahedralized via Delaunay (host)."""
    from scipy.spatial import Delaunay

    xs = np.linspace(lo, hi, n)
    pts = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
    return pts.astype(np.float32), Delaunay(pts).simplices.astype(np.int32)


class TestMarchingTets:
    def test_sphere_level_set(self):
        pts, tets = grid_tets()
        r = 1.0
        sdf = np.linalg.norm(pts, axis=-1) - r  # >0 outside
        out = tetmesh.marching_tetrahedra(pts, tets, sdf, np.ones(len(pts), np.float32))
        assert len(out["faces"]) > 100
        # every crossing edge straddles the level set
        s = out["edge_sdf"]
        assert np.all(s[:, 0] * s[:, 1] <= 0)
        # midpoints lie near the sphere (within one edge length)
        mid = out["edge_points"].mean(axis=1)
        err = np.abs(np.linalg.norm(mid, axis=-1) - r)
        edge_len = np.linalg.norm(out["edge_points"][:, 0] - out["edge_points"][:, 1], -1)
        assert np.all(err <= edge_len)
        # faces reference valid edges
        assert out["faces"].max() < len(out["edge_points"])

    def test_device_path_matches_numpy(self):
        """The eager-jnp marching tets (sort-based edge dedup on device)
        must produce the SAME edge list and the same face set as the host
        numpy path (face row order may differ)."""
        pts, tets = grid_tets(n=8)
        sdf = (np.linalg.norm(pts - np.array([0.2, -0.1, 0.05]), axis=-1)
               - 0.9).astype(np.float32)
        scales = np.random.default_rng(0).uniform(
            0.5, 1.5, len(pts)).astype(np.float32)
        a = tetmesh._marching_tetrahedra_np(pts, tets, sdf, scales)
        b = tetmesh._marching_tetrahedra_device(pts, tets, sdf, scales)
        np.testing.assert_array_equal(a["edge_verts"], b["edge_verts"])
        np.testing.assert_array_equal(a["edge_points"], b["edge_points"])
        np.testing.assert_array_equal(a["edge_sdf"], b["edge_sdf"])
        np.testing.assert_array_equal(a["edge_scale"], b["edge_scale"])
        fa = {tuple(f) for f in a["faces"].tolist()}
        fb = {tuple(f) for f in b["faces"].tolist()}
        assert fa == fb
        assert len(a["faces"]) == len(b["faces"])

    def test_empty_and_full(self):
        pts, tets = grid_tets(n=6)
        out = tetmesh.marching_tetrahedra(pts, tets, np.ones(len(pts)), None)
        assert len(out["faces"]) == 0
        out = tetmesh.marching_tetrahedra(pts, tets, -np.ones(len(pts)), None)
        assert len(out["faces"]) == 0

    def test_binary_search_converges(self):
        """8 bisection steps on the sphere field shrink the interval 256x."""
        pts, tets = grid_tets()
        sdf_fn = lambda p: np.linalg.norm(p, axis=-1) - 1.0
        out = tetmesh.marching_tetrahedra(pts, tets, sdf_fn(pts), None)
        left = out["edge_points"][:, 0].copy()
        right = out["edge_points"][:, 1].copy()
        left_sdf = out["edge_sdf"][:, 0:1].copy()
        for _ in range(8):
            mid = (left + right) / 2
            mid_sdf = sdf_fn(mid)[:, None]
            ind_low = ((mid_sdf < 0) & (left_sdf < 0)) | ((mid_sdf > 0) & (left_sdf > 0))
            left_sdf = np.where(ind_low, mid_sdf, left_sdf)
            m = ind_low[:, 0]
            left[m] = mid[m]
            right[~m] = mid[~m]
        verts = (left + right) / 2
        err = np.abs(np.linalg.norm(verts, axis=-1) - 1.0)
        assert np.quantile(err, 0.99) < 2e-3


def gauss_scene(rng, n=10):
    z = rng.uniform(4, 6, n)
    x = rng.uniform(-0.8, 0.8, n)
    y = rng.uniform(-0.8, 0.8, n)
    means = jnp.asarray(np.stack([x, y, z], -1), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.4, 0.9, (n, 3)), jnp.float32)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    rots = jnp.asarray(q, jnp.float32)
    opac = jnp.asarray(rng.uniform(0.5, 0.95, n), jnp.float32)
    return means, scales, rots, opac


class TestIntegrate:
    @pytest.mark.slow
    def test_pallas_matches_dense(self, rng):
        means, scales, rots, opac = gauss_scene(rng)
        cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0), width=64, height=64)
        shs = jnp.zeros((10, 1, 3))
        pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1)
        ntx, nty = binning.tile_grid(64, 64)
        rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty)
        b = binning.bin_gaussians(pre.depth, rects, ntx, nty, capacity=512)
        op_eff = opac * jnp.where(pre.valid, pre.coef, 0.0)
        payload = rp.build_payload16(pre.rgb, op_eff, pre.v2g_M, pre.v2g_u0, b)

        qpts = jnp.asarray(rng.uniform(-1, 1, (200, 3)).astype(np.float32)
                           + np.array([0, 0, 5.0], np.float32))
        pb = integrate.bin_points(qpts, cam, ntx, nty, capacity=1024)
        T_pallas = integrate.integrate_transmittance_pallas(
            payload, b, pb, 200, interpret=True
        )
        T_dense = integrate.integrate_transmittance_dense(
            qpts, cam, op_eff, pre.v2g_M, pre.v2g_u0, pre.valid
        )
        np.testing.assert_allclose(np.asarray(T_pallas), np.asarray(T_dense),
                                   atol=1e-5, rtol=1e-4)

    def test_unprojected_points_get_T1(self, rng):
        means, scales, rots, opac = gauss_scene(rng)
        cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0), width=64, height=64)
        qpts = jnp.asarray(np.array([[0, 0, -5.0], [100, 100, 5.0]], np.float32))
        T = integrate.integrate_transmittance_dense(
            qpts, cam,
            opac, quadrics.view_to_gaussian(means, scales, rots, cam.world_view).M,
            quadrics.view_to_gaussian(means, scales, rots, cam.world_view).u0,
            jnp.ones(10, bool),
        )
        np.testing.assert_allclose(np.asarray(T), 1.0)

    def test_transmittance_monotone_along_ray(self, rng):
        """T decreases as the query point moves deeper along the same ray."""
        means, scales, rots, opac = gauss_scene(rng)
        cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0), width=64, height=64)
        v2g = quadrics.view_to_gaussian(means, scales, rots, cam.world_view)
        depths = np.linspace(1.0, 9.0, 30, dtype=np.float32)
        qpts = jnp.asarray(np.stack([0 * depths, 0 * depths, depths], -1))
        T = np.asarray(integrate.integrate_transmittance_dense(
            qpts, cam, opac, v2g.M, v2g.u0, jnp.ones(10, bool)))
        assert np.all(np.diff(T) <= 1e-6)


class TestExtractE2E:
    @pytest.mark.slow
    def test_mesh_from_known_gaussians(self, rng, tmp_path):
        """Extract a level-set mesh directly from a known Gaussian mixture;
        vertices must lie near the blobs and the field there must be ~0.5."""
        n = 8
        means = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.4)
        scales = jnp.asarray(np.full((n, 3), 0.25, np.float32))
        q = rng.normal(size=(n, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        rots = jnp.asarray(q, jnp.float32)
        opac = jnp.full((n,), 0.95)

        params = gm.GaussianParams(
            xyz=means,
            features_dc=rgb_to_sh_dc(jnp.full((n, 3), 0.5))[:, None, :],
            features_rest=jnp.zeros((n, 0, 3)),
            scaling=jnp.log(scales),
            rotation=rots,
            opacity=gm.inverse_sigmoid(opac),
        )
        z = jnp.zeros((n,))
        state = gm.GaussianState(
            active=jnp.ones((n,), bool), filter_3d=z + 1e-4,
            max_radii2d=z, grad_accum=z, grad_abs_accum=z, denom=z,
        )
        cams = [
            cameras.look_at_camera(
                eye=(3.0 * np.sin(t), 1.0, 3.0 * np.cos(t)), target=(0, 0, 0),
                width=64, height=64, uid=i,
            )
            for i, t in enumerate(np.linspace(0, 2 * np.pi, 6, endpoint=False))
        ]
        import jax.numpy as jnp2

        cam_meta = (
            jnp2.stack([c.world_view for c in cams]),
            jnp2.stack([c.focal_x for c in cams]),
            jnp2.stack([c.focal_y for c in cams]),
            jnp2.full((len(cams),), 64.0),
            jnp2.full((len(cams),), 64.0),
        )
        out = extract.extract_level_set_mesh(
            params, state, cams, cam_meta, str(tmp_path / "fusion"),
            sh_degree=0, kernel_size=0.1, key_capacity=2048,
            n_binary_steps=4, interpret=True, quiet=True,
        )
        from gof_tpu.utils import ply

        verts, faces = ply.read_ply(out)
        v = np.stack([verts["x"], verts["y"], verts["z"]], -1)
        assert len(v) > 50
        assert faces is not None and len(faces) > 50
        # vertices near the mixture: within 4 sigma of some center
        d = np.linalg.norm(v[:, None, :] - np.asarray(means)[None], axis=-1)
        assert np.quantile(d.min(axis=1), 0.95) < 4 * 0.25
        # the field at the final vertices is close to the 0.5 level set
        ev = extract.FieldEvaluator(params, state, cams, 0, 0.1, 2048, interpret=True)
        alpha_v = ev.alpha(v)
        assert np.quantile(np.abs(alpha_v - 0.5), 0.9) < 0.15

    @pytest.mark.slow
    def test_texture_mesh_vertex_colors(self, rng, tmp_path):
        """--texture_mesh: a pure-red mixture must yield red-dominant vertex
        colors sampled from the rendered views (forward.cu:1182-1217,
        extract_mesh.py:106-111)."""
        n = 6
        means = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.3)
        scales = jnp.asarray(np.full((n, 3), 0.3, np.float32))
        q = rng.normal(size=(n, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        params = gm.GaussianParams(
            xyz=means,
            features_dc=rgb_to_sh_dc(
                jnp.asarray(np.tile([0.9, 0.05, 0.05], (n, 1)), jnp.float32)
            )[:, None, :],
            features_rest=jnp.zeros((n, 0, 3)),
            scaling=jnp.log(scales),
            rotation=jnp.asarray(q, jnp.float32),
            opacity=gm.inverse_sigmoid(jnp.full((n,), 0.95)),
        )
        z = jnp.zeros((n,))
        state = gm.GaussianState(
            active=jnp.ones((n,), bool), filter_3d=z + 1e-4,
            max_radii2d=z, grad_accum=z, grad_abs_accum=z, denom=z,
        )
        cams = [
            cameras.look_at_camera(
                eye=(2.5 * np.sin(t), 0.6, 2.5 * np.cos(t)), target=(0, 0, 0),
                width=48, height=48, uid=i,
            )
            for i, t in enumerate(np.linspace(0, 2 * np.pi, 4, endpoint=False))
        ]
        cam_meta = (
            jnp.stack([c.world_view for c in cams]),
            jnp.stack([c.focal_x for c in cams]),
            jnp.stack([c.focal_y for c in cams]),
            jnp.full((len(cams),), 48.0),
            jnp.full((len(cams),), 48.0),
        )
        out = extract.extract_level_set_mesh(
            params, state, cams, cam_meta, str(tmp_path / "fusion"),
            sh_degree=0, kernel_size=0.1, key_capacity=2048,
            n_binary_steps=3, interpret=True, quiet=True, texture_mesh=True,
        )
        from gof_tpu.utils import ply

        verts, faces = ply.read_ply(out)
        assert {"red", "green", "blue"} <= set(verts)
        r = verts["red"].astype(np.float32)
        g = verts["green"].astype(np.float32)
        b = verts["blue"].astype(np.float32)
        assert len(r) > 20
        # red strongly dominates on the surface (bg is black, blobs red)
        frac_red = np.mean((r > g + 40) & (r > b + 40))
        assert frac_red > 0.7, (frac_red, r.mean(), g.mean(), b.mean())
