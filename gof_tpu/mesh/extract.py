"""Level-set mesh extraction: marching tetrahedra + binary search.

Replaces extract_mesh.py + gaussian_model.get_tetra_points (:432-463) +
tetra-triangulation (N10; CGAL Delaunay -> scipy Qhull on the host, cells
cached to disk as in the reference's cells.pt, extract_mesh.py:44-53).

Pipeline (marching_tetrahedra_with_binary_search, extract_mesh.py:37-126):
 1. tetra points = per-Gaussian oriented bbox corners at 3x the filtered
    scale (x2 box) + centers, frustum-masked over the training views
 2. Delaunay tetrahedralization (host)
 3. alpha(x) = 1 - min over views of alpha_integrated(x) ... where
    alpha_integrated = 1 - T: equivalently field = min over views of
    (1 - T_view); sdf = field - 0.5
 4. marching tets on the crossing edges
 5. 8 binary-search steps re-evaluating the field at interval midpoints
 6. optional face filter: drop faces whose edge interval is longer than the
    sum of the endpoint Gaussian scales
"""

from __future__ import annotations

import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .. import cameras as cameras_lib
from ..model import gaussians as gm
from ..ops import binning, integrate, quadrics
from ..ops import rasterize_pallas as rp
from ..transforms import quat_to_rot
from ..utils import ply
from . import tetmesh

# the eight corners of the reference's trimesh box scaled x2: (+-1)^3
_BOX = np.array(
    [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)], np.float32
)


def frustum_mask(points, world_views, focals_x, focals_y, widths, heights,
                 near: float = 0.02, far: float = 1e6):
    """Visible in ANY view: depth in [near, far], pixel in [0, W-1]x[0, H-1]
    (get_frustum_mask, gaussian_model.py:30-72)."""
    pv = jnp.einsum("nij,pj->npi", world_views[:, :3, :3], points) + world_views[:, None, :3, 3]
    z = pv[..., 2]
    zc = jnp.maximum(z, 1e-6)
    u = pv[..., 0] / zc * focals_x[:, None] + widths[:, None] / 2.0
    v = pv[..., 1] / zc * focals_y[:, None] + heights[:, None] / 2.0
    ok = (
        (z >= near) & (z <= far)
        & (u >= 0) & (u <= widths[:, None] - 1)
        & (v >= 0) & (v <= heights[:, None] - 1)
    )
    return jnp.any(ok, axis=0)


def get_tetra_points(params: gm.GaussianParams, state: gm.GaussianState,
                     cam_meta, near: float = 0.02, far: float = 1e6):
    """Gaussian-aligned tetrahedralization points + per-point scale
    (get_tetra_points, gaussian_model.py:432-463)."""
    active = np.asarray(state.active)
    idx = np.nonzero(active)[0]
    xyz = jnp.asarray(np.asarray(params.xyz)[idx])
    rot = jnp.asarray(np.asarray(params.rotation)[idx])
    scale = gm.filtered_scaling(
        gm.GaussianParams(
            xyz=xyz, features_dc=None, features_rest=None,
            scaling=jnp.asarray(np.asarray(params.scaling)[idx]),
            rotation=rot, opacity=None,
        ),
        jnp.asarray(np.asarray(state.filter_3d)[idx]),
    ) * 3.0

    R = quat_to_rot(rot)  # [P, 3, 3]
    # corner = xyz + R @ (box_corner * scale)
    corners = xyz[:, None, :] + jnp.einsum(
        "pij,pcj->pci", R, jnp.asarray(_BOX)[None, :, :] * scale[:, None, :]
    )
    pts = jnp.concatenate([corners.reshape(-1, 3), xyz], axis=0)
    smax = jnp.max(scale, axis=-1)
    pscale = jnp.concatenate([jnp.repeat(smax, 8), smax], axis=0)

    mask = frustum_mask(pts, *cam_meta, near=near, far=far)
    mask_np = np.asarray(mask)
    return np.asarray(pts)[mask_np], np.asarray(pscale)[mask_np]


def delaunay(points: np.ndarray, cache_path: str | None = None) -> np.ndarray:
    """Host Delaunay tetrahedralization (Qhull), cached like cells.pt.

    The cache records the point count it was built for and is ignored on
    mismatch (a stale cells.npy from an earlier run of a different model
    would otherwise index out of bounds).
    """
    if cache_path and os.path.exists(cache_path):
        cached = np.load(cache_path, allow_pickle=False)
        n_cached = int(cached[0, 0]) if cached.shape[0] > 0 else -1
        if n_cached == len(points):
            return cached[1:]
    from scipy.spatial import Delaunay

    cells = Delaunay(points.astype(np.float64)).simplices.astype(np.int32)
    if cache_path:
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        header = np.full((1, 4), len(points), dtype=np.int32)
        np.save(cache_path, np.concatenate([header, cells], axis=0))
    return cells


class FieldEvaluator:
    """min-over-views opacity field, jitted per (n_points, view size).

    mesh: optional jax.sharding.Mesh — the query points (embarrassingly
    parallel N axis) are sharded across its devices with shard_map while the
    model stays replicated; each device runs the full binning + integrate
    kernel on its slice (`extract_mesh --shard N`).
    """

    def __init__(self, params, state, cameras: List[cameras_lib.Camera],
                 sh_degree: int, kernel_size: float, key_capacity: int,
                 interpret: bool = False, mesh=None, bg=None):
        self.cameras = cameras
        self.interpret = interpret
        self.key_capacity = key_capacity
        self.mesh = mesh
        self.sh_degree = sh_degree
        self.bg = jnp.zeros(3) if bg is None else jnp.asarray(bg, jnp.float32)
        g = params
        scales_f = gm.filtered_scaling(g, state.filter_3d)
        opac_f = gm.filtered_opacity(g, state.filter_3d)
        self.model = dict(
            xyz=g.xyz, scales=scales_f, rot=g.rotation, op=opac_f,
            active=state.active, shs=gm.get_features(g),
        )
        self.kernel_size = kernel_size
        self._jit_cache = {}

    def _view_fn(self, n_points: int, camera):
        key = (n_points, camera.width, camera.height)
        if key not in self._jit_cache:
            ntx, nty = binning.tile_grid(camera.width, camera.height)
            interpret = self.interpret
            kcap = self.key_capacity

            def body(points, xyz, scales, rot, op, active, camera):
                # points.shape[0] is the LOCAL count under shard_map
                pcap = max(1 << int(np.ceil(np.log2(
                    max(points.shape[0], integrate.PBLOCK)))), integrate.PBLOCK)
                pre = quadrics.preprocess(
                    xyz, scales, rot, jnp.zeros((xyz.shape[0], 1, 3)), 0, camera,
                    self.kernel_size, active,
                )
                rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid,
                                               ntx, nty, radius_xy=pre.radius_xy)
                b = binning.bin_gaussians(pre.depth, rects, ntx, nty, kcap,
                                          mean2d=pre.mean2d, radius=pre.radius)
                op_eff = op * jnp.where(pre.valid, pre.coef, 0.0)
                payload = rp.build_payload16(
                    pre.rgb, op_eff, pre.v2g_M, pre.v2g_u0, b)
                pb = integrate.bin_points(points, camera, ntx, nty, pcap)
                T = integrate.integrate_transmittance_pallas(
                    payload, b, pb, points.shape[0], interpret=interpret
                )
                return T, b.num_slots, b.overflow

            if self.mesh is None:
                fn = jax.jit(body)
            else:
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                axis = self.mesh.axis_names[0]

                def sharded(points, xyz, scales, rot, op, active, camera):
                    T, nk, ov = body(points, xyz, scales, rot, op, active,
                                     camera)
                    # binning is per-device identical (model replicated), but
                    # reduce anyway so the outputs are formally replicated
                    return (T, jax.lax.pmax(nk, axis),
                            jax.lax.pmax(ov.astype(jnp.int32), axis) > 0)

                fn = jax.jit(shard_map(
                    sharded, mesh=self.mesh,
                    in_specs=(P(axis),) + (P(),) * 6,
                    out_specs=(P(axis), P(), P()),
                    check_vma=False,
                ))
            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def alpha(self, points: np.ndarray, cameras=None) -> np.ndarray:
        """field(x) = 1 - min over views of (1 - T_view(x))
        (evaluage_alpha, extract_mesh.py:16-34).

        A persisted config can carry a smaller key capacity than this
        model's views demand (training right-sizes to its own peak, and the
        field is evaluated without opacity tightening); a silent key
        overflow here would drop visible gaussians from the alpha field, so
        grow + re-jit until every view fits.
        """
        n_real = len(points)
        pts = jnp.asarray(points, jnp.float32)
        if self.mesh is not None:
            # pad to a multiple of the mesh size with far-away points
            # (behind every camera -> T = 1, alpha = 0; sliced off below)
            D = self.mesh.size
            pad = (-n_real) % D
            if pad:
                pts = jnp.concatenate(
                    [pts, jnp.full((pad, 3), 1e8, jnp.float32)], axis=0)
        final_alpha = jnp.ones((pts.shape[0],), jnp.float32)
        for cam in (self.cameras if cameras is None else cameras):
            for _ in range(8):
                fn = self._view_fn(pts.shape[0], cam)
                T, num_keys, ov = fn(
                    pts, self.model["xyz"], self.model["scales"],
                    self.model["rot"], self.model["op"], self.model["active"],
                    cam)
                if not bool(ov):
                    break
                need = int(num_keys)
                self.key_capacity = -(-int(need * 1.3) // 65536) * 65536
                self._jit_cache.clear()
            else:
                raise RuntimeError(
                    f"field eval overflow persists at {self.key_capacity}")
            final_alpha = jnp.minimum(final_alpha, 1.0 - T)
        return np.asarray(1.0 - final_alpha)[:n_real]

    def _color_fn(self, camera):
        """Rendered image of one view + per-point pixel sampling (the
        reference's color_integrated: out_color_integrated[p] = C + T*bg
        where C is the blended color of the pixel p projects into,
        forward.cu:1003,1208; the +T*bg term is image[:3]'s own
        compositing)."""
        key = ("color", camera.width, camera.height)
        if key not in self._jit_cache:
            from ..ops import render as render_lib

            interpret = self.interpret
            kcap = self.key_capacity

            @jax.jit
            def fn(points, xyz, scales, rot, op, active, shs, camera):
                out = render_lib.render(
                    camera, xyz, scales, rot, op, shs, self.sh_degree,
                    self.kernel_size, self.bg, active_mask=active,
                    capacity=kcap, backend="pallas", interpret=interpret,
                    with_stats=False, with_reg=False,
                )
                from ..transforms import ndc_to_pixel, project_points

                ndc = project_points(points, camera.full_proj)
                px = ndc_to_pixel(ndc[:, 0], camera.width)
                py = ndc_to_pixel(ndc[:, 1], camera.height)
                wv = camera.world_view
                z = points @ wv[2, :3] + wv[2, 3]
                inside = ((px >= 0) & (px < camera.width) & (py >= 0)
                          & (py < camera.height) & (z > 1e-4))
                xi = jnp.clip(px.astype(jnp.int32), 0, camera.width - 1)
                yi = jnp.clip(py.astype(jnp.int32), 0, camera.height - 1)
                color = out.image[:3, yi, xi].T  # [N, 3]
                return color, inside, out.num_keys, out.overflow

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def alpha_color(self, points: np.ndarray):
        """(alpha, color) per point: alpha as in alpha(); color follows the
        reference's per-view selection (extract_mesh.py:26-29) — each point
        keeps the color from the view where its alpha_integrated is lowest
        (initialized to white). Deviation (documented): a view only donates
        color where the point actually projects inside its frustum — the
        reference can keep a stale buffer value there."""
        n_real = len(points)
        final_alpha = np.ones((n_real,), np.float32)
        final_color = np.ones((n_real, 3), np.float32)
        pts = jnp.asarray(points, jnp.float32)
        for cam in self.cameras:
            # per-view alpha via the sharded/unsharded integrate path
            a_v = self.alpha(points, cameras=[cam])
            for _ in range(8):
                fn = self._color_fn(cam)
                color, inside, num_keys, ov = fn(
                    pts, self.model["xyz"], self.model["scales"],
                    self.model["rot"], self.model["op"], self.model["active"],
                    self.model["shs"], cam)
                if not bool(ov):
                    break
                self.key_capacity = -(-int(int(num_keys) * 1.3) // 65536) * 65536
                self._jit_cache.clear()
            else:
                raise RuntimeError(
                    f"color eval overflow persists at {self.key_capacity}")
            c_v = np.asarray(color)
            upd = (a_v < final_alpha) & np.asarray(inside)
            final_color = np.where(upd[:, None], c_v, final_color)
            final_alpha = np.minimum(final_alpha, a_v)
        return final_alpha, final_color


def extract_level_set_mesh(
    params, state, cameras: List[cameras_lib.Camera], cam_meta, out_dir: str,
    sh_degree: int, kernel_size: float, key_capacity: int = 1 << 20,
    n_binary_steps: int = 8, filter_faces: bool = True,
    near: float = 0.02, far: float = 1e6, interpret: bool = False,
    quiet: bool = False, shard: int = 0, texture_mesh: bool = False,
    bg=None,
) -> str:
    os.makedirs(out_dir, exist_ok=True)
    points, pscale = get_tetra_points(params, state, cam_meta, near, far)
    if not quiet:
        print(f"tetra points: {len(points)}")
    cells = delaunay(points, os.path.join(out_dir, "cells.npy"))
    if not quiet:
        print(f"tets: {len(cells)}")

    mesh = None
    if shard and shard > 1:
        from ..parallel import sharding as shard_lib

        mesh = shard_lib.make_mesh(shard)
    ev = FieldEvaluator(params, state, cameras, sh_degree, kernel_size,
                        key_capacity, interpret, mesh=mesh, bg=bg)
    alpha = ev.alpha(points)
    mt = tetmesh.marching_tetrahedra(points, cells, alpha - 0.5, pscale)
    faces = mt["faces"]
    left = mt["edge_points"][:, 0].copy()
    right = mt["edge_points"][:, 1].copy()
    left_sdf = mt["edge_sdf"][:, 0:1].copy()
    right_sdf = mt["edge_sdf"][:, 1:2].copy()
    distance = np.linalg.norm(left - right, axis=-1)
    scale_sum = mt["edge_scale"][:, 0] + mt["edge_scale"][:, 1]

    verts = (left + right) / 2.0
    for step in range(n_binary_steps):
        if not quiet:
            print(f"binary search step {step}")
        mid = (left + right) / 2.0
        mid_sdf = (ev.alpha(mid) - 0.5)[:, None]
        ind_low = ((mid_sdf < 0) & (left_sdf < 0)) | ((mid_sdf > 0) & (left_sdf > 0))
        left_sdf = np.where(ind_low, mid_sdf, left_sdf)
        right_sdf = np.where(~ind_low, mid_sdf, right_sdf)
        m = ind_low[:, 0]
        left[m] = mid[m]
        right[~m] = mid[~m]
        verts = (left + right) / 2.0

    vcolors = None
    if texture_mesh:
        # vertex colors from the view-selected integrated color
        # (extract_mesh.py:106-111; forward.cu:1182-1217)
        if not quiet:
            print("evaluating vertex colors")
        _, vcolors = ev.alpha_color(verts)
        vcolors = (np.clip(vcolors, 0.0, 1.0) * 255).astype(np.uint8)

    if filter_faces and len(faces):
        keep_v = distance <= scale_sum
        keep_f = keep_v[faces].all(axis=1)
        faces = faces[keep_f]
        # compact vertices
        used, faces = np.unique(faces.reshape(-1), return_inverse=True)
        faces = faces.reshape(-1, 3)
        verts = verts[used]
        if vcolors is not None:
            vcolors = vcolors[used]

    out_path = os.path.join(out_dir, f"mesh_binary_search_{n_binary_steps - 1}.ply")
    props = {"x": verts[:, 0], "y": verts[:, 1], "z": verts[:, 2]}
    if vcolors is not None:
        props.update(red=vcolors[:, 0], green=vcolors[:, 1], blue=vcolors[:, 2])
    ply.write_ply(out_path, props, faces=faces)
    return out_path
