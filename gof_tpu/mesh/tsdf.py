"""TSDF fusion from rendered depth maps (the reference's DTU mesh path).

Replaces extract_mesh_tsdf.py (which uses Open3D's VoxelBlockGrid; not
available here): a dense voxel grid processed in z-slabs on the device, fused
from per-view median-depth maps masked by accumulated alpha >= 0.5 (and the
gt alpha mask when present, extract_mesh_tsdf.py:22-46), then triangulated by
marching tetrahedra (6 tets per crossing cube) with linear interpolation.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from . import tetmesh

# the 6-tetrahedra decomposition of a cube (corner ids in (x, y, z) bit order:
# corner = x | y << 1 | z << 2)
_CUBE_TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 1, 7, 5],
        [0, 5, 7, 4],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
    ],
    np.int32,
)
_CORNER_OFFS = np.array([[x, y, z] for z in (0, 1) for y in (0, 1) for x in (0, 1)], np.int32)
# reorder to bit order x | y<<1 | z<<2
_CORNER_OFFS = np.array([[c & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)], np.int32)


def fuse_depth_maps(
    depths: List[np.ndarray],  # per view [H, W] median depth (0 = invalid)
    cameras,  # list of Camera pytrees
    origin: np.ndarray,
    voxel_size: float,
    dims: tuple[int, int, int],
    sdf_trunc: float,
    depth_min: float = 0.5,
    depth_max: float = 6.0,
    slab: int = 32,
) -> np.ndarray:
    """Weighted-average TSDF over a dense grid; returns [X, Y, Z] float32
    (positive outside, +1 where unobserved)."""
    X, Y, Z = dims
    tsdf = np.ones((X, Y, Z), np.float32)
    weight = np.zeros((X, Y, Z), np.float32)

    @jax.jit
    def slab_update(tsdf_s, weight_s, zs, depth_map, world_view, full_proj, W, H):
        xs = jnp.arange(X) * voxel_size + origin[0]
        ys = jnp.arange(Y) * voxel_size + origin[1]
        pts = jnp.stack(
            jnp.meshgrid(xs, ys, zs, indexing="ij"), axis=-1
        ).reshape(-1, 3)  # [X*Y*S, 3]
        pv = pts @ world_view[:3, :3].T + world_view[:3, 3]
        z = pv[:, 2]
        ph = pts @ full_proj[:3, :3].T + full_proj[:3, 3]
        pw = pts @ full_proj[3, :3].T + full_proj[3, 3]
        ndc = ph / (pw[:, None] + 1e-7)
        px = ((ndc[:, 0] + 1) * W - 1) * 0.5
        py = ((ndc[:, 1] + 1) * H - 1) * 0.5
        xi = jnp.clip(px.astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(py.astype(jnp.int32), 0, H - 1)
        d = depth_map[yi, xi]
        valid = (
            (z > 1e-4) & (px >= 0) & (px < W) & (py >= 0) & (py < H)
            & (d > depth_min) & (d < depth_max)
        )
        # depth along the ray: our depth channel stores t with ray z=1, i.e.
        # the view-space z — compare to voxel view z directly
        sdf = (d - z) / sdf_trunc
        upd = valid & (sdf > -1.0)
        sdf = jnp.clip(sdf, -1.0, 1.0)
        s = sdf.reshape(tsdf_s.shape)
        u = upd.reshape(tsdf_s.shape).astype(jnp.float32)
        new_w = weight_s + u
        new_t = jnp.where(new_w > 0, (tsdf_s * weight_s + s * u) / jnp.maximum(new_w, 1.0), tsdf_s)
        return new_t, new_w

    for z0 in range(0, Z, slab):
        z1 = min(z0 + slab, Z)
        zs = jnp.arange(z0, z1) * voxel_size + origin[2]
        t_s = jnp.ones((X, Y, z1 - z0), jnp.float32)
        w_s = jnp.zeros((X, Y, z1 - z0), jnp.float32)
        for cam, depth in zip(cameras, depths):
            t_s, w_s = slab_update(
                t_s, w_s, zs, jnp.asarray(depth), cam.world_view, cam.full_proj,
                cam.width, cam.height,
            )
        tsdf[:, :, z0:z1] = np.asarray(t_s)
        weight[:, :, z0:z1] = np.asarray(w_s)

    tsdf[weight == 0] = 1.0  # unobserved = outside
    return tsdf, weight


def grid_to_mesh(tsdf: np.ndarray, weight: np.ndarray, origin: np.ndarray, voxel_size: float):
    """Triangulate the 0 level set: 6 tets per crossing cube + linear interp."""
    X, Y, Z = tsdf.shape
    inside = tsdf < 0
    # crossing cubes: any sign difference among the 8 corners, all observed
    c = inside
    agree = np.ones((X - 1, Y - 1, Z - 1), bool)
    first = c[:-1, :-1, :-1]
    obs = np.ones_like(agree)
    for dx, dy, dz in _CORNER_OFFS[1:]:
        agree &= c[dx : X - 1 + dx, dy : Y - 1 + dy, dz : Z - 1 + dz] == first
        obs &= weight[dx : X - 1 + dx, dy : Y - 1 + dy, dz : Z - 1 + dz] > 0
    obs &= weight[: X - 1, : Y - 1, : Z - 1] > 0
    cross = (~agree) & obs
    idx = np.argwhere(cross)  # [C, 3]
    if len(idx) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    # per crossing cube: the 8 corner voxel ids and values
    corner_idx = idx[:, None, :] + _CORNER_OFFS[None, :, :]  # [C, 8, 3]
    flat = (
        corner_idx[..., 0] * (Y * Z) + corner_idx[..., 1] * Z + corner_idx[..., 2]
    )  # [C, 8] global vertex ids
    verts_used, inv = np.unique(flat.reshape(-1), return_inverse=True)
    local = inv.reshape(-1, 8)  # [C, 8] -> local vertex ids
    vx = verts_used // (Y * Z)
    vy = (verts_used // Z) % Y
    vz = verts_used % Z
    vpos = np.stack([vx, vy, vz], -1).astype(np.float32) * voxel_size + origin
    vsdf = tsdf.reshape(-1)[verts_used]

    tets = local[:, _CUBE_TETS].reshape(-1, 4)  # [C*6, 4]
    out = tetmesh.marching_tetrahedra(vpos, tets, vsdf, None)
    ep = out["edge_points"]
    es = out["edge_sdf"]
    denom = es[:, 0] - es[:, 1]
    tlin = np.where(np.abs(denom) > 1e-12, es[:, 0] / np.where(denom == 0, 1, denom), 0.5)
    tlin = np.clip(tlin, 0.0, 1.0)[:, None]
    verts = ep[:, 0] * (1 - tlin) + ep[:, 1] * tlin
    return verts.astype(np.float32), out["faces"]
