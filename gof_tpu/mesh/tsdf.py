"""TSDF fusion from rendered depth maps (the reference's DTU mesh path).

Replaces extract_mesh_tsdf.py (which uses Open3D's VoxelBlockGrid; not
available here). Two fusion layouts:

- sparse block grid (production, the VoxelBlockGrid equivalent at the
  reference protocol: voxel 0.002, 16^3 blocks, depth 1-6,
  extract_mesh_tsdf.py:22-46): blocks are DISCOVERED from the depth maps
  (unprojecting each valid pixel at d-trunc/d/d+trunc, the
  compute_unique_block_coordinates analog), fused in device batches with
  per-voxel color, and triangulated per block with (R+1)^3 samples so cube
  corners never cross block boundaries;
- dense z-slab grid (small scenes / tests).

Both triangulate by marching tetrahedra (6 tets per crossing cube) with
linear interpolation.
"""

from __future__ import annotations

import functools

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


# ---------------------------------------------------------------------------
# Sparse block grid (VoxelBlockGrid equivalent)
# ---------------------------------------------------------------------------


def discover_blocks(
    depths: List[np.ndarray],
    cameras,
    voxel_size: float,
    block_res: int = 16,
    sdf_trunc: float = 0.016,
    depth_min: float = 1.0,
    depth_max: float = 6.0,
    max_blocks: int = 500_000,
) -> np.ndarray:
    """Unique block coordinates touched by any view's truncation band
    (compute_unique_block_coordinates, extract_mesh_tsdf.py:78-79): each
    valid depth pixel is unprojected at d - trunc, d, d + trunc and the
    containing blocks collected. Returns [Nb, 3] int32 block coords (world
    position = coord * block_res * voxel_size)."""
    bs = block_res * voxel_size
    found = []

    @jax.jit
    def unproject(depth_map, world_view, focal_x, focal_y):
        H, W = depth_map.shape
        xs = (jnp.arange(W) - (W - 1) / 2.0) / focal_x
        ys = (jnp.arange(H) - (H - 1) / 2.0) / focal_y
        rx, ry = jnp.meshgrid(xs, ys, indexing="xy")
        d = depth_map
        valid = (d > depth_min) & (d < depth_max)
        R = world_view[:3, :3]
        t = world_view[:3, 3]
        pts = []
        for dd in (d - sdf_trunc, d, d + sdf_trunc):
            pv = jnp.stack([rx * dd, ry * dd, dd], axis=-1)  # [H, W, 3]
            pw = (pv - t) @ R  # R^T (pv - t), world coords
            pts.append(pw.reshape(-1, 3))
        return jnp.concatenate(pts), jnp.tile(valid.reshape(-1), 3)

    for cam, depth in zip(cameras, depths):
        pw, valid = unproject(jnp.asarray(depth), cam.world_view,
                              cam.focal_x, cam.focal_y)
        pw = np.asarray(pw)[np.asarray(valid)]
        if len(pw) == 0:
            continue
        blocks = np.floor(pw / bs).astype(np.int32)
        found.append(np.unique(blocks, axis=0))
    if not found:
        return np.zeros((0, 3), np.int32)
    blocks = np.unique(np.concatenate(found), axis=0)
    if len(blocks) > max_blocks:
        raise RuntimeError(
            f"{len(blocks)} TSDF blocks exceed max_blocks={max_blocks}; "
            f"raise --max_blocks or the voxel size")
    return blocks


def fuse_blocks(
    depths: List[np.ndarray],
    colors,  # per view [3, H, W] rgb (or None for no color fusion)
    cameras,
    blocks: np.ndarray,  # [Nb, 3] int32
    voxel_size: float,
    block_res: int = 16,
    sdf_trunc: float = 0.016,
    depth_min: float = 1.0,
    depth_max: float = 6.0,
    batch: int = 1024,
):
    """Weighted-average TSDF (+color) over sparse (block_res+1)^3 sample
    blocks. Returns (tsdf [Nb, R1^3], weight [Nb, R1^3], color [Nb, R1^3, 3]
    or None); samples live at block_origin + idx * voxel, idx in
    [0, block_res] so each block triangulates its block_res^3 cubes without
    touching neighbors (boundary samples are duplicated, fused identically)."""
    Nb = len(blocks)
    R1 = block_res + 1
    S = R1**3
    with_color = colors is not None
    tsdf = np.ones((Nb, S), np.float32)
    weight = np.zeros((Nb, S), np.float32)
    color = np.zeros((Nb, S, 3), np.float32) if with_color else None

    offs = np.stack(np.meshgrid(*([np.arange(R1)] * 3), indexing="ij"),
                    -1).reshape(-1, 3).astype(np.float32)  # [S, 3]
    offs_j = jnp.asarray(offs * voxel_size)

    @functools.partial(jax.jit, static_argnames=("with_color",))
    def batch_update(t_b, w_b, c_b, origins, depth_map, rgb, world_view,
                     full_proj, with_color):
        H, W = depth_map.shape
        pts = origins[:, None, :] + offs_j[None, :, :]  # [B, S, 3]
        pts = pts.reshape(-1, 3)
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
        sdf = (d - z) / sdf_trunc
        upd = valid & (sdf > -1.0)
        sdf = jnp.clip(sdf, -1.0, 1.0).reshape(t_b.shape)
        u = upd.reshape(t_b.shape).astype(jnp.float32)
        new_w = w_b + u
        denom = jnp.maximum(new_w, 1.0)
        new_t = jnp.where(new_w > 0, (t_b * w_b + sdf * u) / denom, t_b)
        if with_color:
            rgb_s = rgb[:, yi, xi].T.reshape(c_b.shape)  # [B, S, 3]
            new_c = jnp.where(
                new_w[..., None] > 0,
                (c_b * w_b[..., None] + rgb_s * u[..., None]) / denom[..., None],
                c_b,
            )
        else:
            new_c = c_b
        return new_t, new_w, new_c

    bs = block_res * voxel_size
    for b0 in range(0, Nb, batch):
        b1 = min(b0 + batch, Nb)
        origins = jnp.asarray(blocks[b0:b1].astype(np.float32) * bs)
        t_b = jnp.ones((b1 - b0, S), jnp.float32)
        w_b = jnp.zeros((b1 - b0, S), jnp.float32)
        c_b = jnp.zeros((b1 - b0, S, 3), jnp.float32)
        for vi, (cam, depth) in enumerate(zip(cameras, depths)):
            rgb = jnp.asarray(colors[vi]) if with_color else jnp.zeros((3, 1, 1))
            t_b, w_b, c_b = batch_update(
                t_b, w_b, c_b, origins, jnp.asarray(depth), rgb,
                cam.world_view, cam.full_proj, with_color=with_color)
        tsdf[b0:b1] = np.asarray(t_b)
        weight[b0:b1] = np.asarray(w_b)
        if with_color:
            color[b0:b1] = np.asarray(c_b)
    tsdf[weight == 0] = 1.0
    return tsdf, weight, color


def blocks_to_mesh(tsdf: np.ndarray, weight: np.ndarray, color,
                   blocks: np.ndarray, voxel_size: float, block_res: int = 16):
    """Triangulate the 0 level set of a sparse block grid. Returns
    (verts, faces, vertex_colors or None). Seam vertices are deduplicated by
    quantized world position (adjacent blocks fuse identical samples)."""
    Nb = len(blocks)
    R = block_res
    R1 = R + 1
    if Nb == 0:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64),
                None if color is None else np.zeros((0, 3), np.float32))
    t = tsdf.reshape(Nb, R1, R1, R1)
    w = weight.reshape(Nb, R1, R1, R1)
    inside = t < 0
    first = inside[:, :-1, :-1, :-1]
    agree = np.ones((Nb, R, R, R), bool)
    obs = w[:, :-1, :-1, :-1] > 0
    for dx, dy, dz in _CORNER_OFFS[1:]:
        agree &= inside[:, dx:R + dx, dy:R + dy, dz:R + dz] == first
        obs &= w[:, dx:R + dx, dy:R + dy, dz:R + dz] > 0
    cross = (~agree) & obs
    idx = np.argwhere(cross)  # [C, 4]: (block, x, y, z)
    if len(idx) == 0:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64),
                None if color is None else np.zeros((0, 3), np.float32))

    corner = idx[:, None, 1:] + _CORNER_OFFS[None, :, :]  # [C, 8, 3]
    flat = (
        idx[:, 0:1] * (R1**3)
        + corner[..., 0] * (R1 * R1) + corner[..., 1] * R1 + corner[..., 2]
    )  # [C, 8] sample ids
    verts_used, inv = np.unique(flat.reshape(-1), return_inverse=True)
    local = inv.reshape(-1, 8)
    vb = verts_used // (R1**3)
    vr = verts_used % (R1**3)
    vxyz = np.stack([vr // (R1 * R1), (vr // R1) % R1, vr % R1], -1)
    bs = block_res * voxel_size
    vpos = (blocks[vb].astype(np.float32) * bs
            + vxyz.astype(np.float32) * voxel_size)
    vsdf = tsdf.reshape(-1)[verts_used]
    vcol = None if color is None else color.reshape(-1, 3)[verts_used]

    tets = local[:, _CUBE_TETS].reshape(-1, 4)
    out = tetmesh.marching_tetrahedra(vpos, tets, vsdf, None)
    ep = out["edge_points"]
    es = out["edge_sdf"]
    denom = es[:, 0] - es[:, 1]
    tlin = np.where(np.abs(denom) > 1e-12, es[:, 0] / np.where(denom == 0, 1, denom), 0.5)
    tlin = np.clip(tlin, 0.0, 1.0)[:, None]
    verts = (ep[:, 0] * (1 - tlin) + ep[:, 1] * tlin).astype(np.float32)
    faces = out["faces"]
    vcolors = None
    if color is not None:
        ec = vcol[out["edge_verts"]]  # [E, 2, 3]
        vcolors = (ec[:, 0] * (1 - tlin) + ec[:, 1] * tlin).astype(np.float32)

    # dedupe seam vertices (identical world positions from adjacent blocks)
    qv = np.round(verts / (voxel_size * 1e-3)).astype(np.int64)
    _, uidx, uinv = np.unique(qv, axis=0, return_index=True, return_inverse=True)
    verts = verts[uidx]
    faces = uinv[faces]
    if vcolors is not None:
        vcolors = vcolors[uidx]
    # drop degenerate faces created by the dedupe
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2]))
    return verts, faces[good], vcolors


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
