"""Marching tetrahedra, binary-search-ready.

Replaces utils/tetmesh.py (Kaolin-adapted): like the reference, it returns
the crossing-edge ENDPOINTS with their field values and scales rather than
interpolated vertices — the binary-search refinement needs the interval
(extract_mesh.py:76-103). The 16-case table is derived programmatically:
1-vs-3 splits produce one triangle from the lone vertex's three crossing
edges; 2-vs-2 splits produce a quad (two triangles) over the four crossing
edges.

Two implementations with identical outputs:
- `_marching_tetrahedra_np`: host numpy (the round-1 path). Its
  `np.unique(pairs, axis=0)` edge dedup is a host lexsort over 6x the tet
  count — minutes at the full-scale 8.9M-tet extraction while the TPU
  idles.
- `_marching_tetrahedra_device`: eager jnp — sign classification, a
  (emin, emax) 2-key device sort for edge dedup, and vectorized case-table
  faces; only the compacted results transfer to host. Used automatically
  on accelerator backends (north star: "marching tetrahedra ... become
  batched JAX kernels").
"""

from __future__ import annotations

import numpy as np

# tet edge slots: pairs of local vertex indices
EDGES = np.array([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)], np.int32)
_EDGE_SLOT = {(i, j): k for k, (i, j) in enumerate(EDGES)}


def _slot(i, j):
    return _EDGE_SLOT[(min(i, j), max(i, j))]


def _build_case_table():
    """For each of 16 sign configs, the triangles as triples of edge slots."""
    table = []
    for case in range(16):
        pos = [v for v in range(4) if case & (1 << v)]
        neg = [v for v in range(4) if not case & (1 << v)]
        tris = []
        if len(pos) == 1 or len(neg) == 1:
            lone = pos[0] if len(pos) == 1 else neg[0]
            others = [v for v in range(4) if v != lone]
            tris.append([_slot(lone, others[0]), _slot(lone, others[1]), _slot(lone, others[2])])
        elif len(pos) == 2:
            a, b = pos
            c, d = neg
            e_ac, e_ad, e_bd, e_bc = _slot(a, c), _slot(a, d), _slot(b, d), _slot(b, c)
            tris.append([e_ac, e_ad, e_bd])
            tris.append([e_ac, e_bd, e_bc])
        table.append(np.array(tris, np.int32).reshape(-1, 3))
    return table


CASE_TABLE = _build_case_table()


def _empty_result():
    return {
        "edge_points": np.zeros((0, 2, 3), np.float32),
        "edge_sdf": np.zeros((0, 2), np.float32),
        "edge_scale": np.zeros((0, 2), np.float32),
        "edge_verts": np.zeros((0, 2), np.int64),
        "faces": np.zeros((0, 3), np.int64),
    }


# [16, 2, 3] case table padded with -1 (cases emit 0, 1 or 2 triangles)
def _padded_table():
    t = np.full((16, 2, 3), -1, np.int32)
    for case, tris in enumerate(CASE_TABLE):
        for i, tri in enumerate(tris):
            t[case, i] = tri
    return t


PADDED_TABLE = _padded_table()


def marching_tetrahedra(vertices: np.ndarray, tets: np.ndarray, sdf: np.ndarray,
                        scales: np.ndarray | None = None,
                        force_host: bool = False):
    """Extract the sdf=0 crossing structure from a tet mesh.

    Args:
      vertices: [N, 3]; tets: [T, 4] int; sdf: [N]; scales: [N] per-vertex
        scale hints (the reference's points_scale, used for face filtering).

    Returns dict with:
      edge_points: [E, 2, 3] crossing-edge endpoint coordinates
      edge_sdf:    [E, 2]
      edge_scale:  [E, 2] (zeros if scales is None)
      edge_verts:  [E, 2] int endpoint indices into `vertices`
      faces:       [F, 3] int indices into the E edges
    """
    if not force_host:
        import jax

        if jax.default_backend() != "cpu":
            return _marching_tetrahedra_device(vertices, tets, sdf, scales)
    return _marching_tetrahedra_np(vertices, tets, sdf, scales)


def _marching_tetrahedra_device(vertices, tets, sdf, scales=None):
    """Device marching tets (eager jnp): everything except the final
    compacted transfers runs on the accelerator. Output is identical to the
    numpy path up to face ROW order (the edge list is in the same
    (vmin, vmax)-lexicographic order; faces index the same edges)."""
    import jax
    import jax.numpy as jnp

    tets_d = jnp.asarray(np.asarray(tets, np.int32))
    sdf_d = jnp.asarray(np.asarray(sdf, np.float32))
    sign = (sdf_d > 0).astype(jnp.int32)
    occ = (sign[tets_d[:, 0]] | (sign[tets_d[:, 1]] << 1)
           | (sign[tets_d[:, 2]] << 2) | (sign[tets_d[:, 3]] << 3))
    crossing = (occ != 0) & (occ != 15)
    nc = int(jnp.sum(crossing))
    if nc == 0:
        return _empty_result()
    order = jnp.argsort(jnp.where(crossing, 0, 1), stable=True)[:nc]
    tets_c = tets_d[order]
    occ_c = occ[order]

    # edge dedup: one 2-key device sort over the 6*nc (vmin, vmax) pairs
    ev = jnp.sort(tets_c[:, jnp.asarray(EDGES)], axis=-1)  # [nc, 6, 2]
    emin = ev[..., 0].reshape(-1)
    emax = ev[..., 1].reshape(-1)
    idx = jnp.arange(6 * nc, dtype=jnp.int32)
    smin, smax, sidx = jax.lax.sort((emin, emax, idx), num_keys=2)
    first = jnp.concatenate([
        jnp.ones((1,), bool),
        (smin[1:] != smin[:-1]) | (smax[1:] != smax[:-1])])
    gid_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_edges = int(gid_sorted[-1]) + 1
    inv = jnp.zeros((6 * nc,), jnp.int32).at[sidx].set(gid_sorted)
    edge_id = inv.reshape(nc, 6)
    upos = jnp.nonzero(first, size=n_edges)[0]
    pairs = jnp.stack([smin[upos], smax[upos]], axis=-1)  # [E, 2] lex order

    # faces: vectorized case-table lookup (1-2 triangles per crossing tet)
    table = jnp.asarray(PADDED_TABLE)  # [16, 2, 3]
    slots = table[occ_c]  # [nc, 2, 3]
    valid = slots[:, :, 0] >= 0  # [nc, 2]
    f = jnp.take_along_axis(
        edge_id[:, None, :], jnp.clip(slots, 0, 5).reshape(nc, -1)[:, None, :],
        axis=2).reshape(nc, 2, 3)
    nf = int(jnp.sum(valid))
    forder = jnp.argsort(jnp.where(valid.reshape(-1), 0, 1), stable=True)[:nf]
    faces = f.reshape(-1, 3)[forder]  # [F, 3]

    # keep only edges referenced by faces, remap to compact ids
    used = jnp.zeros((n_edges,), bool).at[faces.reshape(-1)].set(True)
    remap = jnp.cumsum(used.astype(jnp.int32)) - 1
    faces = remap[faces]
    n_used = int(jnp.sum(used))
    uorder = jnp.argsort(jnp.where(used, 0, 1), stable=True)[:n_used]
    pairs_u = np.asarray(pairs[uorder])

    vertices = np.asarray(vertices)
    sdf = np.asarray(sdf)
    edge_points = vertices[pairs_u]
    edge_sdf = sdf[pairs_u]
    edge_scale = (np.asarray(scales)[pairs_u] if scales is not None
                  else np.zeros_like(edge_sdf))
    return {
        "edge_points": edge_points.astype(np.float32),
        "edge_sdf": edge_sdf.astype(np.float32),
        "edge_scale": edge_scale.astype(np.float32),
        "edge_verts": pairs_u.astype(np.int64),
        "faces": np.asarray(faces).astype(np.int64),
    }


def _marching_tetrahedra_np(vertices, tets, sdf, scales=None):
    sdf = np.asarray(sdf)
    sign = sdf > 0
    occ = (
        sign[tets[:, 0]].astype(np.int32)
        | (sign[tets[:, 1]] << 1)
        | (sign[tets[:, 2]] << 2)
        | (sign[tets[:, 3]] << 3)
    )
    crossing = (occ != 0) & (occ != 15)
    tets_c = tets[crossing]
    occ_c = occ[crossing]
    if len(tets_c) == 0:
        return {
            "edge_points": np.zeros((0, 2, 3), np.float32),
            "edge_sdf": np.zeros((0, 2), np.float32),
            "edge_scale": np.zeros((0, 2), np.float32),
            "edge_verts": np.zeros((0, 2), np.int64),
            "faces": np.zeros((0, 3), np.int64),
        }

    # global ids for all 6 edges of crossing tets
    ev = tets_c[:, EDGES]  # [Tc, 6, 2] vertex pairs
    ev = np.sort(ev, axis=-1)
    flat = ev.reshape(-1, 2)
    uniq, inv = np.unique(flat, axis=0, return_inverse=True)
    edge_id = inv.reshape(len(tets_c), 6)  # [Tc, 6] -> global edge

    faces = []
    for case in range(1, 15):
        tris = CASE_TABLE[case]
        if len(tris) == 0:
            continue
        rows = np.nonzero(occ_c == case)[0]
        if len(rows) == 0:
            continue
        for tri in tris:
            faces.append(edge_id[rows][:, tri])
    faces = np.concatenate(faces, axis=0).astype(np.int64)

    # keep only edges actually used by faces, remap indices
    used, faces_r = np.unique(faces.reshape(-1), return_inverse=True)
    faces = faces_r.reshape(-1, 3)
    pairs = uniq[used]  # [E, 2] vertex ids

    edge_points = vertices[pairs]  # [E, 2, 3]
    edge_sdf = sdf[pairs]
    edge_scale = scales[pairs] if scales is not None else np.zeros_like(edge_sdf)
    return {
        "edge_points": edge_points.astype(np.float32),
        "edge_sdf": edge_sdf.astype(np.float32),
        "edge_scale": edge_scale.astype(np.float32),
        "edge_verts": pairs.astype(np.int64),
        "faces": faces,
    }
