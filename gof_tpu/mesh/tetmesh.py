"""Marching tetrahedra (host numpy), binary-search-ready.

Replaces utils/tetmesh.py (Kaolin-adapted): like the reference, it returns
the crossing-edge ENDPOINTS with their field values and scales rather than
interpolated vertices — the binary-search refinement needs the interval
(extract_mesh.py:76-103). The 16-case table is derived programmatically:
1-vs-3 splits produce one triangle from the lone vertex's three crossing
edges; 2-vs-2 splits produce a quad (two triangles) over the four crossing
edges. Runs on the host: mesh extraction is offline and the expensive part
(field evaluation) stays on the TPU.
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


def marching_tetrahedra(vertices: np.ndarray, tets: np.ndarray, sdf: np.ndarray,
                        scales: np.ndarray | None = None):
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
