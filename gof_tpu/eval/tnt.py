"""Tanks and Temples geometry evaluation (python -m gof_tpu.eval.tnt ...).

Replaces eval_tnt/run.py + evaluation.py + registration.py: aligns the
reconstruction to the ground truth (dataset alignment matrix + ICP
refinement), crops both to the official crop volume, and reports
precision / recall / F-score at the per-scene tau
(eval_tnt/config.py:33-41).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from ..utils import ply
from . import geometry as geo

# per-scene distance thresholds tau (eval_tnt/config.py:33-41)
SCENE_TAU = {
    "Barn": 0.01, "Caterpillar": 0.005, "Courthouse": 0.025,
    "Ignatius": 0.003, "Meetingroom": 0.01, "Truck": 0.005,
}


def load_points(path):
    verts, faces = ply.read_ply(path)
    pts = np.stack([verts["x"], verts["y"], verts["z"]], -1).astype(np.float64)
    return pts, faces


def load_crop_volume(path):
    """Official TNT crop file: polygon in an axis-aligned plane + slice range."""
    with open(path) as f:
        crop = json.load(f)
    poly = np.array(crop["bounding_polygon"])
    axis_names = {"X": 0, "Y": 1, "Z": 2}
    axis = axis_names[crop["orthogonal_axis"].upper()]
    return poly, axis, crop["axis_min"], crop["axis_max"]


def crop_points(pts, poly, axis, amin, amax):
    keep = (pts[:, axis] >= amin) & (pts[:, axis] <= amax)
    dims = [d for d in range(3) if d != axis]
    px, py = pts[:, dims[0]], pts[:, dims[1]]
    vx, vy = poly[:, dims[0]], poly[:, dims[1]]
    inside = np.zeros(len(pts), bool)
    j = len(poly) - 1
    for i in range(len(poly)):
        cond = ((vy[i] > py) != (vy[j] > py)) & (
            px < (vx[j] - vx[i]) * (py - vy[i]) / (vy[j] - vy[i] + 1e-30) + vx[i]
        )
        inside ^= cond
        j = i
    return pts[keep & inside]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-dir", required=True,
                    help="dir with {scene}.ply (gt), {scene}.json (crop), {scene}_trans.txt")
    ap.add_argument("--traj-path", default="", help="unused placeholder for parity")
    ap.add_argument("--ply-path", required=True, help="reconstructed mesh/points")
    ap.add_argument("--out-dir", default="")
    ns = ap.parse_args(argv)

    scene = os.path.basename(ns.dataset_dir.rstrip("/"))
    tau = SCENE_TAU.get(scene, 0.01)
    pred, faces = load_points(ns.ply_path)
    if faces is not None and len(faces):
        pred = geo.sample_mesh_surface(pred, faces, density=tau / 2, max_points=5_000_000)
    gt, _ = load_points(os.path.join(ns.dataset_dir, f"{scene}.ply"))

    trans_path = os.path.join(ns.dataset_dir, f"{scene}_trans.txt")
    if os.path.exists(trans_path):
        T0 = np.loadtxt(trans_path).reshape(4, 4)
        pred = pred @ T0[:3, :3].T + T0[:3, 3]
    # ICP refinement (registration.py's registration_unif/vol analog)
    T = geo.icp_point_to_point(pred, gt, threshold=tau * 10)
    pred = pred @ T[:3, :3].T + T[:3, 3]

    crop_path = os.path.join(ns.dataset_dir, f"{scene}.json")
    if os.path.exists(crop_path):
        poly, axis, amin, amax = load_crop_volume(crop_path)
        pred = crop_points(pred, poly, axis, amin, amax)
        gt = crop_points(gt, poly, axis, amin, amax)

    res = geo.precision_recall_fscore(pred, gt, tau)
    out = ns.out_dir or os.path.dirname(ns.ply_path)
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "tnt_results.json"), "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
