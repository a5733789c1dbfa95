"""Benchmark sweep dispatcher.

Replaces the reference's scripts/run_{mipnerf360,dtu,tnt,nerf_synthetic}.py
(GPUtil-based one-process-per-GPU dispatch, run_mipnerf360.py:50-81). On TPU
the unit of parallelism is the chip pool: with one chip scenes run
sequentially; with several, each scene is pinned to a device set via
JAX_PLATFORMS/visible-device env (share-nothing, exactly the reference's
model). Scene lists and per-dataset flags mirror the reference
(run_mipnerf360.py:8-10, run_dtu.py:8-21, run_tnt.py:7-28,
run_nerf_synthetic.py:8-24).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

MIPNERF360 = {
    "scenes": ["bicycle", "bonsai", "counter", "flowers", "garden", "kitchen",
               "room", "stump", "treehill"],
    "factors": [4, 2, 2, 4, 4, 2, 2, 4, 4],
    "extra": ["--eval"],
}
DTU_SCANS = [24, 37, 40, 55, 63, 65, 69, 83, 97, 105, 106, 110, 114, 118, 122]
TNT_SCENES = ["Barn", "Caterpillar", "Courthouse", "Ignatius", "Meetingroom", "Truck"]
NERF_SYNTHETIC = ["chair", "drums", "ficus", "hotdog", "lego", "materials", "mic", "ship"]


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def train_and_eval(source, model, extra, do_mesh=True, do_tsdf=False):
    py = [sys.executable, "-m"]
    run(py + ["gof_tpu.train", "-s", source, "-m", model] + extra)
    run(py + ["gof_tpu.render_cli", "-m", model, "--skip_train"])
    run(py + ["gof_tpu.metrics", "-m", model])
    if do_mesh:
        run(py + ["gof_tpu.extract_mesh", "-m", model])
    if do_tsdf:
        run(py + ["gof_tpu.extract_mesh_tsdf", "-m", model])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", choices=["mipnerf360", "dtu", "tnt", "nerf_synthetic"])
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--out_root", required=True)
    ap.add_argument("--scenes", nargs="*", default=None, help="subset of scenes")
    ap.add_argument("--dtu_eval_data", default="",
                    help="DTU ground-truth dir (Points/ObsMask) to chain the "
                         "chamfer eval after mesh extraction")
    ap.add_argument("--tnt_eval_data", default="",
                    help="TNT ground-truth dir to chain the F-score eval "
                         "after mesh extraction")
    ns = ap.parse_args()

    if ns.dataset == "mipnerf360":
        for scene, factor in zip(MIPNERF360["scenes"], MIPNERF360["factors"]):
            if ns.scenes and scene not in ns.scenes:
                continue
            train_and_eval(
                os.path.join(ns.data_root, scene),
                os.path.join(ns.out_root, scene),
                ["-r", str(factor), "--eval"],
            )
    elif ns.dataset == "dtu":
        # run_dtu.py:8-21: -r2, decoupled appearance, lambda_distortion 1000;
        # DTU geometry uses the TSDF mesh (run_dtu.py:26-42) and chains the
        # chamfer eval (cull + align + ObsMask/plane-filtered chamfer)
        for scan in DTU_SCANS:
            name = f"scan{scan}"
            if ns.scenes and name not in ns.scenes:
                continue
            model = os.path.join(ns.out_root, name)
            train_and_eval(
                os.path.join(ns.data_root, name),
                model,
                ["-r", "2", "--use_decoupled_appearance", "--lambda_distortion", "1000"],
                do_mesh=True, do_tsdf=True,
            )
            if ns.dtu_eval_data:
                run([sys.executable, "-m", "gof_tpu.eval.dtu",
                     "--model_path", model, "--scan_id", str(scan),
                     "--DTU", ns.dtu_eval_data])
    elif ns.dataset == "tnt":
        # run_tnt.py:7-28: -r2, decoupled appearance; marching-tets mesh,
        # then the trajectory-aligned F-score eval (run_tnt.py:33-40)
        for scene in TNT_SCENES:
            if ns.scenes and scene not in ns.scenes:
                continue
            model = os.path.join(ns.out_root, scene)
            train_and_eval(
                os.path.join(ns.data_root, scene),
                model,
                ["-r", "2", "--use_decoupled_appearance"],
            )
            if ns.tnt_eval_data:
                mesh = os.path.join(model, "test", "ours_30000", "fusion",
                                    "mesh_binary_search_7.ply")
                traj = os.path.join(ns.data_root, scene, f"{scene}_COLMAP_SfM.log")
                cmd = [sys.executable, "-m", "gof_tpu.eval.tnt",
                       "--dataset-dir", os.path.join(ns.tnt_eval_data, scene),
                       "--ply-path", mesh]
                if os.path.exists(traj):
                    cmd += ["--traj-path", traj]
                run(cmd)
    else:
        for scene in NERF_SYNTHETIC:
            if ns.scenes and scene not in ns.scenes:
                continue
            train_and_eval(
                os.path.join(ns.data_root, scene),
                os.path.join(ns.out_root, scene),
                ["--white_background", "--eval"],
            )


if __name__ == "__main__":
    main()
