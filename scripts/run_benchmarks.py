"""Benchmark sweep dispatcher.

Replaces the reference's scripts/run_{mipnerf360,dtu,tnt,nerf_synthetic}.py
(GPUtil-based one-process-per-GPU dispatch, run_mipnerf360.py:50-81). The
unit of parallelism is a worker pool of subprocesses: each worker owns one
device (pinned via env) and pulls scenes off a shared queue; a scene's whole
chain (train -> render -> metrics -> mesh -> geometry eval) stays on its
worker, share-nothing — exactly the reference's model. `--workers 1`
(default) runs sequentially, which is also what the single-chip tunneled TPU
requires (exclusive transport). Scene lists and per-dataset flags mirror the
reference (run_mipnerf360.py:8-10, run_dtu.py:8-21, run_tnt.py:7-28,
run_nerf_synthetic.py:8-24).
"""

from __future__ import annotations

import argparse
import os
import queue
import subprocess
import sys
import threading

MIPNERF360 = {
    "scenes": ["bicycle", "bonsai", "counter", "flowers", "garden", "kitchen",
               "room", "stump", "treehill"],
    "factors": [4, 2, 2, 4, 4, 2, 2, 4, 4],
    "extra": ["--eval"],
}
DTU_SCANS = [24, 37, 40, 55, 63, 65, 69, 83, 97, 105, 106, 110, 114, 118, 122]
TNT_SCENES = ["Barn", "Caterpillar", "Courthouse", "Ignatius", "Meetingroom", "Truck"]
NERF_SYNTHETIC = ["chair", "drums", "ficus", "hotdog", "lego", "materials", "mic", "ship"]


def scene_job(source, model, extra, do_mesh=True, do_tsdf=False, tail=()):
    """The command chain for one scene (reference run_mipnerf360.py:17-46)."""
    py = [sys.executable, "-m"]
    cmds = [
        py + ["gof_tpu.train", "-s", source, "-m", model] + extra,
        py + ["gof_tpu.render_cli", "-m", model, "--skip_train"],
        py + ["gof_tpu.metrics", "-m", model],
    ]
    if do_mesh:
        cmds.append(py + ["gof_tpu.extract_mesh", "-m", model])
    if do_tsdf:
        cmds.append(py + ["gof_tpu.extract_mesh_tsdf", "-m", model])
    cmds.extend(list(c) for c in tail)
    return cmds


def pin_env(wid: int, mode: str) -> dict:
    """Per-worker device pinning (the CUDA_VISIBLE_DEVICES analog).

    tpu: each worker sees one local TPU chip (libtpu honors
         TPU_VISIBLE_DEVICES on multi-chip hosts).
    cpu: force the CPU backend (hermetic tests / machines without chips).
    none: inherit the environment unchanged (single worker).
    """
    if mode == "tpu":
        return {"TPU_VISIBLE_DEVICES": str(wid),
                "TPU_PROCESS_BOUNDS": "1,1,1",
                "TPU_CHIPS_PER_PROCESS_BOUNDS": "1,1,1"}
    if mode == "cpu":
        # A site-installed PJRT plugin (e.g. an `axon` remote-TPU backend
        # registered from sitecustomize) can claim an EXCLUSIVE device
        # tunnel per process regardless of JAX_PLATFORMS; clear its trigger
        # env vars so CPU workers never contend for the chip.
        return {"JAX_PLATFORMS": "cpu",
                "PALLAS_AXON_POOL_IPS": "",
                "PJRT_DEVICE": "CPU"}
    return {}


def dispatch(jobs, workers: int, pin: str):
    """Run scene jobs over `workers` concurrent single-device subprocesses.

    Jobs are pulled from a queue as workers free up (GPUtil-pool semantics,
    run_mipnerf360.py:50-81); one failed command aborts only its own scene's
    remaining chain. Returns the list of failures.
    """
    q: queue.Queue = queue.Queue()
    for j in jobs:
        q.put(j)
    failures = []
    lock = threading.Lock()

    def worker(wid: int):
        env = dict(os.environ)
        env.update(pin_env(wid, pin))
        while True:
            try:
                job = q.get_nowait()
            except queue.Empty:
                return
            for cmd in job:
                print(f"[w{wid}] + {' '.join(cmd)}", flush=True)
                r = subprocess.run(cmd, env=env)
                if r.returncode != 0:
                    with lock:
                        failures.append((wid, cmd, r.returncode))
                    break

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(workers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for wid, cmd, rc in failures:
        print(f"[w{wid}] FAILED rc={rc}: {' '.join(cmd)}", file=sys.stderr)
    return failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", choices=["mipnerf360", "dtu", "tnt", "nerf_synthetic"])
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--out_root", required=True)
    ap.add_argument("--scenes", nargs="*", default=None, help="subset of scenes")
    ap.add_argument("--workers", type=int, default=1,
                    help="concurrent scenes; each worker is pinned to one device")
    ap.add_argument("--pin", choices=["tpu", "cpu", "none"], default="none",
                    help="per-worker device pinning env (tpu: one chip per "
                         "worker on a multi-chip host)")
    ap.add_argument("--dtu_eval_data", default="",
                    help="DTU ground-truth dir (Points/ObsMask) to chain the "
                         "chamfer eval after mesh extraction")
    ap.add_argument("--tnt_eval_data", default="",
                    help="TNT ground-truth dir to chain the F-score eval "
                         "after mesh extraction")
    ap.add_argument("--train_args", default="",
                    help="extra flags appended to every train command "
                         "(space-separated), e.g. --train_args "
                         "'--iterations 1000 --densify_until_iter 600'")
    ns = ap.parse_args()
    extra_train = ns.train_args.split() if ns.train_args else []

    jobs = []
    if ns.dataset == "mipnerf360":
        for scene, factor in zip(MIPNERF360["scenes"], MIPNERF360["factors"]):
            if ns.scenes and scene not in ns.scenes:
                continue
            jobs.append(scene_job(
                os.path.join(ns.data_root, scene),
                os.path.join(ns.out_root, scene),
                ["-r", str(factor), "--eval"] + extra_train,
            ))
    elif ns.dataset == "dtu":
        # run_dtu.py:8-21: -r2, decoupled appearance, lambda_distortion 1000;
        # DTU geometry uses the TSDF mesh (run_dtu.py:26-42) and chains the
        # chamfer eval (cull + align + ObsMask/plane-filtered chamfer)
        for scan in DTU_SCANS:
            name = f"scan{scan}"
            if ns.scenes and name not in ns.scenes:
                continue
            model = os.path.join(ns.out_root, name)
            tail = []
            if ns.dtu_eval_data:
                tail.append([sys.executable, "-m", "gof_tpu.eval.dtu",
                             "--model_path", model, "--scan_id", str(scan),
                             "--DTU", ns.dtu_eval_data])
            jobs.append(scene_job(
                os.path.join(ns.data_root, name), model,
                ["-r", "2", "--use_decoupled_appearance",
                 "--lambda_distortion", "1000"] + extra_train,
                do_mesh=True, do_tsdf=True, tail=tail,
            ))
    elif ns.dataset == "tnt":
        # run_tnt.py:7-28: -r2, decoupled appearance; marching-tets mesh,
        # then the trajectory-aligned F-score eval (run_tnt.py:33-40)
        for scene in TNT_SCENES:
            if ns.scenes and scene not in ns.scenes:
                continue
            model = os.path.join(ns.out_root, scene)
            tail = []
            if ns.tnt_eval_data:
                mesh = os.path.join(model, "test", "ours_30000", "fusion",
                                    "mesh_binary_search_7.ply")
                traj = os.path.join(ns.data_root, scene, f"{scene}_COLMAP_SfM.log")
                cmd = [sys.executable, "-m", "gof_tpu.eval.tnt",
                       "--dataset-dir", os.path.join(ns.tnt_eval_data, scene),
                       "--ply-path", mesh]
                if os.path.exists(traj):
                    cmd += ["--traj-path", traj]
                tail.append(cmd)
            jobs.append(scene_job(
                os.path.join(ns.data_root, scene), model,
                ["-r", "2", "--use_decoupled_appearance"] + extra_train,
                tail=tail,
            ))
    else:
        for scene in NERF_SYNTHETIC:
            if ns.scenes and scene not in ns.scenes:
                continue
            jobs.append(scene_job(
                os.path.join(ns.data_root, scene),
                os.path.join(ns.out_root, scene),
                ["--white_background", "--eval"] + extra_train,
            ))

    failures = dispatch(jobs, max(ns.workers, 1), ns.pin)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
