"""Full evaluation sweep (python -m gof_tpu.full_eval ...).

Replaces full_eval.py: train + render + metrics over the 360/NS benchmark
scene lists with the standard flags; a thin wrapper over
scripts/run_benchmarks.py kept for CLI parity with the reference.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mipnerf360", default="")
    ap.add_argument("--nerf_synthetic", default="")
    ap.add_argument("--output_path", default="./eval")
    ap.add_argument("--skip_training", action="store_true")
    ap.add_argument("--skip_rendering", action="store_true")
    ap.add_argument("--skip_metrics", action="store_true")
    ns = ap.parse_args(argv)

    script = os.path.join(os.path.dirname(__file__), "..", "scripts", "run_benchmarks.py")
    if ns.mipnerf360:
        subprocess.run(
            [sys.executable, script, "mipnerf360", "--data_root", ns.mipnerf360,
             "--out_root", os.path.join(ns.output_path, "mipnerf360")],
            check=True,
        )
    if ns.nerf_synthetic:
        subprocess.run(
            [sys.executable, script, "nerf_synthetic", "--data_root", ns.nerf_synthetic,
             "--out_root", os.path.join(ns.output_path, "nerf_synthetic")],
            check=True,
        )


if __name__ == "__main__":
    main()
