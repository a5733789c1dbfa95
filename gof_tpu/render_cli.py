"""Render train/test sets from a trained model (python -m gof_tpu.render_cli).

Replaces render.py:24-66: writes {model}/{split}/ours_{iter}/renders/NNNNN.png
and gt/NNNNN.png pairs for metrics.py.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def save_png(path: str, img_chw: np.ndarray) -> None:
    from PIL import Image

    arr = np.clip(np.asarray(img_chw), 0, 1)
    Image.fromarray((arr.transpose(1, 2, 0) * 255 + 0.5).astype(np.uint8)).save(path)


def render_set(scene, tp, gstate, model_cfg, pipe, bg, split: str, cams, iteration: int,
               interpret: bool = False, quiet: bool = False):
    import jax.numpy as jnp

    from . import train as train_lib

    base = os.path.join(model_cfg.model_path, split, f"ours_{iteration}")
    rdir = os.path.join(base, "renders")
    gdir = os.path.join(base, "gt")
    os.makedirs(rdir, exist_ok=True)
    os.makedirs(gdir, exist_ok=True)
    for idx, info in enumerate(cams):
        camera, gt = scene.camera(info)
        img = train_lib.render_eval(tp, gstate, camera, model_cfg, pipe, bg, interpret)
        save_png(os.path.join(rdir, f"{idx:05d}.png"), np.asarray(img[:3]))
        save_png(os.path.join(gdir, f"{idx:05d}.png"), gt)
        if not quiet and idx % 10 == 0:
            print(f"{split}: {idx + 1}/{len(cams)}")


def main(argv=None):
    from gof_tpu.utils import compile_cache
    compile_cache.enable()
    import jax

    from . import config as config_lib
    from . import train as train_lib
    from .data import scene as scene_lib

    parser = argparse.ArgumentParser(description="gof_tpu render")
    parser.add_argument("-m", "--model_path", required=True)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    ns = parser.parse_args(argv)
    if ns.cpu:
        jax.config.update("jax_platforms", "cpu")

    model_cfg, pipe, opt = config_lib.load_cfg(ns.model_path)
    model_cfg.model_path = ns.model_path
    iteration = ns.iteration if ns.iteration > 0 else _latest_iteration(ns.model_path)

    sc = scene_lib.Scene(
        model_cfg.source_path, "", images=model_cfg.images,
        resolution=model_cfg.resolution, white_background=model_cfg.white_background,
        eval_split=model_cfg.eval, shuffle=False,
    )
    ply_path = os.path.join(ns.model_path, "point_cloud", f"iteration_{iteration}", "point_cloud.ply")
    gauss, gstate = scene_lib.load_gaussians_ply(ply_path, model_cfg.sh_degree)
    from .model import appearance as app_lib

    app_net, app_emb = app_lib.init_appearance(jax.random.PRNGKey(0))
    tp = train_lib.TrainParams(gauss=gauss, app_net=app_net, app_emb=app_emb)

    import jax.numpy as jnp

    bg = jnp.asarray([1.0, 1.0, 1.0] if model_cfg.white_background else [0.0, 0.0, 0.0])
    if not ns.skip_train:
        render_set(sc, tp, gstate, model_cfg, pipe, bg, "train", sc.train_cameras,
                   iteration, interpret=ns.cpu)
    if not ns.skip_test and sc.test_cameras:
        render_set(sc, tp, gstate, model_cfg, pipe, bg, "test", sc.test_cameras,
                   iteration, interpret=ns.cpu)
    print("Rendering complete.")


def _latest_iteration(model_path: str) -> int:
    pc = os.path.join(model_path, "point_cloud")
    iters = [int(d.split("_")[1]) for d in os.listdir(pc) if d.startswith("iteration_")]
    return max(iters)


if __name__ == "__main__":
    main()
