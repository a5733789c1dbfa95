"""TSDF mesh extraction CLI (python -m gof_tpu.extract_mesh_tsdf -m <model>).

Replaces extract_mesh_tsdf.py: renders median depth + alpha for every
training view, masks depth by accumulated alpha >= 0.5 (and the gt alpha
mask when the dataset provides one), fuses a TSDF and writes
{model}/test/ours_{iter}/tsdf/tsdf.ply. This is the mesh the DTU evaluation
consumes (evaluate_dtu_mesh.py:166-167).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    from gof_tpu.utils import compile_cache
    compile_cache.enable()
    import jax
    import jax.numpy as jnp

    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model_path", required=True)
    parser.add_argument("--iteration", type=int, default=30_000)
    # reference protocol (extract_mesh_tsdf.py:22-46 + Open3D defaults):
    # voxel 0.002, trunc 8 * voxel, depth range [1, 6], 16^3 blocks
    parser.add_argument("--voxel_size", type=float, default=0.002)
    parser.add_argument("--sdf_trunc", type=float, default=0.016)
    parser.add_argument("--depth_min", type=float, default=1.0)
    parser.add_argument("--depth_max", type=float, default=6.0)
    parser.add_argument("--block_res", type=int, default=16)
    parser.add_argument("--max_blocks", type=int, default=500_000)
    parser.add_argument("--dense", action="store_true",
                        help="dense z-slab grid instead of sparse blocks "
                             "(small scenes; capped at --max_dim per axis)")
    parser.add_argument("--max_dim", type=int, default=512)
    parser.add_argument("--no_color", action="store_true",
                        help="skip per-voxel color fusion")
    parser.add_argument("--cpu", action="store_true")
    ns = parser.parse_args(argv)
    if ns.cpu:
        jax.config.update("jax_platforms", "cpu")

    from . import config as config_lib
    from . import train as train_lib
    from .data import scene as scene_lib
    from .mesh import tsdf as tsdf_lib
    from .model import appearance as app_lib
    from .utils import ply

    model_cfg, pipe, opt = config_lib.load_cfg(ns.model_path)
    model_cfg.model_path = ns.model_path
    pc_dir = os.path.join(ns.model_path, "point_cloud")
    iteration = ns.iteration
    if not os.path.isdir(os.path.join(pc_dir, f"iteration_{iteration}")):
        iteration = max(int(d.split("_")[1]) for d in os.listdir(pc_dir))

    sc = scene_lib.Scene(
        model_cfg.source_path, "", images=model_cfg.images,
        resolution=model_cfg.resolution, white_background=model_cfg.white_background,
        eval_split=model_cfg.eval, shuffle=False,
    )
    gauss, gstate = scene_lib.load_gaussians_ply(
        os.path.join(pc_dir, f"iteration_{iteration}", "point_cloud.ply"),
        model_cfg.sh_degree,
    )
    app_net, app_emb = app_lib.init_appearance(jax.random.PRNGKey(0))
    tp = train_lib.TrainParams(gauss=gauss, app_net=app_net, app_emb=app_emb)
    bg = jnp.asarray([1.0, 1.0, 1.0] if model_cfg.white_background else [0.0, 0.0, 0.0])

    depths, colors, cams = [], [], []
    for info in sc.train_cameras:
        camera, _gt = sc.camera(info)
        img = train_lib.render_eval(tp, gstate, camera, model_cfg, pipe, bg, ns.cpu)
        depth = np.asarray(img[6])
        alpha = np.asarray(img[7])
        depth = np.where(alpha >= 0.5, depth, 0.0)  # extract_mesh_tsdf.py:38-40
        if info.alpha is not None:
            from PIL import Image

            m = info.alpha
            if m.shape != depth.shape:
                m = np.asarray(
                    Image.fromarray((m * 255).astype(np.uint8)).resize(
                        (depth.shape[1], depth.shape[0])
                    ),
                    np.float32,
                ) / 255.0
            depth = np.where(m > 0.5, depth, 0.0)
        depths.append(depth)
        colors.append(np.asarray(img[:3]))
        cams.append(camera)

    out_dir = os.path.join(ns.model_path, "test", f"ours_{iteration}", "tsdf")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "tsdf.ply")
    if not ns.dense:
        # sparse block grid at the reference protocol (no dimension cap)
        blocks = tsdf_lib.discover_blocks(
            depths, cams, ns.voxel_size, ns.block_res, ns.sdf_trunc,
            ns.depth_min, ns.depth_max, ns.max_blocks)
        print(f"TSDF blocks: {len(blocks)} x {ns.block_res}^3 voxels "
              f"(voxel {ns.voxel_size})")
        tsdf, weight, color = tsdf_lib.fuse_blocks(
            depths, None if ns.no_color else colors, cams, blocks,
            ns.voxel_size, ns.block_res, ns.sdf_trunc, ns.depth_min,
            ns.depth_max)
        verts, faces, vcol = tsdf_lib.blocks_to_mesh(
            tsdf, weight, color, blocks, ns.voxel_size, ns.block_res)
        props = {"x": verts[:, 0], "y": verts[:, 1], "z": verts[:, 2]}
        if vcol is not None:
            c8 = (np.clip(vcol, 0, 1) * 255).astype(np.uint8)
            props.update(red=c8[:, 0], green=c8[:, 1], blue=c8[:, 2])
        ply.write_ply(out, props, faces=faces)
    else:
        # grid bounds from the active gaussians (with a margin)
        act = np.asarray(gstate.active)
        xyz = np.asarray(gauss.xyz)[act]
        # a non-finite gaussian (pruned on the next densify, but possibly
        # alive in a snapshot) would poison min/max into a negative grid
        xyz = xyz[np.isfinite(xyz).all(axis=1)]
        lo = xyz.min(axis=0) - 4 * ns.voxel_size
        hi = xyz.max(axis=0) + 4 * ns.voxel_size
        voxel = ns.voxel_size
        dims = np.minimum(np.ceil((hi - lo) / voxel).astype(int) + 1, ns.max_dim)
        # grow the voxel if the grid would exceed max_dim
        voxel = float(max((hi - lo) / np.maximum(dims - 1, 1)))
        dims = tuple(int(d) for d in np.ceil((hi - lo) / voxel).astype(int) + 1)
        print(f"TSDF grid {dims} voxel {voxel:.4f}")
        tsdf, weight = tsdf_lib.fuse_depth_maps(
            depths, cams, lo.astype(np.float32), voxel, dims, ns.sdf_trunc,
            ns.depth_min, ns.depth_max,
        )
        verts, faces = tsdf_lib.grid_to_mesh(tsdf, weight, lo.astype(np.float32), voxel)
        ply.write_ply(out, {"x": verts[:, 0], "y": verts[:, 1], "z": verts[:, 2]}, faces=faces)
    print(f"TSDF mesh: {len(verts)} verts, {len(faces)} faces -> {out}")


if __name__ == "__main__":
    main()
