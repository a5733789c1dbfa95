"""Create a tiny Blender-format synthetic scene rendered by the oracle.

Ground-truth images come from a known Gaussian set, so training losses are
realizable and convergence tests have a well-defined target (the analog of
the reference's tiny-scene sanity workflow, SURVEY.md §4 implication (c)).
"""

from __future__ import annotations

import json
import os

import numpy as np


def make_scene(
    root: str,
    n_gaussians: int = 24,
    n_views: int = 10,
    size: int = 64,
    fovx: float = 0.9,
    seed: int = 0,
    white_background: bool = False,
):
    import jax.numpy as jnp
    from PIL import Image

    from gof_tpu import cameras
    from gof_tpu.ops import oracle
    from gof_tpu.sh import rgb_to_sh_dc
    from gof_tpu.utils import ply

    rng = np.random.default_rng(seed)
    # Gaussians in a ball of radius 1 around the origin
    means = rng.normal(size=(n_gaussians, 3)).astype(np.float32) * 0.5
    scales = (rng.uniform(0.08, 0.2, size=(n_gaussians, 3))).astype(np.float32)
    q = rng.normal(size=(n_gaussians, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    colors = rng.uniform(0.1, 0.9, size=(n_gaussians, 3)).astype(np.float32)
    opac = rng.uniform(0.6, 0.95, size=n_gaussians).astype(np.float32)
    shs = rgb_to_sh_dc(jnp.asarray(colors))[:, None, :]
    bg = jnp.ones(3) if white_background else jnp.zeros(3)

    os.makedirs(root, exist_ok=True)
    frames = []
    for v in range(n_views):
        theta = 2 * np.pi * v / n_views
        eye = np.array([3.5 * np.sin(theta), 1.2, 3.5 * np.cos(theta)])
        cam = cameras.look_at_camera(eye=eye, target=(0, 0, 0), fovx=fovx,
                                     width=size, height=size, uid=v)
        out = oracle.render_oracle(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
            jnp.asarray(opac), shs, 0, cam, 0.1, bg,
        )
        img = np.clip(np.asarray(out.image[:3]).transpose(1, 2, 0), 0, 1)
        alpha = np.clip(np.asarray(out.image[7]), 0, 1)
        rgba = np.concatenate([img, alpha[..., None]], axis=-1)
        Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(
            os.path.join(root, f"r_{v}.png")
        )
        # blender json stores camera-to-world in OpenGL convention
        w2v = np.asarray(cam.world_view)
        c2w = np.linalg.inv(w2v)
        c2w[:3, 1:3] *= -1
        frames.append({"file_path": f"r_{v}", "transform_matrix": c2w.tolist()})

    meta = {"camera_angle_x": fovx, "frames": frames}
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "transforms_test.json"), "w") as f:
        json.dump({"camera_angle_x": fovx, "frames": frames[:2]}, f)

    # init point cloud: jittered true means (so capacity stays small)
    n_init = n_gaussians * 4
    pts = means[rng.integers(0, n_gaussians, n_init)] + rng.normal(size=(n_init, 3)).astype(np.float32) * 0.1
    cols = (rng.random((n_init, 3)) * 255).astype(np.uint8)
    ply.write_ply(
        os.path.join(root, "points3d.ply"),
        {
            "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
            "red": cols[:, 0], "green": cols[:, 1], "blue": cols[:, 2],
        },
    )
    return {"means": means, "scales": scales, "rots": q, "colors": colors, "opacities": opac}


def make_multiscale_scene(
    root: str,
    n_gaussians: int = 16,
    n_views: int = 4,
    base_size: int = 64,
    n_scales: int = 2,
    fovx: float = 0.9,
    seed: int = 0,
):
    """Multi-scale scene in the metadata.json format (the reference's
    multi-scale Blender layout, dataset_readers.py:262-344): each view is
    stored at `n_scales` consecutive resolutions (every 4th entry is the
    full-res copy the non-allres path uses — here scales cycle with period
    4 like the real data, padding with repeats when n_scales < 4)."""
    import jax.numpy as jnp
    from PIL import Image

    from gof_tpu import cameras
    from gof_tpu.ops import oracle
    from gof_tpu.sh import rgb_to_sh_dc
    from gof_tpu.utils import ply

    rng = np.random.default_rng(seed)
    means = rng.normal(size=(n_gaussians, 3)).astype(np.float32) * 0.5
    scales = (rng.uniform(0.08, 0.2, size=(n_gaussians, 3))).astype(np.float32)
    q = rng.normal(size=(n_gaussians, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    colors = rng.uniform(0.1, 0.9, size=(n_gaussians, 3)).astype(np.float32)
    opac = rng.uniform(0.6, 0.95, size=n_gaussians).astype(np.float32)
    shs = rgb_to_sh_dc(jnp.asarray(colors))[:, None, :]
    bg = jnp.zeros(3)

    os.makedirs(root, exist_ok=True)
    d = {"file_path": [], "cam2world": [], "width": [], "height": [],
         "focal": []}
    # period-4 scale cycle, as in the real multi-scale data
    scale_cycle = [min(s, n_scales - 1) for s in range(4)]
    for v in range(n_views):
        theta = 2 * np.pi * v / n_views
        eye = np.array([3.5 * np.sin(theta), 1.2, 3.5 * np.cos(theta)])
        for slot, sidx in enumerate(scale_cycle):
            size = base_size >> sidx
            cam = cameras.look_at_camera(eye=eye, target=(0, 0, 0), fovx=fovx,
                                         width=size, height=size,
                                         uid=v * 4 + slot)
            out = oracle.render_oracle(
                jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                jnp.asarray(opac), shs, 0, cam, 0.1, bg)
            img = np.clip(np.asarray(out.image[:3]).transpose(1, 2, 0), 0, 1)
            alpha = np.clip(np.asarray(out.image[7]), 0, 1)
            rgba = np.concatenate([img, alpha[..., None]], axis=-1)
            fn = f"train_{v}_{slot}.png"
            Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(
                os.path.join(root, fn))
            w2v = np.asarray(cam.world_view)
            c2w = np.linalg.inv(w2v)
            c2w[:3, 1:3] *= -1
            focal = size / (2 * np.tan(fovx / 2))
            d["file_path"].append(fn)
            d["cam2world"].append(c2w.tolist())
            d["width"].append(size)
            d["height"].append(size)
            d["focal"].append(focal)
    with open(os.path.join(root, "metadata.json"), "w") as f:
        json.dump({"train": d}, f)
    n_init = n_gaussians * 4
    pts = means[rng.integers(0, n_gaussians, n_init)] \
        + rng.normal(size=(n_init, 3)).astype(np.float32) * 0.1
    cols = (rng.random((n_init, 3)) * 255).astype(np.uint8)
    ply.write_ply(
        os.path.join(root, "points3d.ply"),
        {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
         "red": cols[:, 0], "green": cols[:, 1], "blue": cols[:, 2]},
    )


if __name__ == "__main__":
    import sys

    make_scene(sys.argv[1] if len(sys.argv) > 1 else "/tmp/gof_synth")
    print("scene written")
