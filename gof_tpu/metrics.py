"""Image metrics over rendered sets (python -m gof_tpu.metrics -m <model>).

Replaces metrics.py: walks {model}/{split}/ours_*/renders vs gt, computes
PSNR / SSIM (and LPIPS-VGG when pretrained weights are available — this
environment has no torchvision weights, so LPIPS is reported as null), and
writes results.json + per_view.json in the reference's format.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _load(path):
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32).transpose(2, 0, 1) / 255.0


def evaluate_dir(base: str, lpips_weights: str = ""):
    import jax
    import jax.numpy as jnp

    from .utils import losses
    from .utils.lpips import lpips_fn

    rdir = os.path.join(base, "renders")
    gdir = os.path.join(base, "gt")
    names = sorted(os.listdir(rdir))
    psnrs, ssims, lpipss, per_view = [], [], [], {}
    ssim_j = jax.jit(losses.ssim)
    psnr_j = jax.jit(losses.psnr)
    # weights resolve: explicit flag > GOF_LPIPS_WEIGHTS env; when absent the
    # output is SELF-DESCRIBING (LPIPS null + reason) rather than silently
    # incomplete — see scripts/convert_lpips_weights.py for the offline
    # conversion recipe (this image ships no torchvision checkpoints)
    lpips_weights = lpips_weights or os.environ.get("GOF_LPIPS_WEIGHTS", "")
    lp = lpips_fn(lpips_weights)
    for name in names:
        r = jnp.asarray(_load(os.path.join(rdir, name)))
        g = jnp.asarray(_load(os.path.join(gdir, name)))
        p = float(psnr_j(r, g))
        s = float(ssim_j(r, g))
        l = float(lp(r, g)) if lp is not None else None
        psnrs.append(p)
        ssims.append(s)
        if l is not None:
            lpipss.append(l)
        per_view[name] = {"PSNR": p, "SSIM": s, "LPIPS": l}
    out = {
        "PSNR": float(np.mean(psnrs)),
        "SSIM": float(np.mean(ssims)),
        "LPIPS": float(np.mean(lpipss)) if lpipss else None,
        "per_view": per_view,
    }
    if not lpipss:
        out["LPIPS_reason"] = (
            "weights unavailable: convert with scripts/convert_lpips_weights"
            ".py and pass --lpips_weights or set GOF_LPIPS_WEIGHTS")
    return out


def main(argv=None):
    from gof_tpu.utils import compile_cache
    compile_cache.enable()
    import jax

    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model_paths", nargs="+", required=True)
    parser.add_argument("--lpips_weights", default="", help="converted VGG16+LPIPS .npz")
    parser.add_argument("--cpu", action="store_true")
    ns = parser.parse_args(argv)
    if ns.cpu:
        jax.config.update("jax_platforms", "cpu")

    for mp in ns.model_paths:
        full = {}
        per_view_all = {}
        test_dir = os.path.join(mp, "test")
        if not os.path.isdir(test_dir):
            print(f"{mp}: no test renders")
            continue
        for method in sorted(os.listdir(test_dir)):
            res = evaluate_dir(os.path.join(test_dir, method), ns.lpips_weights)
            pv = res.pop("per_view")
            full[method] = res
            per_view_all[method] = pv
            print(f"{mp} {method}: PSNR {res['PSNR']:.3f}  SSIM {res['SSIM']:.4f}")
        with open(os.path.join(mp, "results.json"), "w") as f:
            json.dump(full, f, indent=2)
        with open(os.path.join(mp, "per_view.json"), "w") as f:
            json.dump(per_view_all, f, indent=2)


if __name__ == "__main__":
    main()
