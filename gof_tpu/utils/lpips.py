"""LPIPS perceptual metric (VGG16 backbone) in flax.

Replaces the vendored lpipsPyTorch/ (183 LoC). The metric needs pretrained
VGG16 + LPIPS linear-head weights; this environment has no network egress and
ships no torchvision checkpoints, so `lpips_fn(...)` is only available when a
weights file is supplied (metrics report LPIPS = null otherwise).

Weights format: an .npz with torchvision VGG16 conv weights under
`features.{idx}.weight/bias` (OIHW) and LPIPS heads under `lin{k}.model.1.weight`,
convertible from the official checkpoints with `convert_torch_weights`.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG16 conv layout: (out_channels, layers-per-block); LPIPS taps the relu
# after each block (features 3, 8, 15, 22, 29 in torchvision indexing).
_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x):  # x: [N, H, W, 3] in [-1, 1] (LPIPS convention)
        taps = []
        for b, (ch, n_layers) in enumerate(_BLOCKS):
            for l in range(n_layers):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{b}_{l}")(x)
                x = nn.relu(x)
            taps.append(x)
            if b < len(_BLOCKS) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def _normalize(feat):
    return feat / jnp.sqrt(jnp.sum(feat**2, axis=-1, keepdims=True) + 1e-10)


def lpips(params, lin_weights, img0, img1):
    """img*: [3, H, W] in [0, 1]. Returns the scalar LPIPS distance."""
    def prep(im):
        x = im.transpose(1, 2, 0)[None] * 2.0 - 1.0
        return (x - _SHIFT) / _SCALE

    f0 = VGG16Features().apply(params, prep(img0))
    f1 = VGG16Features().apply(params, prep(img1))
    total = 0.0
    for k, (a, b) in enumerate(zip(f0, f1)):
        d = (_normalize(a) - _normalize(b)) ** 2  # [1, H, W, C]
        w = lin_weights[k]  # [C] nonnegative 1x1-conv weights
        total = total + jnp.mean(jnp.sum(d * w[None, None, None, :], axis=-1))
    return total


def load_weights(path: str):
    """Load converted .npz weights -> (flax params, list of head weights)."""
    data = np.load(path)
    # torchvision conv indices for VGG16.features
    conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    params = {"params": {}}
    ci = 0
    for b, (ch, n_layers) in enumerate(_BLOCKS):
        for l in range(n_layers):
            w = data[f"features.{conv_ids[ci]}.weight"]  # OIHW
            bbias = data[f"features.{conv_ids[ci]}.bias"]
            params["params"][f"conv{b}_{l}"] = {
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),  # HWIO
                "bias": jnp.asarray(bbias),
            }
            ci += 1
    lins = [jnp.asarray(data[f"lin{k}.model.1.weight"].reshape(-1)) for k in range(5)]
    return params, lins


def lpips_fn(weights_path: Optional[str]):
    """Returns a jitted lpips(img0, img1) or None when weights are missing."""
    import os

    if not weights_path or not os.path.exists(weights_path):
        return None
    import jax

    params, lins = load_weights(weights_path)
    return jax.jit(lambda a, b: lpips(params, lins, a, b))


def convert_torch_weights(vgg_pth: str, lpips_pth: str, out_npz: str):
    """Offline converter from the official torch checkpoints."""
    import torch

    vgg = torch.load(vgg_pth, map_location="cpu")
    lin = torch.load(lpips_pth, map_location="cpu")
    out = {k: v.numpy() for k, v in vgg.items() if k.startswith("features.")}
    out.update({k: v.numpy() for k, v in lin.items() if k.startswith("lin")})
    np.savez(out_npz, **out)
