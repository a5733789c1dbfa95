"""Decoupled appearance network (flax).

Replaces scene/appearance_network.py + L1_loss_appearance (train.py:67-88):
a per-view 64-d embedding (2048 slots, gaussian_model.py:114-116) and a CNN
that maps the x32-downsampled render + embedding to a full-resolution RGB
multiplier: conv(3+64 -> 256) -> 4x [pixel-shuffle x2 + conv + relu] ->
bilinear x2 -> conv 16 -> conv 3 -> sigmoid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

NUM_APPEARANCE_EMBEDDINGS = 2048
APPEARANCE_DIM = 64


def pixel_shuffle(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """[N, H, W, C*r^2] -> [N, H*r, W*r, C] (torch PixelShuffle semantics).

    torch shuffles from NCHW with channel blocks [C, r, r]; in NHWC that is a
    reshape to (..., C, r, r) then interleave.
    """
    n, h, w, c = x.shape
    r = factor
    c_out = c // (r * r)
    x = x.reshape(n, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r, w, r, c_out
    return x.reshape(n, h * r, w * r, c_out)


def bilinear_x2_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """x2 bilinear upsample with align_corners=True on [N, H, W, C]."""
    n, h, w, c = x.shape
    out_h, out_w = h * 2, w * 2

    def grid(out, size):
        if size == 1:
            return jnp.zeros((out,), jnp.float32)
        return jnp.arange(out, dtype=jnp.float32) * (size - 1) / (out - 1)

    gy = grid(out_h, h)
    gx = grid(out_w, w)
    y0 = jnp.floor(gy).astype(jnp.int32)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (gy - y0)[None, :, None, None]
    wx = (gx - x0)[None, None, :, None]
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    cc = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    return a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + cc * wy * (1 - wx) + d * wy * wx


class UpsampleBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = pixel_shuffle(x, 2)
        x = nn.Conv(self.out_channels, (3, 3), padding=1)(x)
        return nn.relu(x)


class AppearanceNetwork(nn.Module):
    """Input [N, H/32, W/32, 3+64] -> per-pixel RGB multiplier [N, H, W, 3]."""

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(256, (3, 3), padding=1)(x))
        x = UpsampleBlock(128)(x)
        x = UpsampleBlock(64)(x)
        x = UpsampleBlock(32)(x)
        x = UpsampleBlock(16)(x)
        x = bilinear_x2_align_corners(x)
        x = nn.relu(nn.Conv(16, (3, 3), padding=1)(x))
        x = nn.Conv(3, (3, 3), padding=1)(x)
        return nn.sigmoid(x)


def init_appearance(rng, height: int = 32, width: int = 32):
    """Returns (network params, embeddings [2048, 64])."""
    net = AppearanceNetwork()
    dummy = jnp.zeros((1, height // 32 * 0 + 2, 2, 3 + APPEARANCE_DIM))
    params = net.init(rng, dummy)
    k2 = jax.random.fold_in(rng, 1)
    # reference initializes the per-view embeddings with std=1e-4
    # (scene/gaussian_model.py:114-116: _appearance_embeddings = empty.normal_
    # scaled to 1e-4), so early appearance output starts near-neutral
    emb = jax.random.normal(k2, (NUM_APPEARANCE_EMBEDDINGS, APPEARANCE_DIM)) * 1e-4
    return params, emb


def bilinear_resize_align_corners(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """align_corners=True bilinear resize of [C, H, W]."""
    c, h, w = img.shape
    x = img.transpose(1, 2, 0)[None]

    def grid(out, size):
        if out == 1:
            return jnp.zeros((out,), jnp.float32)
        return jnp.arange(out, dtype=jnp.float32) * (size - 1) / (out - 1)

    gy = grid(out_h, h)
    gx = grid(out_w, w)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (gy - y0)[None, :, None, None]
    wx = (gx - x0)[None, None, :, None]
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    cc = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    out = a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + cc * wy * (1 - wx) + d * wy * wx
    return out[0].transpose(2, 0, 1)


def appearance_l1(image, gt, net_params, embeddings, view_idx, return_transformed=False):
    """L1 on the appearance-transformed render (L1_loss_appearance,
    train.py:67-88): 32-aligned center crop, x32 downsample, CNN multiplier."""
    C, origH, origW = image.shape
    H = origH // 32 * 32
    W = origW // 32 * 32
    top = origH // 2 - H // 2
    left = origW // 2 - W // 2
    crop = jax.lax.dynamic_slice(image, (0, top, left), (C, H, W))
    crop_gt = jax.lax.dynamic_slice(gt, (0, top, left), (C, H, W))
    down = bilinear_resize_align_corners(crop, H // 32, W // 32)
    emb = embeddings[view_idx]
    emb_map = jnp.broadcast_to(emb[None, None, :], (H // 32, W // 32, emb.shape[0]))
    inp = jnp.concatenate([down.transpose(1, 2, 0), emb_map], axis=-1)[None]
    mult = AppearanceNetwork().apply(net_params, inp)[0].transpose(2, 0, 1)  # [3, H, W]
    transformed = mult * crop
    if return_transformed:
        return bilinear_resize_align_corners(transformed, origH, origW)
    return jnp.mean(jnp.abs(transformed - crop_gt))
