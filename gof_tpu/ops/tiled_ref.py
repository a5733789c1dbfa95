"""Tiled XLA reference renderer.

Renders through the *same* binning + payload + per-tile chunked blend
pipeline as the Pallas kernels, but in plain jnp (vmapped over tiles, dense
per-tile Gaussian lists). It is:

- the spec for the Pallas kernel (same tile layout, same chunk math,
  bit-comparable up to reduction order);
- differentiable end-to-end via autodiff, giving reference gradients for the
  hand-written Pallas backward;
- a CPU-runnable fallback for tests.

Memory is O(ntiles * max_tile_len * TILE_PIXELS): test scale only.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import TILE_PIXELS, TILE_W
from . import blend
from .binning import Binning

# Forward payload column layout, shared with the Pallas kernels:
# 0:3 rgb | 3 op_eff | 4:13 M row-major | 13:16 u0
PAYLOAD_COLS = 16
# Auxiliary (backward-only) columns: 0:3 conic | 3:5 mean2d | 5:8 pad
AUX_COLS = 8


def build_payload(rgb, op_eff, M, u0, binning: Binning) -> jnp.ndarray:
    """Gather per-Gaussian data into the chunk-aligned slot layout.

    Invalid slots (gaussian id == P) gather the appended zero row, so their
    opacity is 0 and they blend to nothing.
    """
    P = rgb.shape[0]
    flat = jnp.concatenate([rgb, op_eff[:, None], M.reshape(P, 9), u0], axis=1)
    flat = jnp.concatenate([flat, jnp.zeros((1, PAYLOAD_COLS), flat.dtype)], axis=0)
    return flat[binning.slot_to_gaussian]


def tile_rays(ntx: int, nty: int, width: int, height: int, focal_x, focal_y):
    """Per-tile pixel ray slopes, [NTILES, TILE_PIXELS].

    Lane l of tile (ty, tx) is pixel (ty*32 + l // 32, tx*32 + l % 32).
    """
    l = jnp.arange(TILE_PIXELS, dtype=jnp.float32)
    lx = l % TILE_W
    ly = l // TILE_W
    tx = jnp.arange(ntx, dtype=jnp.float32) * TILE_W
    ty = jnp.arange(nty, dtype=jnp.float32) * TILE_H_F
    px = (tx[None, :, None] + lx[None, None, :] + 0.5 - width / 2.0) / focal_x
    py = (ty[:, None, None] + ly[None, None, :] + 0.5 - height / 2.0) / focal_y
    rx = jnp.broadcast_to(px, (nty, ntx, TILE_PIXELS)).reshape(-1, TILE_PIXELS)
    ry = jnp.broadcast_to(py, (nty, ntx, TILE_PIXELS)).reshape(-1, TILE_PIXELS)
    return rx, ry


TILE_H_F = float(TILE_W)  # square tiles


class TileImage(NamedTuple):
    """Raw per-tile kernel outputs, [NTILES, 16, TILE_PIXELS].

    Channels 0..8 match the reference's 9-channel image; 9: final
    transmittance; 10: final sum(w*m) (for the distortion backward);
    11: median-visit index (float, -1 if none); 12..15: zero padding.
    """

    data: jnp.ndarray


OUT_CH = 16
CH_TFINAL = 9
CH_DFINAL = 10
CH_MEDIDX = 11


def blend_tile(payload_tile: jnp.ndarray, rx: jnp.ndarray, ry: jnp.ndarray, bg: jnp.ndarray):
    """Blend one tile's full (padded) Gaussian list. payload_tile: [L, 16]."""
    p = payload_tile
    terms = blend.ray_terms(
        p[:, 4:5], p[:, 5:6], p[:, 6:7],
        p[:, 7:8], p[:, 8:9], p[:, 9:10],
        p[:, 10:11], p[:, 11:12], p[:, 12:13],
        p[:, 13:14], p[:, 14:15], p[:, 15:16],
        p[:, 3:4],
        rx[None, :], ry[None, :],
    )
    carry = blend.init_carry(rx.shape[0])
    carry = blend.blend_chunk(carry, terms, p[:, 0:3])
    img = blend.finalize(carry, bg)  # [9, PIX]

    # median visit index for the backward depth-gradient routing
    from ..constants import MEDIAN_THRESHOLD

    a = terms.alpha
    one_minus = 1.0 - a
    prod_incl = jnp.cumprod(one_minus, axis=0)
    T = jnp.concatenate([jnp.ones_like(prod_incl[:1]), prod_incl[:-1]], axis=0)
    med_mask = (a > 0) & (T > MEDIAN_THRESHOLD)
    g_idx = jnp.arange(a.shape[0], dtype=jnp.int32)[:, None]
    med_idx = jnp.max(jnp.where(med_mask, g_idx, -1), axis=0).astype(jnp.float32)

    extra = jnp.stack(
        [carry.transmittance, carry.dist1, med_idx, jnp.zeros_like(med_idx)], axis=0
    )
    pad = jnp.zeros((OUT_CH - 9 - 4, rx.shape[0]), img.dtype)
    return jnp.concatenate([img, extra, pad], axis=0)  # [16, PIX]


def render_tiles_xla(
    payload: jnp.ndarray,
    binning: Binning,
    ntx: int,
    nty: int,
    width: int,
    height: int,
    focal_x,
    focal_y,
    bg: jnp.ndarray,
    max_tile_len: int,
) -> jnp.ndarray:
    """Render all tiles densely; returns [NTILES, 16, TILE_PIXELS].

    max_tile_len: static padded per-tile list length (>= max over tiles of
    tile_chunks * CHUNK_SIZE).
    """
    ntiles = ntx * nty
    seg_start = binning.bounds[:-1]
    seg_len = binning.bounds[1:] - seg_start
    idx = seg_start[:, None] + jnp.arange(max_tile_len, dtype=jnp.int32)[None, :]
    in_range = jnp.arange(max_tile_len, dtype=jnp.int32)[None, :] < seg_len[:, None]
    idx = jnp.clip(idx, 0, payload.shape[0] - 1)
    ptile = payload[idx]  # [NTILES, L, 16]
    ptile = jnp.where(in_range[..., None], ptile, 0.0)

    rx, ry = tile_rays(ntx, nty, width, height, focal_x, focal_y)
    out = jax.vmap(blend_tile, in_axes=(0, 0, 0, None))(ptile, rx, ry, bg)
    return out


def assemble_image(tile_out: jnp.ndarray, ntx: int, nty: int, width: int, height: int) -> jnp.ndarray:
    """[NTILES, C, TILE_PIXELS] -> [C, H, W] crop."""
    C = tile_out.shape[1]
    img = tile_out.reshape(nty, ntx, C, TILE_W, TILE_W)
    img = img.transpose(2, 0, 3, 1, 4).reshape(C, nty * TILE_W, ntx * TILE_W)
    return img[:, :height, :width]
