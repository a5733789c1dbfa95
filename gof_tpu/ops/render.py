"""High-level render API.

Replaces gaussian_renderer/__init__.py:18-115 (`render`). One function from
model tensors + camera to the 9-channel image and densification side-outputs,
choosing between the Pallas production path and the XLA reference path.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import cameras as cameras_lib
from . import binning, quadrics, tiled_ref
from . import rasterize_pallas as rp


class RenderOut(NamedTuple):
    """Mirror of the reference render() dict (gaussian_renderer/__init__.py:112-115).

    image: [9, H, W] — rgb, normal, median depth, alpha, distortion.
    transmittance / depth_weight_sum / median_visit: auxiliary planes used by
      the backward pass and TSDF extraction.
    radii / visibility: densification bookkeeping (radii > 0 <=> binned).
    num_keys / overflow: binning capacity DEMAND (slots incl. one dead slot
      per culled gaussian, Binning.num_slots) for host-side growth/re-jit.
    """

    image: jnp.ndarray
    transmittance: jnp.ndarray
    radii: jnp.ndarray
    visibility: jnp.ndarray
    num_keys: jnp.ndarray
    overflow: jnp.ndarray
    # compact gradient-buffer telemetry (pallas backend): rows the backward
    # will store (live, pre-saturation slots) and whether they exceed the
    # static compact capacity (gradients would be clamped -> skip the step
    # and re-jit with a larger compact buffer, like key overflow)
    compact_demand: jnp.ndarray
    compact_overflow: jnp.ndarray
    # temporal-liveness telemetry (pallas backend; binning.compact_live):
    # live_counts[t] = chunks the forward actually walked in tile t (the
    # next visit's prefix bound); live_bad[t] = this tile was cut by a
    # STALE bound (truncated while unsaturated -> the render is wrong and
    # the step must be skipped); live_overflow/live_demand size the static
    # compacted-list capacity.
    live_counts: jnp.ndarray = None
    live_bad: jnp.ndarray = None
    live_overflow: jnp.ndarray = None
    live_demand: jnp.ndarray = None


def render(
    camera: cameras_lib.Camera,
    means3d: jnp.ndarray,
    scales: jnp.ndarray,  # 3D-filtered scales (gaussian_model.py:156-162)
    rotations: jnp.ndarray,
    opacities: jnp.ndarray,  # 3D-filtered opacities (gaussian_model.py:183-194)
    shs: jnp.ndarray,
    sh_degree: int,
    kernel_size: float,
    bg: jnp.ndarray,
    carrier: Optional[jnp.ndarray] = None,
    active_mask: Optional[jnp.ndarray] = None,
    capacity: int = 1 << 20,
    backend: str = "pallas",
    interpret: bool = False,
    with_stats: bool = True,
    with_reg: bool = True,
    compact_capacity: int = 0,
    live_limit_chunks: Optional[jnp.ndarray] = None,
    live_capacity: int = 0,
) -> RenderOut:
    """Render one view.

    Args:
      carrier: [P, 3] zeros; its gradient carries the densification stats
        (the reference's screenspace_points trick). Created if None.
      capacity: static duplicated-key budget (re-jit with larger on overflow).
      backend: 'pallas' (TPU production) or 'xla' (reference path, any device).
      with_reg: compile the regularization channels (normals/depth/distortion)
        and their gradients into the Pallas kernels. The train step sets False
        before the regularizers activate; those channels then render as zeros
        and MUST NOT receive nonzero cotangents.
    """
    P = means3d.shape[0]
    pre = quadrics.preprocess(
        means3d, scales, rotations, shs, sh_degree, camera, kernel_size, active_mask,
        opacities=opacities,
    )
    ntx, nty = binning.tile_grid(camera.width, camera.height)
    rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty,
                                   radius_xy=pre.radius_xy)
    # The 2D-dilation compensation is detached (its cov2D backward is disabled
    # in the reference, backward.cu:991-1007).
    op_eff = opacities * jnp.where(pre.valid, jax.lax.stop_gradient(pre.coef), 0.0)
    payload_cols = None
    if backend == "pallas":
        # deliver the blend payload in sorted-slot order THROUGH the binning
        # sorts (columns follow rasterize_pallas.build_payload16's layout:
        # rgb | op_eff | M row-major | u0, + conic | mean2d in the stats
        # phase); bin_gaussians stop_gradients them — rasterize's custom_vjp
        # computes the real parameter gradients from the reduce path.
        payload_cols = rp.payload_col_list(
            pre.rgb, op_eff, pre.v2g_M, pre.v2g_u0,
            conic=pre.conic if with_stats else None,
            mean2d=pre.mean2d if with_stats else None)
    b = binning.bin_gaussians(pre.depth, rects, ntx, nty, capacity,
                              mean2d=pre.mean2d, radius=pre.radius,
                              payload_cols=payload_cols)
    if carrier is None:
        carrier = jnp.zeros((P, 3), jnp.float32)

    if backend == "pallas":
        ntiles = ntx * nty
        use_live = live_limit_chunks is not None and live_capacity > 0
        if use_live:
            b_blend, truncated, live_overflow, live_demand = \
                binning.compact_live(b, live_limit_chunks, live_capacity, P)
        else:
            b_blend = b
        ccap = compact_capacity or rp.compact_capacity_for(
            int(b_blend.slot_to_gaussian.shape[0]), ntiles)
        meta = rp.RasterMeta(
            ntx=ntx, nty=nty, width=camera.width, height=camera.height,
            interpret=interpret, with_stats=with_stats, with_reg=with_reg,
            compact_cap=ccap,
        )
        tile_out = rp.rasterize(
            meta, pre.rgb, op_eff, pre.v2g_M, pre.v2g_u0,
            pre.conic, pre.mean2d, carrier, camera.focal_x, camera.focal_y, bg,
            b_blend,
        )
        last = jax.lax.stop_gradient(tile_out[ntiles - 1])
        compact_demand = (last[rp.CH_CSTART, 0]
                          + last[rp.CH_LIVEC, 0] * rp.CHUNK_SIZE).astype(jnp.int32)
        compact_overflow = compact_demand > ccap
        aux_tiles = jax.lax.stop_gradient(tile_out)
        live_counts = aux_tiles[:, rp.CH_LIVEC, 0].astype(jnp.int32)
        if use_live:
            # a tile cut by a stale bound while any of its pixels was still
            # unsaturated rendered (and differentiates) wrong — flag it.
            # Out-of-image padding pixels of edge tiles are masked out of the
            # transmittance max: they never saturate (nothing blends there),
            # and counting them would flag an exact edge-tile render as bad,
            # permanently losing culling on that tile.
            t_idx = jnp.arange(ntiles, dtype=jnp.int32)
            p_idx = jnp.arange(aux_tiles.shape[-1], dtype=jnp.int32)
            gy = ((t_idx // ntx) * binning.TILE_H)[:, None] + (p_idx // binning.TILE_W)[None, :]
            gx = ((t_idx % ntx) * binning.TILE_W)[:, None] + (p_idx % binning.TILE_W)[None, :]
            in_img = (gy < camera.height) & (gx < camera.width)
            tfin = jnp.where(in_img, aux_tiles[:, rp.CH_TFINAL, :], 0.0)
            unsat = jnp.max(tfin, axis=-1) >= rp.TRANSMITTANCE_EPS
            live_bad = truncated & unsat
        else:
            live_bad = jnp.zeros((ntiles,), bool)
            live_overflow = jnp.zeros((), bool)
            live_demand = jnp.zeros((), jnp.int32)
    elif backend == "xla":
        payload = tiled_ref.build_payload(pre.rgb, op_eff, pre.v2g_M, pre.v2g_u0, b)
        max_len = int(b.slot_to_gaussian.shape[0])  # static worst case
        tile_out = tiled_ref.render_tiles_xla(
            payload, b, ntx, nty, camera.width, camera.height,
            camera.focal_x, camera.focal_y, bg, max_len,
        )
        compact_demand = jnp.zeros((), jnp.int32)
        compact_overflow = jnp.zeros((), bool)
        live_counts = jnp.zeros((ntx * nty,), jnp.int32)
        live_bad = jnp.zeros((ntx * nty,), bool)
        live_overflow = jnp.zeros((), bool)
        live_demand = jnp.zeros((), jnp.int32)
    else:
        raise ValueError(f"unknown backend {backend!r}")

    full = tiled_ref.assemble_image(tile_out, ntx, nty, camera.width, camera.height)
    radii = jnp.where(pre.valid, pre.radius, 0.0)
    return RenderOut(
        image=full[:9],
        transmittance=full[rp.CH_TFINAL],
        radii=radii,
        visibility=radii > 0,
        num_keys=b.num_slots,
        overflow=b.overflow,
        compact_demand=compact_demand,
        compact_overflow=compact_overflow,
        live_counts=live_counts,
        live_bad=live_bad,
        live_overflow=live_overflow,
        live_demand=live_demand,
    )
