"""Opacity-field evaluation at arbitrary 3D points.

TPU-native replacement for the integrate path (integrateCUDA,
forward.cu:722-1272; Rasterizer::integrate, rasterizer_impl.cu:530-792).
Semantics per query point p in a view:

  project p -> continuous pixel; ray r = (x/z, y/z, 1) in view space;
  over the Gaussians binned to that pixel's tile (depth order):
    t*    = min(t_peak, depth(p))        (forward.cu:1173-1176)
    alpha = min(0.99, op * exp(-0.5 |u0 + t* d|^2)), skipped below 1/255
    T    *= 1 - alpha                     (no early termination)
  alpha_integrated(p) = 1 - T; points that project into no pixel keep
  alpha_integrated = 0 (the CUDA buffer is initialized to alpha=1 i.e. T=1,
  rasterize_points.cu:277).

Deviations (documented): the CUDA two-pass contributor recording
(MAX_NUM_CONTRIBUTORS, forward.cu:866-993) only *prunes* Gaussians whose
alpha at the pixel-center/corner rays is < 1/255 or that lie beyond the pixel
ray's saturation point; we evaluate the full tile list instead (a superset —
differences are bounded by the 1/255 cutoff). We keep the t_peak > NEAR_PLANE
pruning that pass 1 applies.

The kernel reuses the rasterizer's layout: query points are binned to tiles
in 1024-lane blocks, Gaussians stream through the same (tile, depth)-sorted
payload with unaligned segments (head/tail masking), and the per-chunk
linear algebra rides the MXU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import ALPHA_MAX, ALPHA_MIN, NEAR_PLANE, TILE_H, TILE_W
from . import binning as binning_lib
from .binning import CHUNK_SIZE, AlignedBins, Binning
from .rasterize_pallas import (P_COLS, _chunk_geometry, _cumprod_incl,
                               _geometry_basis, _transpose_mxu)

PBLOCK = 1024  # query points per kernel block (lane dimension)


class PointBins(NamedTuple):
    bins: AlignedBins  # point binning (block = PBLOCK)
    n_blocks: int  # static block-count bound
    block_tile: jnp.ndarray  # [B] tile id per block (padding blocks hold 0)
    block_ofs: jnp.ndarray  # [B] block index into the padded point slots
    block_real: jnp.ndarray  # [B] bool: block is backed by real points
    rx: jnp.ndarray  # [PCAP_PAD] per-slot ray slopes / depth / valid
    ry: jnp.ndarray
    depth: jnp.ndarray
    point_of_slot: jnp.ndarray  # [PCAP_PAD] original point index (N = pad)


def bin_points(points: jnp.ndarray, camera, ntx: int, nty: int, capacity: int) -> PointBins:
    """Bin query points to tiles (one tile per point), PBLOCK-aligned."""
    from ..transforms import ndc_to_pixel, project_points

    N = points.shape[0]
    wv = camera.world_view
    pv = points @ wv[:3, :3].T + wv[:3, 3]
    z = pv[:, 2]
    valid = z > 1e-4
    zs = jnp.where(valid, z, 1.0)
    rx = pv[:, 0] / zs
    ry = pv[:, 1] / zs
    ndc = project_points(points, camera.full_proj)
    px = ndc_to_pixel(ndc[:, 0], camera.width)
    py = ndc_to_pixel(ndc[:, 1], camera.height)
    inside = (px >= 0) & (px < camera.width) & (py >= 0) & (py < camera.height)
    valid = valid & inside

    ntiles = ntx * nty
    tx = jnp.clip((px / TILE_W).astype(jnp.int32), 0, ntx - 1)
    ty = jnp.clip((py / TILE_H).astype(jnp.int32), 0, nty - 1)
    tile_of_point = jnp.where(valid, ty * ntx + tx, ntiles)
    b = binning_lib.bin_items_aligned(tile_of_point, ntiles, capacity, block=PBLOCK)

    # per-slot point data (zero rows for padding; point index N for padding)
    def gather(x, fill=0.0):
        ext = jnp.concatenate([x, jnp.full((1,), fill, x.dtype)])
        return ext[jnp.minimum(b.slot_to_item, N)]

    blocks_cum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(b.tile_blocks).astype(jnp.int32)]
    )
    n_blocks = capacity // PBLOCK + ntiles
    bid = jnp.arange(n_blocks, dtype=jnp.int32)
    t_of_b = jnp.searchsorted(blocks_cum, bid, side="right").astype(jnp.int32) - 1
    t_of_b = jnp.clip(t_of_b, 0, ntiles - 1)
    real = bid < blocks_cum[-1]
    block_tile = jnp.where(real, t_of_b, 0)
    # tile_start is the padded start in slots; convert to PBLOCK units
    block_ofs = jnp.where(real, b.tile_start[t_of_b] // PBLOCK + (bid - blocks_cum[t_of_b]), 0)

    return PointBins(
        bins=b,
        n_blocks=int(n_blocks),
        block_tile=block_tile,
        block_ofs=block_ofs.astype(jnp.int32),
        block_real=real,
        rx=gather(rx),
        ry=gather(ry),
        depth=gather(z),
        point_of_slot=jnp.minimum(b.slot_to_item, N),
    )


def _integrate_kernel(block_ofs_ref, bseg_s_ref, bseg_e_ref,
                      prays_ref, payload_hbm, out_ref, pbuf, sem):
    del block_ofs_ref  # consumed by the prays index map
    bid = pl.program_id(0)
    seg_s = bseg_s_ref[bid]
    seg_e = bseg_e_ref[bid]
    base = pl.multiple_of((seg_s // CHUNK_SIZE) * CHUNK_SIZE, CHUNK_SIZE)
    nc = jnp.where(seg_e > seg_s, (seg_e - base + CHUNK_SIZE - 1) // CHUNK_SIZE, 0)

    rx = prays_ref[0:1, :]
    ry = prays_ref[1:2, :]
    depth = prays_ref[2:3, :]
    R3 = jnp.concatenate([rx, ry, jnp.ones_like(rx)], axis=0)
    basis3 = _geometry_basis(R3)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK_SIZE, 1), 0)

    def copy_in(c, slot):
        return pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(base + c * CHUNK_SIZE, CHUNK_SIZE)],
            pbuf.at[slot],
            sem.at[slot],
        )

    @pl.when(nc > 0)
    def _():
        copy_in(0, 0).start()

    def body(c, T):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nc)
        def _():
            copy_in(c + 1, jax.lax.rem(c + 1, 2)).start()

        copy_in(c, slot).wait()
        p = _transpose_mxu(pbuf[slot])  # [16, CHUNK] -> [CHUNK, 16]
        grow = base + c * CHUNK_SIZE + row_i
        seg_mask = (grow >= seg_s) & (grow < seg_e)
        d0, d1, d2, _, _, _, _, _, t = _chunk_geometry(p, basis3)
        # clamp the evaluation depth to the query point (forward.cu:1173-1176)
        t_star = jnp.minimum(t, depth)
        v0 = p[:, 13:14] + t_star * d0
        v1 = p[:, 14:15] + t_star * d1
        v2 = p[:, 15:16] + t_star * d2
        mv = v0 * v0 + v1 * v1 + v2 * v2
        a = jnp.minimum(ALPHA_MAX, p[:, 3:4] * jnp.exp(-0.5 * mv))
        # pass-1 pruning kept: peak must be in front of the near plane
        a = jnp.where((t > NEAR_PLANE) & (a >= ALPHA_MIN) & seg_mask, a, 0.0)
        prod = _cumprod_incl(1.0 - a)
        return T * prod[CHUNK_SIZE - 1 : CHUNK_SIZE]

    T = jax.lax.fori_loop(0, nc, body, jnp.ones((1, PBLOCK), jnp.float32))
    # Mosaic requires the block's sublane dim to be a multiple of 8: the
    # output carries 8 identical rows per point-block and the caller reads
    # row 0.
    out_ref[0, :, :] = jnp.broadcast_to(T, (8, PBLOCK))


def integrate_transmittance_pallas(
    payload: jnp.ndarray,  # [16, CAP] gaussian payload (rasterizer layout)
    gauss_bins: Binning,
    pbins: PointBins,
    n_points: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-point transmittance T in one view; 1.0 for unprojected points."""
    prays = jnp.stack([pbins.rx, pbins.ry, pbins.depth], axis=0)  # [3, PCAP_PAD]
    pad = jnp.zeros((5, prays.shape[1]), prays.dtype)
    prays = jnp.concatenate([prays, pad], axis=0)  # [8, PCAP_PAD] for tiling

    B = pbins.n_blocks
    # per-block gaussian segment bounds (padding blocks get an empty segment)
    bseg_s = jnp.where(pbins.block_real, gauss_bins.bounds[pbins.block_tile], 0)
    bseg_e = jnp.where(pbins.block_real, gauss_bins.bounds[pbins.block_tile + 1], 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (8, PBLOCK),
                lambda b, bo, bs, be: (0, bo[b]),
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8, PBLOCK), lambda b, bo, bs, be: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, P_COLS, CHUNK_SIZE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _integrate_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 8, PBLOCK), jnp.float32),
        interpret=interpret,
    )(pbins.block_ofs, bseg_s.astype(jnp.int32), bseg_e.astype(jnp.int32),
      prays, payload)[:, 0, :]

    # scatter back to point order: slot s (block b, lane l) holds point
    # point_of_slot[block_ofs[b]*PBLOCK + l]; padding blocks are dropped.
    flat_slots = (pbins.block_ofs[:, None] * PBLOCK
                  + jnp.arange(PBLOCK, dtype=jnp.int32)[None, :]).reshape(-1)
    in_arr = flat_slots < pbins.point_of_slot.shape[0]
    pid = pbins.point_of_slot[jnp.clip(flat_slots, 0, pbins.point_of_slot.shape[0] - 1)]
    keep = jnp.broadcast_to(pbins.block_real[:, None], (B, PBLOCK)).reshape(-1) & in_arr
    pid = jnp.where(keep, pid, n_points)
    Tvals = out.reshape(-1)
    result = jnp.ones((n_points + 1,), jnp.float32)
    result = result.at[pid].set(jnp.where(keep, Tvals, 1.0), mode="drop")
    return result[:n_points]


def integrate_transmittance_dense(
    points: jnp.ndarray,
    camera,
    op_eff: jnp.ndarray,
    M: jnp.ndarray,
    u0: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Dense O(N*P) reference: transmittance of each point in one view (no
    tile culling)."""
    wv = camera.world_view
    pv = points @ wv[:3, :3].T + wv[:3, 3]
    z = pv[:, 2]
    ok = z > 1e-4
    zs = jnp.where(ok, z, 1.0)
    rx, ry = pv[:, 0] / zs, pv[:, 1] / zs
    from ..transforms import ndc_to_pixel, project_points

    ndc = project_points(points, camera.full_proj)
    px = ndc_to_pixel(ndc[:, 0], camera.width)
    py = ndc_to_pixel(ndc[:, 1], camera.height)
    ok = ok & (px >= 0) & (px < camera.width) & (py >= 0) & (py < camera.height)

    r = jnp.stack([rx, ry, jnp.ones_like(rx)], axis=-1)  # [N, 3]
    d = jnp.einsum("pij,nj->pni", M, r)  # [P, N, 3]
    dd = jnp.sum(d * d, axis=-1) + 1e-12
    ud = jnp.einsum("pi,pni->pn", u0, d)
    t_peak = -ud / dd
    t_star = jnp.minimum(t_peak, z[None, :])
    v = u0[:, None, :] + t_star[..., None] * d
    mv = jnp.sum(v * v, axis=-1)
    a = jnp.minimum(ALPHA_MAX, (op_eff * valid)[:, None] * jnp.exp(-0.5 * mv))
    a = jnp.where((t_peak > NEAR_PLANE) & (a >= ALPHA_MIN), a, 0.0)
    T = jnp.prod(1.0 - a, axis=0)
    return jnp.where(ok, T, 1.0)
