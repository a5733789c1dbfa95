"""Pallas TPU rasterizer: fused ray-Gaussian blend, forward + hand-written VJP.

TPU-native replacement for renderCUDA forward/backward
(forward.cu:409-658, backward.cu:633-955). Architecture:

- grid = one program per 32x32-pixel tile; pixels live in the 1024 lanes of
  [G=128, 1024] blocks, so every VPU op is fully utilized;
- the per-visit payload is 16 f32 (rgb, opacity, the factored quadric M and
  u0) in [CAP, 16] row-major slots: everything else the blend needs
  (Sigma r = M^T(M r), b.r = u0.(M r)) is derived in-kernel from M/u0, so
  the payload gather stays on XLA's fast narrow-row path (wide-row gathers
  fall off a ~6x performance cliff at 32 columns);
- the per-chunk linear algebra (ray-space direction d = M r) is ONE MXU
  matmul [G, 16] @ [16, 3*1024] against a per-tile selection basis
  (_geometry_basis);
- blending is an associative scan: alphas for the whole chunk are computed in
  parallel, transmittance via a log-depth prefix product, accumulation via
  lane reductions. No per-Gaussian serial dependency beyond one multiply;
- per-tile Gaussian lists are streamed from HBM with double-buffered DMA and
  chunk-level early exit once every pixel is saturated (the analog of the
  CUDA per-block done vote, forward.cu:475-477). The forward also assigns
  each tile a COMPACT region sized by its live chunk count (a sequential-
  grid SMEM cursor; fout channels CH_LIVEC/CH_CSTART);
- the backward pass walks only the live prefix front-to-back, reconstructing
  suffix sums by subtraction from the forward totals (replacing the CUDA
  back-to-front re-walk, backward.cu:692-764), and writes 16-column per-visit
  gradient rows COMPACTED into the forward's layout — no atomics, and the
  ~75% of slots past saturation (exactly-zero rows) are never stored; each
  compact row's gaussian id rides a separate int32 stream.
- gradient rows are parametrized by the QUADRIC invariants (Sigma = M^T M
  packed 6, b = M^T u0, uu = u0.u0) — the quantities the blend actually
  depends on. Their per-pair gradients are pure basis projections
  (dSigma ~ r r^T terms, db ~ r, duu ~ 1), so ALL of them ride the one
  per-chunk MXU projection matmul against a 9-row basis
  [rx, ry, 1, gRGB(3), rx^2, rx*ry, ry^2]; the peak-depth envelope theorem
  (d(mv)/dt = 0 at t* — the same identity the CUDA backward exploits by
  differentiating power w.r.t. AA/BB/CC directly, backward.cu:938-952)
  eliminates every per-pixel d/v gradient chain. The cheap per-GAUSSIAN
  chain (Sigma, b, uu) -> (M, u0) runs as componentwise XLA outside the
  kernel (_raster_bwd).
- densification-stat inputs (conic / mean2d) and outputs (gx, gy, |g|) live
  on separate 8-column aux streams compiled in only while densification
  runs (with_stats); the aux input is gathered directly into the COMPACT
  layout (live rows only) instead of the full slot layout.

Cotangent semantics replicate the reference's (documented) choices:
- the depth-distortion gradient flows only through the mapped depth m, not
  through the blend weights or the (1-T)^2 normalization (backward.cu:839-858
  sets dL_dweight = 0 and omits the normalization factor);
- the median-depth gradient is routed to exactly the max-contributor visit
  (backward.cu:879-882);
- the alpha->opacity gradient ignores the 0.99 clamp (backward.cu:912);
- camera scalars (focal, bg) and the aux output channels get zero cotangent.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (
    ALPHA_MAX,
    ALPHA_MIN,
    FAR_PLANE,
    MEDIAN_THRESHOLD,
    NEAR_PLANE,
    TILE_W,
    TRANSMITTANCE_EPS,
)
from .binning import CHUNK_SIZE, Binning

# ---------------------------------------------------------------------------
# Payload layout: one row of 16 f32 per (tile, Gaussian) visit slot
# (shared with tiled_ref.build_payload). Aux stats stream: 8 f32.
# ---------------------------------------------------------------------------
P_COLS = 16
C_RGB = 0  # 0:3
C_OP = 3
C_M = 4  # 4:13 row-major
C_U0 = 13  # 13:16
# stats-phase payload: aux columns ride the same slot gather
# (16:19 conic | 19:21 mean2d | 21:24 pad)
PAYLOAD_STATS_COLS = 24
# stats output rows: 0 gx | 1 gy | 2 |gx|+|gy| | 3:8 pad
STAT_COLS = 8

NPIX = 1024
OUT_CH = 16
CH_TFINAL = 9
CH_DFINAL = 10
CH_MEDIDX = 11
# compact backward layout, written by the forward kernel (one scalar per
# tile, broadcast over the lane dim): live chunk count and compact start
CH_LIVEC = 12
CH_CSTART = 13


def pack_sigma6(M: jnp.ndarray) -> jnp.ndarray:
    """Sigma = M^T M as (..., 6) upper triangle (the reference's v2g[0:6]).

    Cross-check helper only — the kernels derive Sigma r from M in-kernel.
    """
    S = jnp.einsum("...ji,...jk->...ik", M, M)
    return jnp.stack(
        [S[..., 0, 0], S[..., 0, 1], S[..., 0, 2], S[..., 1, 1], S[..., 1, 2], S[..., 2, 2]],
        axis=-1,
    )


def payload_col_list(rgb, op_eff, M, u0, conic=None, mean2d=None):
    """Per-gaussian payload as a list of [P] f32 columns, in the kernels'
    row order (rgb 0:3 | op 3 | M row-major 4:13 | u0 13:16, + conic 16:19 |
    mean2d 19:21 in the stats phase). Fed to binning.bin_gaussians as
    payload_cols so the sorted-slot payload rides the binning sorts instead
    of a post-sort row gather (see Binning.payload)."""
    P = rgb.shape[0]
    cols = [rgb[:, 0], rgb[:, 1], rgb[:, 2], op_eff]
    Mf = M.reshape(P, 9)
    cols += [Mf[:, i] for i in range(9)]
    cols += [u0[:, 0], u0[:, 1], u0[:, 2]]
    if conic is not None:
        cols += [conic[:, 0], conic[:, 1], conic[:, 2],
                 mean2d[:, 0], mean2d[:, 1]]
    return cols


def payload_from_binning(binning: Binning, with_stats: bool) -> jnp.ndarray:
    """[16 or 24, CAP] f32 payload view of the sort-carried Binning.payload
    (bitcast + zero-pad of the stats-phase spare rows)."""
    p = jax.lax.bitcast_convert_type(binning.payload, jnp.float32)
    ncols = PAYLOAD_STATS_COLS if with_stats else P_COLS
    if p.shape[0] < ncols:
        p = jnp.concatenate(
            [p, jnp.zeros((ncols - p.shape[0], p.shape[1]), jnp.float32)],
            axis=0)
    return p


def build_payload16(rgb, op_eff, M, u0, binning: Binning,
                    conic=None, mean2d=None) -> jnp.ndarray:
    """Gather per-Gaussian rows into the (tile, depth)-sorted slot layout.

    Sentinel slots gather the appended zero row (opacity 0 -> no
    contribution). Without conic/mean2d the rows are 16 columns; with them
    (the densification-stats phase) the SAME gather carries the aux columns
    inline (conic 16:19, mean2d 19:21, pad to 24) — slot gathers pay a
    large fixed cost per op, so one 24-column gather beats a 16-column
    payload gather plus a separate aux gather by ~2x. The result is
    TRANSPOSED, [cols, CAP]: Mosaic requires HBM DMA slices 128-aligned in
    the lane (last) dimension, so the kernels read [cols, CHUNK] windows
    and transpose on the MXU.
    """
    P = rgb.shape[0]
    cap = int(binning.slot_to_gaussian.shape[0])
    assert cap < (1 << 24), f"key capacity {cap} exceeds exact-f32 range"
    cols = [rgb, op_eff[:, None], M.reshape(P, 9), u0]
    ncols = P_COLS
    if conic is not None:
        cols += [conic, mean2d,
                 jnp.zeros((P, PAYLOAD_STATS_COLS - 21), rgb.dtype)]
        ncols = PAYLOAD_STATS_COLS
    flat = jnp.concatenate(cols, axis=1)
    flat = jnp.concatenate([flat, jnp.zeros((1, ncols), flat.dtype)], axis=0)
    return flat[binning.slot_to_gaussian].T


# ---------------------------------------------------------------------------
# In-kernel helpers (pure jnp on Pallas values)
# ---------------------------------------------------------------------------


def _shift_down(x, s, fill):
    """x shifted down by s rows along axis 0, filled with `fill` on top."""
    top = jnp.full((s,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([top, x[: x.shape[0] - s]], axis=0)


def _cumprod_incl(x):
    """Inclusive prefix product along axis 0 (log-depth doubling)."""
    n = x.shape[0]
    s = 1
    while s < n:
        x = x * _shift_down(x, s, 1.0)
        s *= 2
    return x


def _cumsum_incl(x):
    n = x.shape[0]
    s = 1
    while s < n:
        x = x + _shift_down(x, s, 0.0)
        s *= 2
    return x


def _dot_nt(a, b):
    """a [M, K] @ b [N, K]^T -> [M, N], contracting the lane axis (MXU)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _eye(n):
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r == c).astype(jnp.float32)


def _transpose_mxu(x):
    """[M, K] -> [K, M] via an exact identity matmul (Mosaic-safe transpose)."""
    return _dot_nt(_eye(x.shape[1]), x)


class _ChunkFwd(NamedTuple):
    """Recomputed per-pair quantities shared by forward and backward."""

    a: jnp.ndarray  # masked alpha [G, PIX]
    active: jnp.ndarray  # bool mask
    t: jnp.ndarray
    E: jnp.ndarray  # exp(-0.5 mv)
    d0: jnp.ndarray
    d1: jnp.ndarray
    d2: jnp.ndarray
    v0: jnp.ndarray
    v1: jnp.ndarray
    v2: jnp.ndarray
    ud: jnp.ndarray
    dd: jnp.ndarray
    n0: jnp.ndarray
    n1: jnp.ndarray
    n2: jnp.ndarray
    inv_len: jnp.ndarray
    prod_incl: jnp.ndarray  # inclusive prefix product of (1 - a)


# payload column ranges projected against the per-tile ray basis R3:
# the three rows of M (d = M r)
_GEOM_COLS = (4, 7, 10)


def _geometry_basis(R3, ncols: int = P_COLS):
    """[ncols, 3*PIX] block-diagonal-ish selection basis: group g holds R3 at
    payload rows _GEOM_COLS[g]:+3, zeros elsewhere (incl. any aux columns
    past 16). Built ONCE per tile and reused by every chunk, so the three
    skinny per-group matmuls collapse to one [G, ncols] @ [ncols, 3*PIX] MXU
    call per chunk (a skinny MXU issue carries ~1.5 us fixed latency, which
    dominates at 0.8 MFLOP apiece)."""
    npx = R3.shape[1]
    blocks = []
    for c in _GEOM_COLS:
        blocks.append(jnp.concatenate(
            [jnp.zeros((c, npx), jnp.float32), R3,
             jnp.zeros((ncols - c - 3, npx), jnp.float32)], axis=0))
    return jnp.concatenate(blocks, axis=1)


def _chunk_geometry(p, basis3, need_normals=False):
    """Ray-space linear algebra for one [CHUNK, 16] payload block: directions
    d = M r, ud = u0 . d, dd = |d|^2, peak depth t, and (optional) the
    un-normalized normal n = Sigma r = M^T d."""
    npx = basis3.shape[1] // 3
    out = jnp.dot(p, basis3, preferred_element_type=jnp.float32)  # [G, 3*PIX]
    d0 = out[:, 0:npx]
    d1 = out[:, npx: 2 * npx]
    d2 = out[:, 2 * npx: 3 * npx]
    ud = p[:, 13:14] * d0 + p[:, 14:15] * d1 + p[:, 15:16] * d2
    dd = d0 * d0 + d1 * d1 + d2 * d2 + 1e-12  # = r^T Sigma r
    t = -ud / dd
    if need_normals:
        n0 = p[:, 4:5] * d0 + p[:, 7:8] * d1 + p[:, 10:11] * d2
        n1 = p[:, 5:6] * d0 + p[:, 8:9] * d1 + p[:, 11:12] * d2
        n2 = p[:, 6:7] * d0 + p[:, 9:10] * d1 + p[:, 12:13] * d2
    else:
        n0 = n1 = n2 = None
    return d0, d1, d2, n0, n1, n2, ud, dd, t


def _chunk_terms(p, basis3, need_normals=True, seg_mask=None):
    """Per-pair blend quantities for one [CHUNK, 16] payload block.

    seg_mask: [CHUNK, 1] bool — False for rows belonging to a neighboring
    tile's segment (unaligned head/tail of the DMA window); they blend and
    backpropagate as exact zeros.
    """
    d0, d1, d2, n0, n1, n2, ud, dd, t = _chunk_geometry(
        p, basis3, need_normals=need_normals)
    u0x, u0y, u0z = p[:, 13:14], p[:, 14:15], p[:, 15:16]
    v0 = u0x + t * d0
    v1 = u0y + t * d1
    v2 = u0z + t * d2
    mv = v0 * v0 + v1 * v1 + v2 * v2
    E = jnp.exp(-0.5 * mv)
    op = p[:, 3:4]
    a_raw = jnp.minimum(ALPHA_MAX, op * E)
    active = (t > NEAR_PLANE) & (a_raw >= ALPHA_MIN)
    if seg_mask is not None:
        active = active & seg_mask
    a = jnp.where(active, a_raw, 0.0)
    inv_len = (
        jax.lax.rsqrt(n0 * n0 + n1 * n1 + n2 * n2 + 1e-7) if need_normals else None
    )
    prod_incl = _cumprod_incl(1.0 - a)
    return _ChunkFwd(
        a=a, active=active, t=t, E=E,
        d0=d0, d1=d1, d2=d2, v0=v0, v1=v1, v2=v2,
        ud=ud, dd=dd, n0=n0, n1=n1, n2=n2,
        inv_len=inv_len, prod_incl=prod_incl,
    )


def _ndc_m(t):
    tc = jnp.maximum(t, NEAR_PLANE)
    return (FAR_PLANE * tc - FAR_PLANE * NEAR_PLANE) / ((FAR_PLANE - NEAR_PLANE) * tc)


def _rays_for_tile(tile_id, ntx, meta):
    """rx, ry, row-iota and lane pixel coordinates for one tile."""
    fx, fy = meta[0, 0], meta[0, 1]
    half_w, half_h = meta[0, 5], meta[0, 6]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, NPIX), 1)
    lx = (lane % TILE_W).astype(jnp.float32)
    ly = (lane // TILE_W).astype(jnp.float32)
    tx = (tile_id % ntx) * TILE_W
    ty = (tile_id // ntx) * TILE_W
    px = tx.astype(jnp.float32) + lx + 0.5
    py = ty.astype(jnp.float32) + ly + 0.5
    rx = (px - half_w) / fx
    ry = (py - half_h) / fy
    R3 = jnp.concatenate([rx, ry, jnp.ones_like(rx)], axis=0)  # [3, PIX]
    return rx, ry, R3, px, py


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(ntx: int, with_reg: bool, bounds_ref, meta_ref,
                payload_hbm, out_ref, pbuf, sem, cur_ref):
    t_id = pl.program_id(0)

    # Compact-layout cursor for the backward pass: the grid runs sequentially,
    # so a running SMEM counter assigns each tile a contiguous CHUNK-aligned
    # region sized by its live (pre-saturation) chunk count.
    @pl.when(t_id == 0)
    def _():
        cur_ref[0] = 0

    seg_s = bounds_ref[t_id]
    seg_e = bounds_ref[t_id + 1]
    # DMA windows are CHUNK-aligned; head/tail rows outside [seg_s, seg_e)
    # belong to neighboring tiles and are masked off.
    base = pl.multiple_of((seg_s // CHUNK_SIZE) * CHUNK_SIZE, CHUNK_SIZE)
    nc = jnp.where(seg_e > seg_s, (seg_e - base + CHUNK_SIZE - 1) // CHUNK_SIZE, 0)
    rx, ry, R3, _, _ = _rays_for_tile(t_id, ntx, meta_ref)
    basis3 = _geometry_basis(R3)
    bg0, bg1, bg2 = meta_ref[0, 2], meta_ref[0, 3], meta_ref[0, 4]

    def copy_in(c, slot):
        # the stats-phase payload carries extra aux columns (rows 16:24)
        # that only the backward reads; the forward streams rows 0:16
        return pltpu.make_async_copy(
            payload_hbm.at[pl.ds(0, P_COLS),
                           pl.ds(base + c * CHUNK_SIZE, CHUNK_SIZE)],
            pbuf.at[slot],
            sem.at[slot],
        )

    @pl.when(nc > 0)
    def _():
        copy_in(0, 0).start()

    row_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK_SIZE, 1), 0)
    zeros = jnp.zeros((1, NPIX), jnp.float32)
    init = (
        jnp.int32(0),  # next chunk
        jnp.ones((1, NPIX), jnp.float32),  # T
        zeros, zeros, zeros,  # rgb
        zeros, zeros, zeros,  # normal
        zeros,  # acc alpha
        zeros, zeros,  # d1, d2
        zeros,  # depth
        jnp.full((1, NPIX), -1.0),  # median visit idx
    )

    def cond(carry):
        c, T = carry[0], carry[1]
        return (c < nc) & (jnp.max(T) >= TRANSMITTANCE_EPS)

    def body(carry):
        c, T, r0, r1, r2, m0, m1, m2, acc, s1, s2, depth, med = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nc)
        def _():
            copy_in(c + 1, jax.lax.rem(c + 1, 2)).start()

        copy_in(c, slot).wait()
        p = _transpose_mxu(pbuf[slot])  # [16, CHUNK] -> [CHUNK, 16]

        grow = base + c * CHUNK_SIZE + row_i
        seg_mask = (grow >= seg_s) & (grow < seg_e)
        f = _chunk_terms(p, basis3, need_normals=with_reg, seg_mask=seg_mask)
        T_excl = T * _shift_down(f.prod_incl, 1, 1.0)
        w = f.a * T_excl * (T_excl > TRANSMITTANCE_EPS)

        # accumulate (measured: Mosaic's cross-sublane jnp.sum reductions beat
        # small ones-matmuls on the MXU here)
        r0 += jnp.sum(p[:, 0:1] * w, axis=0, keepdims=True)
        r1 += jnp.sum(p[:, 1:2] * w, axis=0, keepdims=True)
        r2 += jnp.sum(p[:, 2:3] * w, axis=0, keepdims=True)
        acc += jnp.sum(w, axis=0, keepdims=True)

        # regularization channels (normals / distortion / median depth): the
        # train step compiles these out before distortion_from_iter /
        # depth_normal_from_iter — their cotangents are structurally zero then
        if with_reg:
            m = _ndc_m(f.t)
            wm = w * m
            sneg = f.inv_len * w
            m0 -= jnp.sum(f.n0 * sneg, axis=0, keepdims=True)
            m1 -= jnp.sum(f.n1 * sneg, axis=0, keepdims=True)
            m2 -= jnp.sum(f.n2 * sneg, axis=0, keepdims=True)
            s1 += jnp.sum(wm, axis=0, keepdims=True)
            s2 += jnp.sum(wm * m, axis=0, keepdims=True)

            med_mask = (f.a > 0) & (T_excl > MEDIAN_THRESHOLD)
            idxloc = jnp.max(jnp.where(med_mask, row_i, -1), axis=0, keepdims=True)
            has = idxloc >= 0
            onehot = (row_i == idxloc) & med_mask
            tmed = jnp.sum(jnp.where(onehot, f.t, 0.0), axis=0, keepdims=True)
            depth = jnp.where(has, tmed, depth)
            med = jnp.where(has, (c * CHUNK_SIZE + idxloc).astype(jnp.float32), med)

        T = T * f.prod_incl[CHUNK_SIZE - 1: CHUNK_SIZE]
        return (c + 1, T, r0, r1, r2, m0, m1, m2, acc, s1, s2, depth, med)

    out = jax.lax.while_loop(cond, body, init)
    c, T, r0, r1, r2, m0, m1, m2, acc, s1, s2, depth, med = out

    # drain the in-flight prefetch if the loop exited early
    @pl.when(c < nc)
    def _():
        copy_in(c, jax.lax.rem(c, 2)).wait()

    dist = (acc * s2 - s1 * s1) / ((1.0 - T) ** 2 + 1e-7)
    out_ref[0, 0, :] = (r0 + T * bg0)[0]
    out_ref[0, 1, :] = (r1 + T * bg1)[0]
    out_ref[0, 2, :] = (r2 + T * bg2)[0]
    out_ref[0, 3, :] = m0[0]
    out_ref[0, 4, :] = m1[0]
    out_ref[0, 5, :] = m2[0]
    out_ref[0, 6, :] = depth[0]
    out_ref[0, 7, :] = acc[0]
    out_ref[0, 8, :] = dist[0]
    out_ref[0, CH_TFINAL, :] = T[0]
    out_ref[0, CH_DFINAL, :] = s1[0]
    out_ref[0, CH_MEDIDX, :] = med[0]
    # compact layout for the backward: live chunk count + region start.
    # c at loop exit = chunks actually processed; every later chunk lies
    # past every pixel's saturation point and has exactly-zero gradients.
    cstart = cur_ref[0]
    cur_ref[0] = cstart + c * CHUNK_SIZE
    zero_row = jnp.zeros((NPIX,), jnp.float32)
    out_ref[0, CH_LIVEC, :] = zero_row + c.astype(jnp.float32)
    out_ref[0, CH_CSTART, :] = zero_row + cstart.astype(jnp.float32)
    out_ref[0, 14, :] = zero_row
    out_ref[0, 15, :] = zero_row


def rasterize_fwd_pallas(payload, binning: Binning, meta_vec, ntx: int, ntiles: int,
                         interpret=False, with_reg=True):
    """Run the forward blend kernel. payload: [16, CAP]. Returns
    [NTILES, 16, 1024]."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda t, s: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, OUT_CH, NPIX), lambda t, s: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, P_COLS, CHUNK_SIZE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, ntx, with_reg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntiles, OUT_CH, NPIX), jnp.float32),
        interpret=interpret,
    )(binning.bounds, meta_vec, payload)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    ntx: int, halfw: float, halfh: float, with_stats: bool, with_reg: bool,
    compact_cap: int,
    bounds_ref, live_ref, cstart_ref, meta_ref, payload_hbm, gid_hbm,
    fout_ref, gout_ref, dslot_init_hbm, gid_init_hbm, stat_init_hbm,
    dslot_hbm, gidc_hbm, stat_hbm,
    pbuf, gbuf, dbuf, gwbuf, sbuf, sem, gsem, wsem, gwsem, swsem,
):
    del dslot_init_hbm, gid_init_hbm, stat_init_hbm  # aliased outputs: zeros
    t_id = pl.program_id(0)
    seg_s = bounds_ref[t_id]
    seg_e = bounds_ref[t_id + 1]
    base = pl.multiple_of((seg_s // CHUNK_SIZE) * CHUNK_SIZE, CHUNK_SIZE)
    nc = jnp.where(seg_e > seg_s, (seg_e - base + CHUNK_SIZE - 1) // CHUNK_SIZE, 0)
    # Gradient rows land COMPACTED: this tile owns the CHUNK-aligned region
    # [cstart, cstart + live*CHUNK) that the forward's sequential cursor
    # assigned it. Chunks past `live` are saturated (exactly-zero rows) and
    # are neither computed nor stored; if the compact buffer is too small the
    # writes are clamped and the forward-side demand telemetry flags it.
    # the cursor only ever advances by whole chunks; annotate so Mosaic can
    # prove the compact write offsets are 128-lane aligned
    cst = pl.multiple_of(cstart_ref[t_id], CHUNK_SIZE)
    avail = jnp.maximum((compact_cap - cst) // CHUNK_SIZE, 0)
    nc = jnp.minimum(jnp.minimum(nc, live_ref[t_id]), avail)
    pcols = PAYLOAD_STATS_COLS if with_stats else P_COLS
    rx, ry, R3, px, py = _rays_for_tile(t_id, ntx, meta_ref)
    basis3 = _geometry_basis(R3, pcols)
    bg0, bg1, bg2 = meta_ref[0, 2], meta_ref[0, 3], meta_ref[0, 4]

    # per-pixel cotangents and forward totals
    g_rgb0, g_rgb1, g_rgb2 = gout_ref[0, 0:1, :], gout_ref[0, 1:2, :], gout_ref[0, 2:3, :]
    g_n0, g_n1, g_n2 = gout_ref[0, 3:4, :], gout_ref[0, 4:5, :], gout_ref[0, 5:6, :]
    g_depth = gout_ref[0, 6:7, :]
    g_alpha = gout_ref[0, 7:8, :]
    g_dist = gout_ref[0, 8:9, :]
    T_fin = fout_ref[0, CH_TFINAL: CH_TFINAL + 1, :]
    d1_tot = fout_ref[0, CH_DFINAL: CH_DFINAL + 1, :]
    med_idx = fout_ref[0, CH_MEDIDX: CH_MEDIDX + 1, :]
    acc_tot = fout_ref[0, 7:8, :]

    rgbnb0 = fout_ref[0, 0:1, :] - T_fin * bg0
    rgbnb1 = fout_ref[0, 1:2, :] - T_fin * bg1
    rgbnb2 = fout_ref[0, 2:3, :] - T_fin * bg2
    TOT_F = (
        g_rgb0 * rgbnb0 + g_rgb1 * rgbnb1 + g_rgb2 * rgbnb2
        + g_alpha * acc_tot
    )
    if with_reg:
        TOT_F = TOT_F + (
            g_n0 * fout_ref[0, 3:4, :]
            + g_n1 * fout_ref[0, 4:5, :]
            + g_n2 * fout_ref[0, 5:6, :]
        )
    bgdot = bg0 * g_rgb0 + bg1 * g_rgb1 + bg2 * g_rgb2
    G_RGB = jnp.concatenate([g_rgb0, g_rgb1, g_rgb2], axis=0)  # [3, PIX]

    def copy_in(c, slot):
        return pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(base + c * CHUNK_SIZE, CHUNK_SIZE)],
            pbuf.at[slot],
            sem.at[slot],
        )

    def gid_in(c, slot):
        return pltpu.make_async_copy(
            gid_hbm.at[:, pl.ds(base + c * CHUNK_SIZE, CHUNK_SIZE)],
            gbuf.at[slot],
            gsem.at[slot],
        )

    def copy_out(c, slot):
        return pltpu.make_async_copy(
            dbuf.at[slot],
            dslot_hbm.at[:, pl.ds(cst + c * CHUNK_SIZE, CHUNK_SIZE)],
            wsem.at[slot],
        )

    def gid_out(c, slot):
        return pltpu.make_async_copy(
            gwbuf.at[slot],
            gidc_hbm.at[:, pl.ds(cst + c * CHUNK_SIZE, CHUNK_SIZE)],
            gwsem.at[slot],
        )

    def stat_out(c, slot):
        return pltpu.make_async_copy(
            sbuf.at[slot],
            stat_hbm.at[:, pl.ds(cst + c * CHUNK_SIZE, CHUNK_SIZE)],
            swsem.at[slot],
        )

    @pl.when(nc > 0)
    def _():
        copy_in(0, 0).start()
        gid_in(0, 0).start()

    row_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK_SIZE, 1), 0)
    stat_blk0 = 8 if with_reg else 5  # first stats block in the projection

    def body(carry):
        c, T, PwF = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nc)
        def _():
            copy_in(c + 1, jax.lax.rem(c + 1, 2)).start()
            gid_in(c + 1, jax.lax.rem(c + 1, 2)).start()

        copy_in(c, slot).wait()
        gid_in(c, slot).wait()
        p = _transpose_mxu(pbuf[slot])  # [pcols, CHUNK] -> [CHUNK, pcols]

        grow = base + c * CHUNK_SIZE + row_i
        seg_mask = (grow >= seg_s) & (grow < seg_e)
        f = _chunk_terms(p, basis3, need_normals=with_reg, seg_mask=seg_mask)
        T_excl = T * _shift_down(f.prod_incl, 1, 1.0)
        cutoff = T_excl > TRANSMITTANCE_EPS
        w = f.a * T_excl * cutoff

        # F_i = per-pair loss sensitivity to one unit of weight
        F = p[:, 0:1] * g_rgb0 + p[:, 1:2] * g_rgb1 + p[:, 2:3] * g_rgb2 + g_alpha
        if with_reg:
            nh0 = -f.n0 * f.inv_len
            nh1 = -f.n1 * f.inv_len
            nh2 = -f.n2 * f.inv_len
            F = F + nh0 * g_n0 + nh1 * g_n1 + nh2 * g_n2
        wF = w * F
        incl = PwF + _cumsum_incl(wF)
        SF = TOT_F - incl
        one_m_a = 1.0 - f.a
        dL_da = (f.a > 0) * (
            T_excl * cutoff * F - (SF + T_fin * bgdot) / one_m_a
        )

        # alpha -> opacity / exponent (clamp ignored, as in the reference)
        op = p[:, 3:4]
        dop_pix = f.E * dL_da * f.active
        dL_dmv = jnp.where(f.active, -0.5 * f.E * op * dL_da, 0.0)

        # Envelope theorem at the ray-Gaussian peak: mv(t*) is the MINIMUM
        # over t, so d(mv)/dt = 0 and the quadric-invariant gradients are
        #   d(mv)/duu = 1,  d(mv)/d(ud) = 2 t,  d(mv)/d(dd) = t^2
        # (ud = b.r, dd = r^T Sigma r) — exactly the reference's analytic
        # power gradients w.r.t. its cached BB/AA (backward.cu:938-952).
        # The depth chain t = -ud/dd (distortion + median routing) adds
        #   dt/d(ud) = -1/dd,  dt/d(dd) = -t/dd.
        rdd = 1.0 / f.dd
        s_mv = f.t * dL_dmv
        if with_reg:
            # distortion (through m only) + median depth -> t
            m = _ndc_m(f.t)
            dL_dm = 2.0 * w * (m * acc_tot - d1_tot) * g_dist
            tc = jnp.maximum(f.t, NEAR_PLANE)
            dm_dt = (FAR_PLANE * NEAR_PLANE) / ((FAR_PLANE - NEAR_PLANE) * tc * tc)
            glob_row = (c * CHUNK_SIZE + row_i).astype(jnp.float32)
            is_med = (glob_row == med_idx) & (f.a > 0)
            dL_dt = dL_dm * dm_dt + jnp.where(is_med, g_depth, 0.0)
            q_t = dL_dt * rdd
            A_ud = 2.0 * s_mv - q_t
            A_dd = f.t * (s_mv - q_t)

            # normal channel -> unnormalized normal n = Sigma r
            dnh0 = w * g_n0
            dnh1 = w * g_n1
            dnh2 = w * g_n2
            dot_nh = dnh0 * f.n0 + dnh1 * f.n1 + dnh2 * f.n2
            il2 = f.inv_len * f.inv_len
            dn0 = (-dnh0 + dot_nh * f.n0 * il2) * f.inv_len
            dn1 = (-dnh1 + dot_nh * f.n1 * il2) * f.inv_len
            dn2 = (-dnh2 + dot_nh * f.n2 * il2) * f.inv_len
        else:
            A_ud = 2.0 * s_mv
            A_dd = f.t * s_mv
            dn0 = dn1 = dn2 = None

        # densification stats (reference's pseudo-gradient, backward.cu:896-909)
        # — compiled out after densification ends (with_stats=False); the aux
        # inputs ride the payload (columns 16:21)
        if with_stats:
            ca, cb, cc = p[:, 16:17], p[:, 17:18], p[:, 18:19]
            dxp = p[:, 19:20] - (px - 0.5)
            dyp = p[:, 20:21] - (py - 0.5)
            dL_dG2 = op * dL_da * f.active
            gx = dL_dG2 * (-f.E) * (ca * dxp + cb * dyp) * halfw
            gy = dL_dG2 * (-f.E) * (cb * dxp + cc * dyp) * halfh

        # Reduce over pixels into per-slot gradient rows. ALL projections
        # (basis [9, PIX] . X [G, PIX] -> [9, G]) are batched into ONE MXU
        # call — a skinny matmul's ~1.5 us fixed latency would otherwise
        # dominate the backward at ~0.8 MFLOP apiece. Basis rows:
        # 0 rx | 1 ry | 2 ones | 3:6 gRGB | 6 rx^2 | 7 rx*ry | 8 ry^2.
        Gn = CHUNK_SIZE
        basis = jnp.concatenate(
            [R3, G_RGB, rx * rx, rx * ry, ry * ry], axis=0)  # [9, PIX]
        rhs = [A_ud, A_dd, dL_dmv, w, dop_pix]
        if with_reg:
            rhs += [dn0, dn1, dn2]
        if with_stats:
            rhs += [gx, gy, jnp.abs(gx) + jnp.abs(gy)]
        out_all = _dot_nt(basis, jnp.concatenate(rhs, axis=0))  # [9, nb*G]

        def blk(i, r0, r1):
            return out_all[r0:r1, i * Gn: (i + 1) * Gn]

        db_t = blk(0, 0, 3)  # [3, G]: A_ud projected on (rx, ry, 1)
        duu_t = blk(2, 2, 3)  # [1, G]: dL_dmv . 1
        drgb_t = blk(3, 3, 6)
        dop_t = blk(4, 2, 3)
        # dd = S00 rx^2 + 2 S01 rx ry + 2 S02 rx + S11 ry^2 + 2 S12 ry + S22
        s0 = blk(1, 6, 7)
        s1 = 2.0 * blk(1, 7, 8)
        s2 = 2.0 * blk(1, 0, 1)
        s3 = blk(1, 8, 9)
        s4 = 2.0 * blk(1, 1, 2)
        s5 = blk(1, 2, 3)
        if with_reg:
            # n = Sigma r: dS_ij += dn_i r_j (symmetrized into the packing)
            dn0_t = blk(5, 0, 3)
            dn1_t = blk(6, 0, 3)
            dn2_t = blk(7, 0, 3)
            s0 = s0 + dn0_t[0:1]
            s1 = s1 + dn0_t[1:2] + dn1_t[0:1]
            s2 = s2 + dn0_t[2:3] + dn2_t[0:1]
            s3 = s3 + dn1_t[1:2]
            s4 = s4 + dn1_t[2:3] + dn2_t[1:2]
            s5 = s5 + dn2_t[2:3]

        drow_t = jnp.concatenate(
            [
                drgb_t,  # 0:3
                dop_t,  # 3
                s0, s1, s2, s3, s4, s5,  # 4:10 dSigma6
                db_t,  # 10:13
                duu_t,  # 13
                jnp.zeros((2, Gn), jnp.float32),  # 14:16 pad
            ],
            axis=0,
        )  # [16, G]

        wslot = jax.lax.rem(c, 2)

        @pl.when(c >= 2)
        def _():
            copy_out(c - 2, wslot).wait()
            gid_out(c - 2, wslot).wait()
            if with_stats:
                stat_out(c - 2, wslot).wait()

        dbuf[wslot] = drow_t  # [16, G]
        gwbuf[wslot] = gbuf[slot]
        copy_out(c, wslot).start()
        gid_out(c, wslot).start()
        if with_stats:
            stats_t = jnp.concatenate(
                [blk(stat_blk0, 2, 3), blk(stat_blk0 + 1, 2, 3),
                 blk(stat_blk0 + 2, 2, 3),
                 jnp.zeros((5, Gn), jnp.float32)], axis=0)  # [8, G]
            sbuf[wslot] = stats_t
            stat_out(c, wslot).start()

        T = T * f.prod_incl[CHUNK_SIZE - 1: CHUNK_SIZE]
        PwF = incl[CHUNK_SIZE - 1: CHUNK_SIZE]
        return (c + 1, T, PwF)

    # Early exit once every pixel is saturated: all remaining visits have
    # w == 0 and produce exactly zero gradients. nc is already bounded by the
    # forward's live count (same condition, same arithmetic), so this exits
    # at c == nc in practice; any unwritten compact rows keep the zeros of
    # the aliased input (see rasterize_bwd_pallas).
    def cond(carry):
        c, T, _ = carry
        return (c < nc) & (jnp.max(T) >= TRANSMITTANCE_EPS)

    init = (jnp.int32(0), jnp.ones((1, NPIX), jnp.float32), jnp.zeros((1, NPIX), jnp.float32))
    c_end, _, _ = jax.lax.while_loop(cond, body, init)

    # drain the in-flight prefetch if the loop exited early
    @pl.when(c_end < nc)
    def _():
        copy_in(c_end, jax.lax.rem(c_end, 2)).wait()
        gid_in(c_end, jax.lax.rem(c_end, 2)).wait()

    # drain outstanding writes
    @pl.when(c_end >= 2)
    def _():
        copy_out(c_end - 2, jax.lax.rem(c_end - 2, 2)).wait()
        gid_out(c_end - 2, jax.lax.rem(c_end - 2, 2)).wait()
        if with_stats:
            stat_out(c_end - 2, jax.lax.rem(c_end - 2, 2)).wait()

    @pl.when(c_end >= 1)
    def _():
        copy_out(c_end - 1, jax.lax.rem(c_end - 1, 2)).wait()
        gid_out(c_end - 1, jax.lax.rem(c_end - 1, 2)).wait()
        if with_stats:
            stat_out(c_end - 1, jax.lax.rem(c_end - 1, 2)).wait()


def compact_capacity_for(capacity: int, ntiles: int) -> int:
    """Compact-buffer size that can never overflow (every tile fully live)."""
    return capacity + ntiles * CHUNK_SIZE


def rasterize_bwd_pallas(
    payload, fout, gout, binning: Binning, meta_vec, ntx: int, ntiles: int,
    halfw: float, halfh: float, interpret=False, with_stats=True, with_reg=True,
    compact_cap: int = 0,
):
    """Run the backward kernel.

    payload: [16, CAP], or [24, CAP] with the aux columns inline when
    with_stats (build_payload16 with conic/mean2d).

    Returns (dslot [16, compact_cap] f32, gid [compact_cap] int32,
    stats [8, compact_cap] f32 or None): each tile's live (pre-saturation)
    chunks are packed at the compact start the forward assigned it (fout
    channels CH_LIVEC / CH_CSTART); the int32 gid stream carries each row's
    gaussian id for the subsequent per-gaussian reduction. With the default
    compact_cap = capacity + ntiles*CHUNK the packing cannot overflow; a
    tighter cap must be guarded by the forward-side demand telemetry.
    """
    cap = payload.shape[1]
    pcols = PAYLOAD_STATS_COLS if with_stats else P_COLS
    assert payload.shape[0] == pcols, (payload.shape, with_stats)
    if compact_cap <= 0:
        compact_cap = compact_capacity_for(cap, ntiles)
    # the compact cursor (CH_CSTART) round-trips through f32 fout channels;
    # past 2^24 it would round and break the CHUNK_SIZE alignment promise,
    # silently corrupting compact gradient writes
    assert compact_cap < (1 << 24), (
        f"compact capacity {compact_cap} exceeds exact-f32 cursor range")
    live = fout[:, CH_LIVEC, 0].astype(jnp.int32)
    cstart = fout[:, CH_CSTART, 0].astype(jnp.int32)
    gids2d = binning.slot_to_gaussian[None, :]  # [1, CAP] int32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda t, *s: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # payload
            pl.BlockSpec(memory_space=pl.ANY),  # gid stream
            pl.BlockSpec((1, OUT_CH, NPIX), lambda t, *s: (t, 0, 0)),
            pl.BlockSpec((1, OUT_CH, NPIX), lambda t, *s: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # dslot init (alias)
            pl.BlockSpec(memory_space=pl.ANY),  # gid init (alias)
            pl.BlockSpec(memory_space=pl.ANY),  # stats init (alias)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, pcols, CHUNK_SIZE), jnp.float32),  # payload in
            pltpu.VMEM((2, 1, CHUNK_SIZE), jnp.int32),  # gid in
            pltpu.VMEM((2, P_COLS, CHUNK_SIZE), jnp.float32),  # drow out
            pltpu.VMEM((2, 1, CHUNK_SIZE), jnp.int32),  # gid out
            pltpu.VMEM((2, STAT_COLS, CHUNK_SIZE), jnp.float32),  # stats out
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # Outputs alias zero-initialized inputs so regions beyond the final
    # cursor keep exactly-zero gradient rows (gid 0, zero add: harmless in
    # the reduction).
    dslot_init = jnp.zeros((P_COLS, compact_cap), jnp.float32)
    gid_init = jnp.zeros((1, compact_cap), jnp.int32)
    stat_init = jnp.zeros((STAT_COLS, compact_cap), jnp.float32)
    dslot, gidc, stats = pl.pallas_call(
        functools.partial(_bwd_kernel, ntx, halfw, halfh, with_stats, with_reg,
                          compact_cap),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((P_COLS, compact_cap), jnp.float32),
            jax.ShapeDtypeStruct((1, compact_cap), jnp.int32),
            jax.ShapeDtypeStruct((STAT_COLS, compact_cap), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        input_output_aliases={8: 0, 9: 1, 10: 2},
    )(binning.bounds, live, cstart, meta_vec, payload, gids2d,
      fout, gout, dslot_init, gid_init, stat_init)
    return dslot, gidc[0], (stats if with_stats else None)


# ---------------------------------------------------------------------------
# Per-gaussian gradient reduction
# ---------------------------------------------------------------------------


def reduce_compact_rows(dslot, gidc, stats, P: int, interpret: bool = False):
    """Per-gaussian sums of the compacted gradient rows.

    dslot: [16, R] f32; gidc: [R] int32 (P for sentinel slots, 0 with zero
    rows in the unwritten tail); stats: [8, R] or None.
    Returns ([P, 16], [P, 3] or None).

    Production path: ONE sorted windowed-matmul reduction over the
    concatenated 16(+8) columns (ops/reduce.py) — segment_sum's scalar
    scatter pipeline costs ~70 ns/row at 1M segments.
    """
    from .reduce import reduce_rows_by_gid

    rows = dslot if stats is None else jnp.concatenate([dslot, stats], axis=0)
    per = reduce_rows_by_gid(rows, gidc, P, interpret=interpret)
    per_g = per[:, :P_COLS]
    per_s = None if stats is None else per[:, P_COLS:P_COLS + 3]
    return per_g, per_s


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


class RasterMeta(NamedTuple):
    """Static rasterization metadata (hashable)."""

    ntx: int
    nty: int
    width: int
    height: int
    interpret: bool = False
    # compile the densification-stat pseudo-gradients into the backward
    # kernel (turn off after densify_until_iter for a faster backward)
    with_stats: bool = True
    # compile the regularization outputs (normals ch3:6, median depth ch6,
    # distortion ch8) and their gradient paths into the kernels. The train
    # step turns this off before min(distortion_from_iter,
    # depth_normal_from_iter), where those cotangents are structurally zero
    # (train.py:157-166 ramps both regularizers from iter 15000).
    with_reg: bool = True
    # static compact gradient-buffer capacity; 0 = the safe worst case
    # (capacity + ntiles*CHUNK, never overflows). The train/bench paths set
    # a tighter value (~25% of capacity) guarded by the forward's demand
    # telemetry: saturated (dead) slot rows are never stored or reduced.
    compact_cap: int = 0


def _meta_vec(focal_x, focal_y, bg, width, height):
    return jnp.stack(
        [
            jnp.asarray(focal_x, jnp.float32),
            jnp.asarray(focal_y, jnp.float32),
            bg[0].astype(jnp.float32),
            bg[1].astype(jnp.float32),
            bg[2].astype(jnp.float32),
            jnp.asarray(width / 2.0, jnp.float32),
            jnp.asarray(height / 2.0, jnp.float32),
            jnp.float32(0.0),
        ]
    )[None, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def rasterize(meta: RasterMeta, rgb, op_eff, M, u0, conic, mean2d,
              carrier, focal_x, focal_y, bg, binning: Binning):
    """Differentiable tiled rasterization -> [NTILES, 16, 1024].

    carrier: [P, 3] zeros whose cotangent carries the densification stats
    (the reference's screenspace_points trick, gaussian_renderer/__init__.py:
    26-30 + train.py:253-256). Aux channels 9..15 get zero cotangent.
    """
    out, _ = _raster_fwd(meta, rgb, op_eff, M, u0, conic, mean2d,
                         carrier, focal_x, focal_y, bg, binning)
    return out


def _raster_fwd(meta, rgb, op_eff, M, u0, conic, mean2d, carrier,
                focal_x, focal_y, bg, binning):
    P = rgb.shape[0]
    # ids ride a dedicated int32 stream through the backward; the payload
    # itself carries no id column
    assert P < (1 << 24), f"gaussian pool {P} exceeds exact-f32 id range"
    mv = _meta_vec(focal_x, focal_y, bg, meta.width, meta.height)
    # in the stats phase the aux columns (conic/mean2d) ride the SAME slot
    # delivery as the blend payload; the forward kernel streams only rows
    # 0:16 of the wider table. The payload normally arrives sort-carried in
    # the Binning (see binning.bin_gaussians payload_cols); the row-gather
    # fallback covers callers that bin without payload columns.
    if binning.payload is not None:
        payload = payload_from_binning(binning, meta.with_stats)
    else:
        payload = build_payload16(
            rgb, op_eff, M, u0, binning,
            conic=conic if meta.with_stats else None,
            mean2d=mean2d if meta.with_stats else None)
    out = rasterize_fwd_pallas(payload, binning, mv, meta.ntx, meta.ntx * meta.nty,
                               interpret=meta.interpret, with_reg=meta.with_reg)
    res = (payload, out, binning, mv, M, u0, P)
    return out, res


def _raster_bwd(meta, res, gout):
    payload, fout, binning, mv, M, u0, P = res
    ntiles = meta.ntx * meta.nty
    ccap = meta.compact_cap or compact_capacity_for(payload.shape[1], ntiles)
    dslot, gidc, stats = rasterize_bwd_pallas(
        payload, fout, gout, binning, mv, meta.ntx, ntiles,
        meta.width / 2.0, meta.height / 2.0, interpret=meta.interpret,
        with_stats=meta.with_stats, with_reg=meta.with_reg,
        compact_cap=ccap,
    )
    per_g, per_s = reduce_compact_rows(dslot, gidc, stats, P,
                                       interpret=meta.interpret)
    drgb = per_g[:, 0:3]
    dop = per_g[:, 3]
    # Per-gaussian chain from the quadric invariants back to the factored
    # form (the analog of computeView2Gaussian_backward, backward.cu:380-587,
    # collapsed to ~30 componentwise ops):
    #   Sigma = M^T M:  dM_ab += sum_k M_ak H_kb,
    #     H = [[2 s0, s1, s2], [s1, 2 s3, s4], [s2, s4, 2 s5]]
    #   b = M^T u0:     dM_ab += u0_a db_b,   du0 += M db
    #   uu = u0 . u0:   du0 += 2 duu u0
    sp = [per_g[:, 4 + i] for i in range(6)]
    db = [per_g[:, 10 + i] for i in range(3)]
    duu = per_g[:, 13]
    H = ((2.0 * sp[0], sp[1], sp[2]),
         (sp[1], 2.0 * sp[3], sp[4]),
         (sp[2], sp[4], 2.0 * sp[5]))
    Mc = [[M[:, a, k] for k in range(3)] for a in range(3)]
    dM = jnp.stack(
        [jnp.stack(
            [Mc[a][0] * H[0][bc] + Mc[a][1] * H[1][bc] + Mc[a][2] * H[2][bc]
             + u0[:, a] * db[bc] for bc in range(3)], axis=-1)
         for a in range(3)], axis=-2)
    du0 = jnp.stack(
        [Mc[a][0] * db[0] + Mc[a][1] * db[1] + Mc[a][2] * db[2]
         + 2.0 * duu * u0[:, a] for a in range(3)], axis=-1)
    dcarrier = per_s if per_s is not None else jnp.zeros((P, 3), jnp.float32)
    zconic = jnp.zeros((P, 3), jnp.float32)
    zmean2d = jnp.zeros((P, 2), jnp.float32)
    zf = jnp.zeros((), jnp.float32)
    zbg = jnp.zeros((3,), jnp.float32)
    return (drgb, dop, dM, du0, zconic, zmean2d, dcarrier,
            zf, zf, zbg, None)


rasterize.defvjp(_raster_fwd, _raster_bwd)
