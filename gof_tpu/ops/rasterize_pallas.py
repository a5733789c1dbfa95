"""Pallas TPU rasterizer: fused ray-Gaussian blend, forward + hand-written VJP.

TPU-native replacement for renderCUDA forward/backward
(forward.cu:409-658, backward.cu:633-955). Architecture:

- grid = one program per 32x32-pixel tile; pixels live in the 1024 lanes of
  [G=128, 1024] blocks, so every VPU op is fully utilized;
- the per-chunk linear algebra (ray-space direction d = M r, normal
  n = Sigma r, and u0.d = b.r) is ONE MXU matmul [G, 32] @ [32, 5*1024]
  against a per-tile selection basis (_geometry_basis);
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
  back-to-front re-walk, backward.cu:692-764), and writes per-visit gradient
  rows COMPACTED into the forward's layout — no atomics, and the ~88% of
  slots past saturation (exactly-zero rows) are never stored. Row 31 carries
  each slot's gaussian id, so the deterministic per-Gaussian reduction is a
  single segment-sum over ~25% of capacity (_raster_bwd).

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
# Payload layout: one row of 32 f32 per (tile, Gaussian) visit slot.
# ---------------------------------------------------------------------------
P_COLS = 32
C_RGB = 0  # 0:3
C_OP = 3
C_M = 4  # 4:13 row-major
C_U0 = 13  # 13:16
C_SIG = 16  # 16:22 (xx, xy, xz, yy, yz, zz)
C_B = 22  # 22:25
C_CONIC = 26  # 26:29
C_MEAN2D = 29  # 29:31
# In the gradient slot rows, cols 26:29 are reused for the densification
# stats (gx, gy, |gx|+|gy|) since conic/mean2d are non-differentiable.
G_STATS = 26

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
    """Sigma = M^T M as (..., 6) upper triangle (the reference's v2g[0:6])."""
    S = jnp.einsum("...ji,...jk->...ik", M, M)
    return jnp.stack(
        [S[..., 0, 0], S[..., 0, 1], S[..., 0, 2], S[..., 1, 1], S[..., 1, 2], S[..., 2, 2]],
        axis=-1,
    )


def build_payload32(rgb, op_eff, M, u0, sigma6, bvec, conic, mean2d, binning: Binning) -> jnp.ndarray:
    """Gather per-Gaussian rows into the (tile, depth)-sorted slot layout.

    Sentinel slots gather the appended zero row (opacity 0 -> no
    contribution). Returned TRANSPOSED, [32, CAP]: HBM DMA slices must be
    128-aligned in the lane (last) dimension; the kernels read whole
    CHUNK_SIZE-aligned windows and mask entries outside each tile's segment.
    """
    P = rgb.shape[0]
    # ids ride as exact f32 values through the backward (row 31); beyond
    # 2^24 odd ids would round to even and gradients would silently sum
    # into the wrong gaussians
    assert P < (1 << 24), f"gaussian pool {P} exceeds exact-f32 id range"
    cap = int(binning.slot_to_gaussian.shape[0])
    assert cap < (1 << 24), f"key capacity {cap} exceeds exact-f32 range"
    flat = jnp.concatenate(
        [
            rgb,  # 0:3
            op_eff[:, None],  # 3
            M.reshape(P, 9),  # 4:13
            u0,  # 13:16
            sigma6,  # 16:22
            bvec,  # 22:25
            jnp.zeros((P, 1), rgb.dtype),  # 25
            conic,  # 26:29
            mean2d,  # 29:31
            # 31: the gaussian id as an exact f32 value. The backward kernel
            # echoes it into gradient row 31 so the compacted slot rows carry
            # their own reduction ids (no separate gather/searchsorted).
            jnp.arange(P, dtype=rgb.dtype)[:, None],
        ],
        axis=1,
    )
    sentinel = jnp.zeros((1, P_COLS), flat.dtype).at[0, 31].set(float(P))
    flat = jnp.concatenate([flat, sentinel], axis=0)
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
# (M row 0, M row 1, M row 2, Sigma row 0, b)
_GEOM_COLS = (4, 7, 10, 16, 22)


def _geometry_basis(R3):
    """[32, 5*PIX] block-diagonal-ish selection basis: group g holds R3 at
    payload rows _GEOM_COLS[g]:+3, zeros elsewhere. Built ONCE per tile and
    reused by every chunk, so the five skinny per-group matmuls collapse to
    one [G, 32] @ [32, 5*PIX] MXU call per chunk (a skinny MXU issue carries
    ~1.5 us fixed latency, which dominates at 0.8 MFLOP apiece)."""
    npx = R3.shape[1]
    blocks = []
    for c in _GEOM_COLS:
        blocks.append(jnp.concatenate(
            [jnp.zeros((c, npx), jnp.float32), R3,
             jnp.zeros((P_COLS - c - 3, npx), jnp.float32)], axis=0))
    return jnp.concatenate(blocks, axis=1)


def _chunk_geometry(p, rx, ry, basis5):
    """Ray-space linear algebra for one [CHUNK, 32] payload block: directions
    d = M r, normals n = Sigma r, ud = b.r, dd = |d|^2, peak depth t."""
    npx = basis5.shape[1] // 5
    out = jnp.dot(p, basis5, preferred_element_type=jnp.float32)  # [G, 5*PIX]
    d0 = out[:, 0:npx]
    d1 = out[:, npx : 2 * npx]
    d2 = out[:, 2 * npx : 3 * npx]
    n0 = out[:, 3 * npx : 4 * npx]  # Sigma row 0 (xx, xy, xz)
    ud = out[:, 4 * npx : 5 * npx]
    # Sigma rows 1/2 are non-contiguous in the 6-vector: n1/n2 via VPU madds.
    n1 = p[:, 17:18] * rx + p[:, 19:20] * ry + p[:, 20:21]
    n2 = p[:, 18:19] * rx + p[:, 20:21] * ry + p[:, 21:22]

    dd = rx * n0 + ry * n1 + n2 + 1e-12  # = r^T Sigma r = |d|^2
    t = -ud / dd
    return d0, d1, d2, n0, n1, n2, ud, dd, t


def _chunk_terms(p, rx, ry, basis5, need_normals=True, seg_mask=None):
    """Per-pair blend quantities for one [CHUNK, 32] payload block.

    seg_mask: [CHUNK, 1] bool — False for rows belonging to a neighboring
    tile's segment (unaligned head/tail of the DMA window); they blend and
    backpropagate as exact zeros.
    """
    d0, d1, d2, n0, n1, n2, ud, dd, t = _chunk_geometry(p, rx, ry, basis5)
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
    basis5 = _geometry_basis(R3)
    bg0, bg1, bg2 = meta_ref[0, 2], meta_ref[0, 3], meta_ref[0, 4]

    def copy_in(c, slot):
        return pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(base + c * CHUNK_SIZE, CHUNK_SIZE)],
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
        p = _transpose_mxu(pbuf[slot])  # [32, CHUNK] -> [CHUNK, 32]

        grow = base + c * CHUNK_SIZE + row_i
        seg_mask = (grow >= seg_s) & (grow < seg_e)
        f = _chunk_terms(p, rx, ry, basis5, need_normals=with_reg, seg_mask=seg_mask)
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

        T = T * f.prod_incl[CHUNK_SIZE - 1 : CHUNK_SIZE]
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
    """Run the forward blend kernel. Returns [NTILES, 16, 1024]."""
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
    bounds_ref, live_ref, cstart_ref, meta_ref, payload_hbm, fout_ref, gout_ref,
    dslot_init_hbm, dslot_hbm, dbuf, pbuf, sem, wsem,
):
    del dslot_init_hbm  # aliased with dslot_hbm; provides the zero background
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
    rx, ry, R3, px, py = _rays_for_tile(t_id, ntx, meta_ref)
    basis5 = _geometry_basis(R3)
    bg0, bg1, bg2 = meta_ref[0, 2], meta_ref[0, 3], meta_ref[0, 4]

    # per-pixel cotangents and forward totals
    g_rgb0, g_rgb1, g_rgb2 = gout_ref[0, 0:1, :], gout_ref[0, 1:2, :], gout_ref[0, 2:3, :]
    g_n0, g_n1, g_n2 = gout_ref[0, 3:4, :], gout_ref[0, 4:5, :], gout_ref[0, 5:6, :]
    g_depth = gout_ref[0, 6:7, :]
    g_alpha = gout_ref[0, 7:8, :]
    g_dist = gout_ref[0, 8:9, :]
    T_fin = fout_ref[0, CH_TFINAL : CH_TFINAL + 1, :]
    d1_tot = fout_ref[0, CH_DFINAL : CH_DFINAL + 1, :]
    med_idx = fout_ref[0, CH_MEDIDX : CH_MEDIDX + 1, :]
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

    def copy_out(c, slot):
        return pltpu.make_async_copy(
            dbuf.at[slot],
            dslot_hbm.at[:, pl.ds(cst + c * CHUNK_SIZE, CHUNK_SIZE)],
            wsem.at[slot],
        )

    @pl.when(nc > 0)
    def _():
        copy_in(0, 0).start()

    row_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK_SIZE, 1), 0)
    ones_row = jnp.ones((1, NPIX), jnp.float32)

    def body(carry):
        c, T, PwF = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nc)
        def _():
            copy_in(c + 1, jax.lax.rem(c + 1, 2)).start()

        copy_in(c, slot).wait()
        pv = pbuf[slot]
        p = _transpose_mxu(pv)  # [32, CHUNK] -> [CHUNK, 32]
        gid_row = pv[31:32, :]  # exact f32 gaussian ids (build_payload32)

        grow = base + c * CHUNK_SIZE + row_i
        seg_mask = (grow >= seg_s) & (grow < seg_e)
        f = _chunk_terms(p, rx, ry, basis5, need_normals=with_reg, seg_mask=seg_mask)
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

        if with_reg:
            # distortion (through m only) + median depth -> t
            m = _ndc_m(f.t)
            dL_dm = 2.0 * w * (m * acc_tot - d1_tot) * g_dist
            tc = jnp.maximum(f.t, NEAR_PLANE)
            dm_dt = (FAR_PLANE * NEAR_PLANE) / ((FAR_PLANE - NEAR_PLANE) * tc * tc)
            glob_row = (c * CHUNK_SIZE + row_i).astype(jnp.float32)
            is_med = (glob_row == med_idx) & (f.a > 0)
            dL_dt = dL_dm * dm_dt + jnp.where(is_med, g_depth, 0.0)

            # normal channel -> unnormalized normal
            dnh0 = w * g_n0
            dnh1 = w * g_n1
            dnh2 = w * g_n2
            dot_nh = dnh0 * f.n0 + dnh1 * f.n1 + dnh2 * f.n2
            il2 = f.inv_len * f.inv_len
            dn0 = (-dnh0 + dot_nh * f.n0 * il2) * f.inv_len
            dn1 = (-dnh1 + dot_nh * f.n1 * il2) * f.inv_len
            dn2 = (-dnh2 + dot_nh * f.n2 * il2) * f.inv_len
        else:
            dL_dt = 0.0
            dn0 = dn1 = dn2 = 0.0

        # alpha -> opacity / exponent (clamp ignored, as in the reference)
        op = p[:, 3:4]
        dL_dE = op * dL_da
        dop_pix = f.E * dL_da * f.active
        dL_dmv = -0.5 * f.E * dL_dE * jnp.float32(1.0)
        dL_dmv = jnp.where(f.active, dL_dmv, 0.0)

        # mv = |v|^2, v = u0 + t d, t = -ud/dd, dd = r.n, ud = b.r
        dv0 = 2.0 * f.v0 * dL_dmv
        dv1 = 2.0 * f.v1 * dL_dmv
        dv2 = 2.0 * f.v2 * dL_dmv
        dL_dt_tot = dL_dt + dv0 * f.d0 + dv1 * f.d1 + dv2 * f.d2
        dd0 = f.t * dv0
        dd1 = f.t * dv1
        dd2 = f.t * dv2
        dL_dud = -dL_dt_tot / f.dd
        dL_ddd = -dL_dt_tot * f.t / f.dd
        dn0 = dn0 + dL_ddd * rx
        dn1 = dn1 + dL_ddd * ry
        dn2 = dn2 + dL_ddd

        # densification stats (reference's pseudo-gradient, backward.cu:896-909)
        # — compiled out after densification ends (with_stats=False)
        if with_stats:
            ca, cb, cc = p[:, 26:27], p[:, 27:28], p[:, 28:29]
            dxp = p[:, 29:30] - (px - 0.5)
            dyp = p[:, 30:31] - (py - 0.5)
            dL_dG2 = op * dL_da * f.active
            gx = dL_dG2 * (-f.E) * (ca * dxp + cb * dyp) * halfw
            gy = dL_dG2 * (-f.E) * (cb * dxp + cc * dyp) * halfh

        # Reduce over pixels into per-slot gradient rows. All ~12-15
        # projections (basis [k, PIX] . X [G, PIX] -> [k, G]) are batched
        # into ONE MXU call: basis rows stack to [7, PIX], the X blocks
        # stack along the G axis, and each result is a sub-block of the
        # [7, nb*G] product — a skinny matmul's ~1.5 us fixed latency would
        # otherwise dominate the backward at ~0.8 MFLOP apiece.
        Gn = CHUNK_SIZE
        basis = jnp.concatenate([R3, G_RGB, ones_row], axis=0)  # [7, PIX]
        rhs = [dd0, dd1, dd2, dn0, dn1, dn2, dL_dud, w, dv0, dv1, dv2, dop_pix]
        if with_stats:
            rhs += [gx, gy, jnp.abs(gx) + jnp.abs(gy)]
        out_all = _dot_nt(basis, jnp.concatenate(rhs, axis=0))  # [7, nb*G]

        def blk(i, r0, r1):
            return out_all[r0:r1, i * Gn : (i + 1) * Gn]

        dM0_t = blk(0, 0, 3)  # [3, G] = rows (d/drx, d/dry, d/d1) of dM row 0
        dM1_t = blk(1, 0, 3)
        dM2_t = blk(2, 0, 3)
        dn0_t = blk(3, 0, 3)
        dn1_t = blk(4, 0, 3)
        dn2_t = blk(5, 0, 3)
        db_t = blk(6, 0, 3)
        drgb_t = blk(7, 3, 6)
        du0_t = jnp.concatenate([blk(8, 6, 7), blk(9, 6, 7), blk(10, 6, 7)], axis=0)
        dop_t = blk(11, 6, 7)
        if with_stats:
            stats_t = jnp.concatenate(
                [blk(12, 6, 7), blk(13, 6, 7), blk(14, 6, 7)], axis=0)
        else:
            stats_t = jnp.zeros((3, CHUNK_SIZE), jnp.float32)
        dsig_t = jnp.concatenate(
            [
                dn0_t[0:1],
                dn0_t[1:2] + dn1_t[0:1],
                dn0_t[2:3] + dn2_t[0:1],
                dn1_t[1:2],
                dn1_t[2:3] + dn2_t[1:2],
                dn2_t[2:3],
            ],
            axis=0,
        )
        zero1 = jnp.zeros((1, Gn), jnp.float32)
        drow_t = jnp.concatenate(
            [
                drgb_t,  # 0:3
                dop_t,  # 3
                dM0_t, dM1_t, dM2_t,  # 4:13
                du0_t,  # 13:16
                dsig_t,  # 16:22
                db_t,  # 22:25
                zero1,  # 25
                stats_t,  # 26:29
                zero1, zero1,  # 29:31
                gid_row,  # 31: reduction id, rides the output DMA
            ],
            axis=0,
        )

        wslot = jax.lax.rem(c, 2)

        @pl.when(c >= 2)
        def _():
            copy_out(c - 2, wslot).wait()

        dbuf[wslot] = drow_t
        copy_out(c, wslot).start()

        T = T * f.prod_incl[CHUNK_SIZE - 1 : CHUNK_SIZE]
        PwF = incl[CHUNK_SIZE - 1 : CHUNK_SIZE]
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

    # drain outstanding writes
    @pl.when(c_end >= 2)
    def _():
        copy_out(c_end - 2, jax.lax.rem(c_end - 2, 2)).wait()

    @pl.when(c_end >= 1)
    def _():
        copy_out(c_end - 1, jax.lax.rem(c_end - 1, 2)).wait()


def compact_capacity_for(capacity: int, ntiles: int) -> int:
    """Compact-buffer size that can never overflow (every tile fully live)."""
    return capacity + ntiles * CHUNK_SIZE


def rasterize_bwd_pallas(
    payload, fout, gout, binning: Binning, meta_vec, ntx: int, ntiles: int,
    halfw: float, halfh: float, interpret=False, with_stats=True, with_reg=True,
    compact_cap: int = 0,
):
    """Run the backward kernel.

    Returns COMPACTED per-slot gradient rows [32, compact_cap]: each tile's
    live (pre-saturation) chunks are packed at the compact start the forward
    assigned it (fout channels CH_LIVEC / CH_CSTART); row 31 carries the f32
    gaussian id of each slot for the subsequent segment-sum. With the default
    compact_cap = capacity + ntiles*CHUNK the packing cannot overflow; a
    tighter cap must be guarded by the forward-side demand telemetry.
    """
    cap = payload.shape[1]
    if compact_cap <= 0:
        compact_cap = compact_capacity_for(cap, ntiles)
    # the compact cursor (CH_CSTART) round-trips through f32 fout channels;
    # past 2^24 it would round and break the CHUNK_SIZE alignment promise,
    # silently corrupting compact gradient writes
    assert compact_cap < (1 << 24), (
        f"compact capacity {compact_cap} exceeds exact-f32 cursor range")
    live = fout[:, CH_LIVEC, 0].astype(jnp.int32)
    cstart = fout[:, CH_CSTART, 0].astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda t, *s: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, OUT_CH, NPIX), lambda t, *s: (t, 0, 0)),
            pl.BlockSpec((1, OUT_CH, NPIX), lambda t, *s: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, P_COLS, CHUNK_SIZE), jnp.float32),
            pltpu.VMEM((2, P_COLS, CHUNK_SIZE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # The output is aliased to a zero-initialized input so the region beyond
    # the final cursor keeps exactly-zero gradient rows (id 0, zero add).
    dslot_init = jnp.zeros((P_COLS, compact_cap), jnp.float32)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, ntx, halfw, halfh, with_stats, with_reg,
                          compact_cap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P_COLS, compact_cap), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        input_output_aliases={7: 0},
    )(binning.bounds, live, cstart, meta_vec, payload, fout, gout, dslot_init)


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
def rasterize(meta: RasterMeta, rgb, op_eff, M, u0, sigma6, bvec, conic, mean2d,
              carrier, focal_x, focal_y, bg, binning: Binning):
    """Differentiable tiled rasterization -> [NTILES, 16, 1024].

    carrier: [P, 3] zeros whose cotangent carries the densification stats
    (the reference's screenspace_points trick, gaussian_renderer/__init__.py:
    26-30 + train.py:253-256). Aux channels 9..15 get zero cotangent.
    """
    out, _ = _raster_fwd(meta, rgb, op_eff, M, u0, sigma6, bvec, conic, mean2d,
                         carrier, focal_x, focal_y, bg, binning)
    return out


def _raster_fwd(meta, rgb, op_eff, M, u0, sigma6, bvec, conic, mean2d, carrier,
                focal_x, focal_y, bg, binning):
    mv = _meta_vec(focal_x, focal_y, bg, meta.width, meta.height)
    payload = build_payload32(rgb, op_eff, M, u0, sigma6, bvec, conic, mean2d, binning)
    out = rasterize_fwd_pallas(payload, binning, mv, meta.ntx, meta.ntx * meta.nty,
                               interpret=meta.interpret, with_reg=meta.with_reg)
    res = (payload, out, binning, mv, rgb.shape[0])
    return out, res


def _raster_bwd(meta, res, gout):
    payload, fout, binning, mv, P = res
    dslot_t = rasterize_bwd_pallas(
        payload, fout, gout, binning, mv, meta.ntx, meta.ntx * meta.nty,
        meta.width / 2.0, meta.height / 2.0, interpret=meta.interpret,
        with_stats=meta.with_stats, with_reg=meta.with_reg,
        compact_cap=meta.compact_cap,
    )
    # Row 31 carries each compact row's gaussian id (payload col 31): padded
    # sentinel slots carry P, the zero tail carries 0 with zero rows — both
    # reduce harmlessly. ~4x fewer rows than the old CAP-wide segment-sum.
    gid = dslot_t[31].astype(jnp.int32)
    per_g = jax.ops.segment_sum(dslot_t.T, gid, num_segments=P + 1)[:P]
    drgb = per_g[:, 0:3]
    dop = per_g[:, 3]
    dM = per_g[:, 4:13].reshape(P, 3, 3)
    du0 = per_g[:, 13:16]
    dsig = per_g[:, 16:22]
    db = per_g[:, 22:25]
    dcarrier = per_g[:, G_STATS : G_STATS + 3]
    zconic = jnp.zeros((P, 3), jnp.float32)
    zmean2d = jnp.zeros((P, 2), jnp.float32)
    zf = jnp.zeros((), jnp.float32)
    zbg = jnp.zeros((3,), jnp.float32)
    return (drgb, dop, dM, du0, dsig, db, zconic, zmean2d, dcarrier,
            zf, zf, zbg, None)


rasterize.defvjp(_raster_fwd, _raster_bwd)
