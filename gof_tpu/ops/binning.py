"""Tile binning: deterministic, scatter-free, static-shape.

TPU-native replacement for the reference's cub-based binning
(duplicateWithKeys / radix sort / identifyTileRanges,
rasterizer_impl.cu:70-171,330-373). Differences by design:

- tiles are 32x32 pixels (TPU (8,128) vector layout), not 16x16 CUDA blocks;
- the duplicated key list has a *static* capacity. Overflow drops the
  highest-index Gaussians' surplus keys and is reported so the host can
  re-jit with a larger capacity (the training loop skips the parameter
  update on overflow steps, so the drop order is immaterial);
- keys are expanded by pure delta-scatter+cumsum gathers in original
  Gaussian order, then one 2-key sort by (tile, depth-bits) carrying the
  Gaussian id yields the (tile, depth)-ordered list — the same order the
  reference's radix sort produces (tile << 32 | float_bits(depth),
  rasterizer_impl.cu:70-111);
- tile segments are *unaligned*: the blend kernels DMA chunks starting at
  aligned_down(seg_start) and mask the head/tail entries that belong to
  neighboring tiles. No per-tile padding, no relayout gather.

Everything is gather/cumsum/sort based — no capacity-sized scatter, no
atomics, and the result is bit-deterministic run to run.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import TILE_H, TILE_W

CHUNK_SIZE = 128  # Gaussians per VMEM chunk in the blend kernels


class TileRect(NamedTuple):
    x0: jnp.ndarray  # inclusive tile mins (int32)
    y0: jnp.ndarray
    w: jnp.ndarray  # rect extents in tiles (int32, >= 0)
    h: jnp.ndarray


def tile_grid(width: int, height: int):
    """Number of tiles along x/y for an image."""
    ntx = -(-width // TILE_W)
    nty = -(-height // TILE_H)
    return ntx, nty


def gaussian_rects(mean2d: jnp.ndarray, radius: jnp.ndarray, valid: jnp.ndarray, ntx: int, nty: int,
                   radius_xy: jnp.ndarray | None = None) -> TileRect:
    """Tile rect per Gaussian (getRect, auxiliary.h:64-74). Unbounded, as in
    the reference (forward.cu:363-371): a near-camera Gaussian may cover the
    whole tile grid; the static key capacity + host growth absorb it.

    radius_xy: optional (P, 2) per-axis half-extents (the ellipse-aligned
    bbox from preprocess) — strictly inside the circumscribed circle, so the
    rect covers everything above the 1/255 alpha cutoff with fewer tiles.
    """
    px, py = mean2d[:, 0], mean2d[:, 1]
    if radius_xy is None:
        rx = ry = radius
    else:
        rx, ry = radius_xy[:, 0], radius_xy[:, 1]
    x0 = jnp.clip(jnp.floor((px - rx) / TILE_W).astype(jnp.int32), 0, ntx)
    y0 = jnp.clip(jnp.floor((py - ry) / TILE_H).astype(jnp.int32), 0, nty)
    x1 = jnp.clip(jnp.floor((px + rx + TILE_W - 1) / TILE_W).astype(jnp.int32), 0, ntx)
    y1 = jnp.clip(jnp.floor((py + ry + TILE_H - 1) / TILE_H).astype(jnp.int32), 0, nty)
    w = jnp.maximum(x1 - x0, 0)
    h = jnp.maximum(y1 - y0, 0)
    w = jnp.where(valid, w, 0)
    h = jnp.where(valid, h, 0)
    return TileRect(x0=x0, y0=y0, w=w, h=h)


class Binning(NamedTuple):
    """Static-capacity (tile, depth)-sorted duplicated Gaussian list.

    All arrays are jit-stable shapes; `slot_to_gaussian` indexes into the
    original (unsorted) Gaussian arrays. Slots not backed by a real
    (Gaussian, tile) pair hold gaussian id P (one-past-the-end, for padded
    gathers) and sort to the end (sentinel tile), outside every segment.
    """

    slot_to_gaussian: jnp.ndarray  # [CAP] int32, == P for padding
    bounds: jnp.ndarray  # [NTILES+1] int32: tile t owns slots [b[t], b[t+1])
    dup_offsets: jnp.ndarray  # [P+1] int32 exclusive dup offsets (original order)
    num_keys: jnp.ndarray  # scalar int32: REAL duplicated keys (pre-drop)
    overflow: jnp.ndarray  # scalar bool: capacity exceeded (surplus dropped)
    num_slots: jnp.ndarray  # scalar int32: slot demand incl. the one DEAD
    # slot each culled gaussian owns (strictly-ascending offsets for the
    # expand kernel) — what capacity sizing must satisfy


def _expand(values: jnp.ndarray, starts: jnp.ndarray, in_cap: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Expand per-segment int32 constants to per-slot values.

    Segment i covers slots [starts[i], starts[i+1]); values repeat across
    each segment. Implemented as delta[starts[i]] += v[i] - v[i-1]; cumsum.
    Empty segments (duplicate starts) telescope correctly through the
    scatter-add. Cost: one small scatter (len(values) rows) + one cumsum.
    """
    v = values.astype(jnp.int32)
    prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), v[:-1]])
    delta = jnp.where(in_cap, v - prev, 0)
    d = jnp.zeros((capacity,), jnp.int32).at[starts].add(delta, mode="drop")
    return jnp.cumsum(d)


def _bounds_by_bisection(sorted_keys: jnp.ndarray, nseg: int) -> jnp.ndarray:
    """searchsorted(sorted_keys, arange(nseg+1), side='left') via an explicit
    bisection loop: log2(CAP) iterations of one [nseg+1]-element gather each
    (XLA's searchsorted lowers to a full-length scan here — measured 4.7 ms
    at 1M keys vs <0.5 ms for this)."""
    n = sorted_keys.shape[0]
    q = jnp.arange(nseg + 1, dtype=sorted_keys.dtype)
    lo = jnp.zeros((nseg + 1,), jnp.int32)  # invariant: keys[lo-1] < q
    hi = jnp.full((nseg + 1,), n, jnp.int32)  # invariant: keys[hi] >= q
    steps = n.bit_length() + 1  # interval [0, n] needs ceil(log2(n+1)) halvings

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) >> 1
        v = sorted_keys[jnp.clip(mid, 0, n - 1)]
        go_right = v < q
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return hi.astype(jnp.int32)


def bin_gaussians(
    depth: jnp.ndarray,
    rects: TileRect,
    ntx: int,
    nty: int,
    capacity: int,
    use_expand_kernel: bool | None = None,
    interpret: bool = False,
) -> Binning:
    """Build the (tile, depth)-ordered duplicated Gaussian list.

    Args:
      depth: [P] view-space depths (> 0 for valid Gaussians; invalid
        Gaussians have rects.w/h == 0 and may hold anything).
      capacity: static maximum number of duplicated keys (multiple of 128).
      use_expand_kernel: expand keys with the sliding-window Pallas kernel
        (ops/expand.py) instead of the XLA scatter+cumsum+gather chain
        (those are scalar-pipeline ops costing 10s of ms at millions of
        keys; the kernel rides the MXU). Default: kernel on an accelerator
        or when interpreting; XLA chain on plain CPU.
    """
    if use_expand_kernel is None:
        from . import expand as expand_lib

        use_expand_kernel = interpret or (
            jax.default_backend() != "cpu" and expand_lib.kernel_available())
    # Kernels DMA whole CHUNK_SIZE-aligned windows; round the slot array up.
    capacity = -(-capacity // CHUNK_SIZE) * CHUNK_SIZE
    P = depth.shape[0]
    ntiles = ntx * nty
    counts_real = (rects.w * rects.h).astype(jnp.int32)  # [P]
    # Every gaussian emits >= 1 key (invalid ones a DEAD key that sorts with
    # the padding sentinel and is never touched by any kernel): strictly
    # ascending duplication offsets bound the expand kernel's window span to
    # chunk+1 gaussians regardless of how many culled gaussians interleave.
    # Cost: <= P extra capacity, only on sort/expand (dead keys live past
    # every tile segment).
    counts = jnp.maximum(counts_real, 1)
    dead = counts_real == 0

    # 1. duplication offsets in original Gaussian order
    off = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])  # [P+1]
    num_keys = off[-1]  # padded slot demand; real count reported separately
    num_real = num_keys - jnp.sum(dead.astype(jnp.int32))
    # Detect int32 wrap: with unbounded rects many grid-covering gaussians can
    # push the true total past 2^31 (exactly the exploding-scale states the
    # overflow gate must catch); a wrapped cumsum would read negative and make
    # `num_keys > capacity` a false negative. Counts are per-gaussian bounded
    # by ntiles, so a saturating f64-free check is enough: any negative prefix
    # means wrap.
    wrapped = jnp.min(off) < 0
    overflow = (num_keys > capacity) | wrapped
    num_keys = jnp.where(wrapped, jnp.int32(2**31 - 1), num_keys)

    packed_rect = (
        rects.x0.astype(jnp.int32)
        | (rects.y0.astype(jnp.int32) << 10)
        | (jnp.minimum(rects.w, 1023).astype(jnp.int32) << 20)
    )
    depth_i = jax.lax.bitcast_convert_type(depth.astype(jnp.float32), jnp.int32)

    if use_expand_kernel:
        from . import expand as expand_lib

        tile, depth_bits, gid_s = expand_lib.expand_keys_pallas(
            off[:-1], packed_rect, depth_i, dead,
            jnp.minimum(num_keys, capacity),
            P, ntx, ntiles, capacity, interpret=interpret)
        gid_sort = jnp.minimum(gid_s, P)  # kernel sentinel -> P
    else:
        starts = jnp.clip(off[:-1], 0, capacity - 1).astype(jnp.int32)
        in_cap = off[:-1] < capacity

        # 2. expand per-Gaussian values to dup slots. Wide scatters fall off
        #    a ~10x XLA performance cliff, so ONLY the gaussian id is
        #    expanded by a 1-column delta-scatter + cumsum; everything else
        #    is a narrow-row table gather by that id.
        k = jnp.arange(capacity, dtype=jnp.int32)
        dup_valid = k < num_keys
        gid_vals = jnp.arange(P, dtype=jnp.int32)
        gid_prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), gid_vals[:-1]])
        gid_delta = jnp.where(in_cap, gid_vals - gid_prev, 0)
        d = jnp.zeros((capacity,), jnp.int32).at[starts].add(
            gid_delta, mode="drop", indices_are_sorted=True)
        gid = jnp.cumsum(d)  # [CAP]

        # per-slot attributes via ONE [P, 4] int32 gather: duplication
        # offset, packed rect (x0 | y0 | w in 10-bit fields), depth sort
        # bits (view depths are > 0, so the f32 bit pattern is
        # order-preserving as int32 — the reference packs the same float
        # bits into its radix key, rasterizer_impl.cu:102)
        tbl = jnp.stack(
            [off[:-1], packed_rect, depth_i, dead.astype(jnp.int32)],
            axis=1,
        )  # [P, 4]
        attrs = tbl[gid]  # [CAP, 4]
        off_exp = attrs[:, 0]
        x0e = attrs[:, 1] & 1023
        y0e = (attrs[:, 1] >> 10) & 1023
        rw = jnp.maximum((attrs[:, 1] >> 20) & 1023, 1)
        depth_bits = attrs[:, 2]
        live = dup_valid & (attrs[:, 3] == 0)
        j = k - off_exp
        tile = (y0e + j // rw) * ntx + x0e + j % rw  # [CAP]
        tile = jnp.where(live, tile, ntiles)  # sentinel sorts last
        depth_bits = jnp.where(live, depth_bits, jnp.int32(2**31 - 1))
        gid_sort = jnp.where(live, gid, P)

    # 3. one sort by (tile, depth) carrying the gaussian ids. Stable: ties
    # (bitwise-equal depths in one tile, common right after clone
    # densification) then keep the pre-sort order = original gaussian-id
    # order, reproducing cub's stable radix SortPairs tie behavior
    # (rasterizer_impl.cu:355-363).
    tile_sorted, _, gauss_sorted = jax.lax.sort(
        (tile, depth_bits, gid_sort), num_keys=2, is_stable=True
    )

    # 4. per-tile segment bounds. Entries of one tile are contiguous after
    #    the sort, so end(t) == start(t+1).
    bounds = _bounds_by_bisection(tile_sorted, ntiles)

    return Binning(
        slot_to_gaussian=gauss_sorted,
        bounds=bounds,
        dup_offsets=off.astype(jnp.int32),
        num_keys=jnp.where(wrapped, jnp.int32(2**31 - 1),
                           num_real).astype(jnp.int32),
        overflow=overflow,
        num_slots=num_keys.astype(jnp.int32),
    )


def reduce_per_gaussian(
    dslot: jnp.ndarray, binning: Binning, num_gaussians: int
) -> jnp.ndarray:
    """Deterministically reduce per-slot gradients to per-Gaussian gradients.

    Replaces the reference's atomicAdd gradient accumulation
    (backward.cu:824-952) with XLA's segment-sum (sorted scatter-add) — the
    fastest deterministic reduction measured (~20 ns/row); slot ids for
    padded slots are P (one-past-the-end) and fall into the dropped tail.

    Args:
      dslot: [CAP, D] per-slot gradient rows.
    Returns:
      [P, D] per-Gaussian sums (original Gaussian indexing).
    """
    sums = jax.ops.segment_sum(
        dslot, binning.slot_to_gaussian, num_segments=num_gaussians + 1
    )
    return sums[:num_gaussians]


# ---------------------------------------------------------------------------
# Block-aligned relayout (point-integration path only)
# ---------------------------------------------------------------------------


class AlignedBins(NamedTuple):
    """Per-tile lists padded to `block`-aligned segments (the round-1 layout,
    kept for the point side of the integrate kernel where each tile's query
    points fill whole 1024-lane blocks)."""

    slot_to_item: jnp.ndarray  # [CAP_PAD] int32, == N for padding
    tile_start: jnp.ndarray  # [NTILES] int32 block-aligned segment starts
    tile_blocks: jnp.ndarray  # [NTILES] int32 number of blocks
    num_keys: jnp.ndarray
    overflow: jnp.ndarray


def aligned_capacity(capacity: int, ntiles: int, block: int) -> int:
    cap_pad = capacity + ntiles * (block - 1)
    return -(-cap_pad // block) * block


def bin_items_aligned(
    tile_of_item: jnp.ndarray,  # [N] int32 tile id (ntiles = invalid)
    ntiles: int,
    capacity: int,
    block: int,
) -> AlignedBins:
    """Bin items that each touch exactly one tile into block-padded segments."""
    N = tile_of_item.shape[0]
    k = jnp.arange(capacity, dtype=jnp.int32)
    if capacity < N:
        raise ValueError("capacity must cover all items (one tile per item)")
    tile = jnp.full((capacity,), ntiles, jnp.int32).at[:N].set(tile_of_item)
    item = jnp.full((capacity,), N, jnp.int32).at[:N].set(
        jnp.arange(N, dtype=jnp.int32)
    )
    valid = tile < ntiles
    num_keys = jnp.sum(valid.astype(jnp.int32))
    tile_sorted, item_sorted = jax.lax.sort(
        (tile, jnp.where(valid, item, N)), num_keys=1, is_stable=True
    )
    bounds = _bounds_by_bisection(tile_sorted, ntiles)
    seg_start = bounds[:-1]
    seg_len = bounds[1:] - seg_start
    blocks = -(-seg_len // block)
    pad_len = blocks * block
    pad_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(pad_len).astype(jnp.int32)]
    )

    cap_pad = aligned_capacity(capacity, ntiles, block)
    f = jnp.arange(cap_pad, dtype=jnp.int32)
    pstart_clip = jnp.clip(pad_start[:-1], 0, cap_pad - 1)
    in_cap = jnp.ones((ntiles,), bool)
    seg_start_f = _expand(seg_start, pstart_clip, in_cap, cap_pad)
    pad_start_f = _expand(pad_start[:-1], pstart_clip, in_cap, cap_pad)
    seg_len_f = _expand(seg_len, pstart_clip, in_cap, cap_pad)
    local = f - pad_start_f
    src = jnp.clip(seg_start_f + local, 0, capacity - 1)
    in_seg = (local < seg_len_f) & (local >= 0)
    slot_to_item = jnp.where(in_seg, item_sorted[src], N)

    return AlignedBins(
        slot_to_item=slot_to_item,
        tile_start=pad_start[:-1],
        tile_blocks=blocks,
        num_keys=num_keys,
        overflow=jnp.asarray(False),
    )
