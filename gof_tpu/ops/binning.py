"""Tile binning: deterministic, scatter-free, static-shape.

TPU-native replacement for the reference's cub-based binning
(duplicateWithKeys / radix sort / identifyTileRanges,
rasterizer_impl.cu:70-171,330-373). Differences by design:

- tiles are 32x32 pixels (TPU (8,128) vector layout), not 16x16 CUDA blocks;
- the duplicated key list has a *static* capacity. Overflow drops surplus
  keys and is reported so the host can re-jit with a larger capacity (the
  training loop skips the parameter update on overflow steps, so the drop
  order is immaterial);
- key expansion is CLOSED-FORM: gaussians are sorted into size classes
  (padded per-gaussian key counts), so slot -> owning gaussian is uniform-
  stride arithmetic per class — no prefix scan over the key list, no
  scatter, no sequential window walk. One narrow attrs gather per slot and
  one 3-key sort by (tile, depth-bits, gaussian id) produce the
  (tile, depth)-ordered list with EXACTLY the reference's tie order
  (cub's stable radix sort keeps original gaussian order on equal keys,
  rasterizer_impl.cu:355-363 — here the id is the explicit third key);
- tile segments are *unaligned*: the blend kernels DMA chunks starting at
  aligned_down(seg_start) and mask the head/tail entries that belong to
  neighboring tiles. No per-tile padding, no relayout gather.

Everything is gather/sort based — no capacity-sized scatter, no atomics,
and the result is bit-deterministic run to run. At the late-training design
point (1M gaussians / 3.2M keys / 4.2M capacity on TPU v5e) this pipeline
costs ~35 ms vs ~99 ms for the round-3 sliding-window expansion kernel
(whose one-hot MXU gather paid W*128 MACs per slot).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import TILE_H, TILE_W
from . import class_gather

CHUNK_SIZE = 128  # Gaussians per VMEM chunk in the blend kernels

# Size classes for the closed-form expansion: exact classes 1..EXACT_MAX
# (zero padding waste for the common small rects), then powers of two.
# Padded slot overhead is <= 2x only for counts > EXACT_MAX (rare giants).
EXACT_MAX = 32


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
    num_keys: jnp.ndarray  # scalar int32: REAL materialized keys (post
    # circle-cull, == bounds[-1])
    overflow: jnp.ndarray  # scalar bool: capacity exceeded (surplus dropped)
    num_slots: jnp.ndarray  # scalar int32: class-padded slot demand — what
    # capacity sizing must satisfy (>= num_keys; the pad is the per-class
    # rounding of each gaussian's key count)
    # per-slot payload rows carried THROUGH the sorts (f32 bit patterns in
    # int32, [NC, CAP]), when the caller passed payload_cols: the post-sort
    # `flat[slot_to_gaussian]` row gather this replaces costs ~10 ms/column
    # at 7.3M slots (XLA lowers it to a scalar pipeline) while extra sort
    # operands are FREE (measured: the 3-key 7.3M-row sort is 17.8 ms with
    # 0 extras and 17.9 ms with 24) and the pre-sort class_gather resolves
    # monotonic indices on the MXU at ~10x the gather's rate.
    payload: jnp.ndarray | None = None


def _searchsorted_left(sorted_keys: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """searchsorted(sorted_keys, queries, side='left') via an explicit
    bisection loop: log2(N) iterations of one [Q]-element gather each
    (XLA's searchsorted lowers to a full-length scan here — measured 4.7 ms
    at 1M keys vs <0.5 ms for this)."""
    n = sorted_keys.shape[0]
    q = queries.astype(sorted_keys.dtype)
    nq = q.shape[0]
    lo = jnp.zeros((nq,), jnp.int32)  # invariant: keys[lo-1] < q
    hi = jnp.full((nq,), n, jnp.int32)  # invariant: keys[hi] >= q
    steps = n.bit_length() + 1  # interval [0, n] needs ceil(log2(n+1)) halvings

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) >> 1
        v = sorted_keys[jnp.clip(mid, 0, n - 1)]
        go_right = v < q
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return hi.astype(jnp.int32)


def _bounds_by_bisection(sorted_keys: jnp.ndarray, nseg: int) -> jnp.ndarray:
    return _searchsorted_left(sorted_keys,
                              jnp.arange(nseg + 1, dtype=sorted_keys.dtype))


def class_sizes(max_count: int) -> list[int]:
    """Static padded-size ladder: 1..EXACT_MAX exact, then powers of two
    covering max_count (= ntiles for unbounded rects)."""
    sizes = list(range(1, EXACT_MAX + 1))
    s = EXACT_MAX * 2
    while s < max_count:
        sizes.append(s)
        s *= 2
    if max_count > EXACT_MAX:
        sizes.append(s)
    return sizes


def _floor_div(num: jnp.ndarray, den: jnp.ndarray) -> jnp.ndarray:
    """Exact floor(num / den) for int32 num >= 0, den >= 1 via f32 division
    with a +-1 correction (num < 2^24 so the correction window is 1)."""
    q = jnp.floor(num.astype(jnp.float32) / den.astype(jnp.float32)).astype(jnp.int32)
    r = num - q * den
    q = jnp.where(r < 0, q - 1, q)
    r = num - q * den
    q = jnp.where(r >= den, q + 1, q)
    return q


def bin_gaussians(
    depth: jnp.ndarray,
    rects: TileRect,
    ntx: int,
    nty: int,
    capacity: int,
    mean2d: jnp.ndarray | None = None,
    radius: jnp.ndarray | None = None,
    gather_force: str | None = None,
    payload_cols: list[jnp.ndarray] | None = None,
) -> Binning:
    """Build the (tile, depth)-ordered duplicated Gaussian list.

    Args:
      depth: [P] view-space depths (> 0 for valid Gaussians; invalid
        Gaussians have rects.w/h == 0 and may hold anything).
      capacity: static maximum number of padded key slots (rounded up to a
        multiple of CHUNK_SIZE).
      mean2d/radius: optional [P, 2] pixel centers + [P] circumscribed
        radii. When given, keys whose whole tile lies farther than `radius`
        from the center are culled (the bbox's corner tiles): alpha there
        is below the 1/255 blend cutoff, so the rendered image is identical
        while the per-tile lists shrink ~15% (the reference bins the full
        circle bbox, forward.cu:363-371 — this is a strict-subset
        refinement of the same approximation).
      payload_cols: optional list of [P] f32 per-gaussian columns to deliver
        in sorted-slot order as Binning.payload [NC, CAP] (f32 bits in
        int32). They ride the class sort, the class_gather, and the 3-key
        sort — all measured ~free in extra operands — replacing the
        caller's post-sort `flat[slot_to_gaussian]` row gather (~10 ms per
        column at the 3M-gaussian design point). Values are stop_gradient'd
        (the rasterizer's custom_vjp routes payload gradients manually).

    Pipeline (all static shapes):
      1. per-gaussian key count -> padded size class (elementwise ladder);
      2. one [P] sort by padded size (carrying the id) groups gaussians
         into contiguous classes; class boundaries by bisection;
      3. slot k's owner is CLOSED FORM: inside class c (uniform stride S_c)
         owner-rank = (k - class_start_c) // S_c — no scan over the key
         list; one narrow 4-column attrs gather resolves (rect, depth bits,
         count, id);
      4. one 3-key sort by (tile, depth-bits, id). Depths are > 0 so the
         f32 bit pattern is order-preserving as int32 — the same float-bits
         trick as the reference's radix key (rasterizer_impl.cu:102); the
         id key reproduces cub's stable tie order exactly.
    """
    # Kernels DMA whole CHUNK_SIZE-aligned windows; round the slot array up.
    capacity = -(-capacity // CHUNK_SIZE) * CHUNK_SIZE
    P = depth.shape[0]
    ntiles = ntx * nty
    counts = (rects.w * rects.h).astype(jnp.int32)  # [P]

    sizes = class_sizes(ntiles)
    nc = len(sizes)
    sizes_np = np.asarray(sizes, np.int32)

    # 1. padded size per gaussian (0 for culled): descending where-ladder is
    # exact for any count (no float log edge cases)
    padded = jnp.full_like(counts, sizes[-1])
    for s in reversed(sizes[:-1]):
        padded = jnp.where(counts <= s, s, padded)
    padded = jnp.where(counts > 0, padded, 0)

    # 2. group gaussians by class: one [P] sort carrying the id AND the
    # per-gaussian attrs (extra sort operands are nearly free at [P] scale,
    # while a separate [P]-row permutation gather costs ~5 ms at 1M)
    gid = jnp.arange(P, dtype=jnp.int32)
    packed_rect = (
        rects.x0.astype(jnp.int32)
        | (rects.y0.astype(jnp.int32) << 10)
        | (jnp.minimum(rects.w, 1023).astype(jnp.int32) << 20)
    )
    depth_i = jax.lax.bitcast_convert_type(depth.astype(jnp.float32), jnp.int32)
    cull = mean2d is not None and radius is not None

    def f2i(x):
        return jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)

    extra = ((f2i(mean2d[:, 0]), f2i(mean2d[:, 1]), f2i(radius))
             if cull else ())
    pay = tuple(f2i(jax.lax.stop_gradient(c)) for c in (payload_cols or ()))
    sorted_cols = jax.lax.sort(
        (padded, packed_rect, depth_i, counts, gid) + extra + pay,
        num_keys=1, is_stable=True)
    gs_pad, rect_c, depth_c, cnt_c, gs_gid = sorted_cols[:5]
    # class c owns gaussians [gb[c], gb[c+1]) (padded values are exactly
    # class sizes, so bisection at the next size closes each class)
    queries = jnp.asarray(np.concatenate([sizes_np, [sizes_np[-1] + 1]]), jnp.int32)
    gb = _searchsorted_left(gs_pad, queries)  # [nc+1]
    n_c = gb[1:] - gb[:-1]
    nslots_c = n_c * sizes_np
    class_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nslots_c).astype(jnp.int32)])

    # int32-wrap detection (f32 shadow: exact enough to flag > 2^31 totals)
    tot_f = jnp.sum(n_c.astype(jnp.float32) * sizes_np.astype(jnp.float32))
    wrapped = tot_f > jnp.float32(2**31 - 1)
    num_slots = jnp.where(wrapped, jnp.int32(2**31 - 1), class_start[-1])
    overflow = (num_slots > capacity) | wrapped

    # 3. per-slot owner arithmetic (elementwise over [CAP])
    k = jnp.arange(capacity, dtype=jnp.int32)
    stride = jnp.full((capacity,), sizes[0], jnp.int32)
    cbase = jnp.zeros((capacity,), jnp.int32)
    gbase = jnp.broadcast_to(gb[0], (capacity,))
    for c in range(1, nc):
        m = k >= class_start[c]
        stride = jnp.where(m, sizes[c], stride)
        cbase = jnp.where(m, class_start[c], cbase)
        gbase = jnp.where(m, gb[c], gbase)
    local = k - cbase
    rank = _floor_div(jnp.maximum(local, 0), stride)
    gidx = gbase + rank
    j = local - rank * stride

    # attrs in class-sorted order (carried by the class sort above): the
    # single key-list-sized lookup in the whole binning pipeline. gidx is
    # monotonic with steps in {0, 1}, so the windowed indicator-matmul
    # kernel resolves it bit-exactly at ~10x the XLA gather's rate
    # (class_gather.py; auto-falls back to the gather off-TPU).
    cnt_b = (max(ntiles, 1).bit_length() + 7) // 8
    gid_b = (max(P, 1).bit_length() + 7) // 8
    attr_cols = [(rect_c, 4), (depth_c, 4), (cnt_c, cnt_b), (gs_gid, gid_b)]
    attr_cols += [(c, 4) for c in sorted_cols[5:]]
    a = class_gather.expand(attr_cols, gidx, P, force=gather_force)
    rect_s, depth_s, cnt_s, gid_s = a[0], a[1], a[2], a[3]

    nsl = jnp.where(wrapped, 0, num_slots)
    live = (k < nsl) & (j < cnt_s) & (gidx < P)

    x0e = rect_s & 1023
    y0e = (rect_s >> 10) & 1023
    rw = jnp.maximum((rect_s >> 20) & 1023, 1)
    jdiv = _floor_div(j, rw)
    jmod = j - jdiv * rw
    tilex = x0e + jmod
    tiley = y0e + jdiv
    tile = tiley * ntx + tilex  # [CAP]
    if cull:
        # circle-vs-tile test: the rect is the bbox of the alpha >= 1/255
        # ellipse, but its CORNER tiles can lie entirely outside the
        # circumscribed alpha circle — every pixel there blends exactly
        # zero, so the key is dropped (image-identical, ~15% fewer keys).
        def i2f(x):
            return jax.lax.bitcast_convert_type(x, jnp.float32)

        mx, my, rad = i2f(a[4]), i2f(a[5]), i2f(a[6])
        px0 = (tilex * TILE_W).astype(jnp.float32)
        py0 = (tiley * TILE_H).astype(jnp.float32)
        dx = mx - jnp.clip(mx, px0, px0 + TILE_W)
        dy = my - jnp.clip(my, py0, py0 + TILE_H)
        live = live & (dx * dx + dy * dy <= rad * rad)
    tile = jnp.where(live, tile, ntiles)  # sentinel sorts last
    depth_bits = jnp.where(live, depth_s, jnp.int32(2**31 - 1))
    gid_sort = jnp.where(live, gid_s, P)
    # real (materialized, post-cull) key count == bounds[-1]; capacity
    # sizing uses num_slots (the padded demand) instead
    num_keys = jnp.sum(live.astype(jnp.int32))

    # 4. one 3-key sort: (tile, depth, id). Unique triples (a gaussian
    # appears at most once per tile), so no stability flag is needed; the id
    # key reproduces cub's stable-radix tie order (rasterizer_impl.cu:355).
    # Payload columns ride along: dead slots (sentinel tile) sort past
    # bounds[-1] and the blend kernels mask DMA-window rows by segment
    # bounds, so their (garbage) payload is never read.
    pay_s = tuple(a[4 + len(extra) + i] for i in range(len(pay)))
    sorted_out = jax.lax.sort(
        (tile, depth_bits, gid_sort) + pay_s, num_keys=3, is_stable=False
    )
    tile_sorted, gauss_sorted = sorted_out[0], sorted_out[2]
    payload = jnp.stack(sorted_out[3:], axis=0) if pay else None

    # 5. per-tile segment bounds. Entries of one tile are contiguous after
    #    the sort, so end(t) == start(t+1).
    bounds = _bounds_by_bisection(tile_sorted, ntiles)

    return Binning(
        slot_to_gaussian=gauss_sorted,
        bounds=bounds,
        num_keys=num_keys,
        overflow=overflow,
        num_slots=num_slots,
        payload=payload,
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
# Temporal liveness compaction
# ---------------------------------------------------------------------------

# chunks of headroom added to every cached live count (covers DMA-alignment
# drift of the segment head plus slow saturation-boundary motion between
# visits of the same camera)
LIVE_MARGIN_CHUNKS = 2

LIM_INF = jnp.int32(1 << 24)  # "no limit" sentinel (chunks)


def compact_live(b: Binning, lim_chunks: jnp.ndarray, live_capacity: int,
                 num_gaussians: int):
    """Compact the sorted key list to per-tile LIVE prefixes.

    The forward blend walks each tile front-to-back and stops once every
    pixel's transmittance is below TRANSMITTANCE_EPS — keys past that point
    are never read and their gradients are exactly zero (the reference's
    per-pixel early termination makes the same cut, forward.cu:475-477).
    Saturation boundaries move slowly between visits of the same camera, so
    the previous visit's live chunk count (+ margin) bounds this visit's
    prefix: only those keys are materialized for the payload gather and the
    blend kernels, shrinking the dominant per-row gather cost by the live
    fraction. Kept slots are per-tile PREFIXES of the existing sort, so
    compaction is index arithmetic (one boundary-delta cumsum + one narrow
    gather) — no extra sort.

    A stale bound is DETECTED, not trusted: the caller must treat
    (truncated[t] & tile-unsaturated[t]) as an invalid step (skip the
    update, grow the cached bound). When no tile trips that test the
    compacted render is bit-identical to the full one.

    Args:
      lim_chunks: [NTILES] int32 per-tile live chunk bounds (LIM_INF = no
        bound — e.g. first visit).
      live_capacity: static compacted-list capacity.
    Returns:
      (binning_compact, truncated [NTILES] bool, live_overflow scalar bool,
       live_demand scalar int32).
    """
    lcap = -(-live_capacity // CHUNK_SIZE) * CHUNK_SIZE
    ntiles = b.bounds.shape[0] - 1
    seg_start = b.bounds[:-1]
    seg_len = b.bounds[1:] - seg_start
    # clamp before the chunk->key scale so LIM_INF (2^24) cannot wrap int32
    lim_keys = jnp.minimum(
        seg_len, jnp.minimum(lim_chunks, jnp.int32(1 << 22)) * CHUNK_SIZE)
    truncated = lim_keys < seg_len
    live_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(lim_keys).astype(jnp.int32)])
    live_demand = live_start[-1]
    live_overflow = live_demand > lcap
    j = jnp.arange(lcap, dtype=jnp.int32)
    starts = jnp.clip(live_start[:-1], 0, lcap - 1)
    in_cap = live_start[:-1] < lcap
    off = _expand(seg_start - live_start[:-1], starts, in_cap, lcap)
    src = jnp.clip(j + off, 0, b.slot_to_gaussian.shape[0] - 1)
    valid = j < jnp.minimum(live_demand, lcap)
    gid = jnp.where(valid, b.slot_to_gaussian[src], num_gaussians)
    # sort-carried payload rows follow the same per-tile prefix map; slots
    # past bounds_live[-1] read garbage but lie outside every segment, so
    # the blend kernels' DMA-window masks never use them
    payload_c = None if b.payload is None else b.payload[:, src]
    bounds_live = jnp.clip(live_start, 0, lcap)
    bc = Binning(
        slot_to_gaussian=gid,
        bounds=bounds_live,
        num_keys=jnp.minimum(live_demand, lcap),
        overflow=b.overflow,
        num_slots=b.num_slots,
        payload=payload_c,
    )
    return bc, truncated, live_overflow, live_demand


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


def bin_items_aligned(
    tile_of_item: jnp.ndarray,  # [N] int32 tile id (ntiles = invalid)
    ntiles: int,
    capacity: int,
    block: int,
) -> AlignedBins:
    """Bin items that each touch exactly one tile into block-padded segments."""
    N = tile_of_item.shape[0]
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
