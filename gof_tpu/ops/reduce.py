"""Deterministic per-gaussian gradient reduction (sorted windowed matmul).

Replaces the reference's atomicAdd gradient accumulation
(backward.cu:824-952). XLA's segment_sum is a scalar scatter pipeline
(~70 ns/row at 1M segments — 65 ms for the late-scale compact buffer), so
the production path instead:

1. sorts (gaussian id, row index) — one narrow lax.sort;
2. gathers the gradient rows into id-sorted order (narrow-row gather, XLA
   fast path);
3. runs a Pallas kernel over row chunks: ids are now ascending, so each
   chunk lands in a sliding [C, ACC_W]-lane VMEM accumulator via ONE
   indicator matmul on the MXU (rows [C, CH] @ indicator [ACC_W, CH]^T),
   and completed 2048-lane blocks stream to HBM as the window slides.
   A chunk whose ids span beyond the window advances it (flush + static
   lane shift) and re-passes with a processed-watermark mask, so arbitrary
   id sparsity is handled without dynamic-size DMAs.

The result is bit-deterministic (fixed accumulation order) and ~5x faster
than segment_sum at the late-training design point.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CH = 1024  # rows per chunk
ACC_W = 2048  # default accumulator lanes (gaussian ids in flight)


def acc_width_for(R: int, P: int) -> int:
    """Accumulator width: ~2x the expected id span of one CH-row chunk.

    Ids are ascending, so chunk c covers ids around [c*P/nchunks, ...]; a
    window narrower than the span forces flush+repass cycles (a sequential
    DMA + full-accumulator shift each) INSIDE every chunk — at 3M gaussians
    over a 655k-row compact buffer (span ~4.7k ids vs the old fixed 2048
    lanes) that serialized the kernel ~3x. Cap at 16384 lanes (1.5 MB VMEM
    at 24 columns; the indicator matmul stays ~5 us/chunk on the MXU)."""
    nchunks = max(R // CH, 1)
    span = (P + 1 + nchunks - 1) // nchunks
    w = ACC_W
    while w < 2 * span and w < 16384:
        w *= 2
    return w


def _reduce_kernel(ncols: int, nchunks: int, acc_w: int,
                   chunk_last_ref, rows_hbm, gids_hbm, out_hbm,
                   acc, rbuf, gbuf, rsem, gsem, wsem, base_ref):
    FLUSH = acc_w // 2  # lanes flushed per window advance
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        base_ref[0] = 0
        acc[:] = jnp.zeros_like(acc)

    def rows_in(i, slot):
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(i * CH, CH)], rbuf.at[slot], rsem.at[slot])

    def gids_in(i, slot):
        return pltpu.make_async_copy(
            gids_hbm.at[:, pl.ds(i * CH, CH)], gbuf.at[slot], gsem.at[slot])

    @pl.when(c == 0)
    def _():
        rows_in(0, 0).start()
        gids_in(0, 0).start()

    @pl.when(c + 1 < nchunks)
    def _():
        rows_in(c + 1, jax.lax.rem(c + 1, 2)).start()
        gids_in(c + 1, jax.lax.rem(c + 1, 2)).start()

    slot = jax.lax.rem(c, 2)
    rows_in(c, slot).wait()
    gids_in(c, slot).wait()
    rows = rbuf[slot]  # [ncols, CH]
    gids = gbuf[slot]  # [1, CH] ascending
    last = chunk_last_ref[c]

    lane_acc = jax.lax.broadcasted_iota(jnp.int32, (acc_w, CH), 0)

    def flush_half():
        b0 = pl.multiple_of(base_ref[0], FLUSH)
        cp = pltpu.make_async_copy(
            acc.at[:, pl.ds(0, FLUSH)],
            out_hbm.at[:, pl.ds(b0, FLUSH)],
            wsem,
        )
        cp.start()
        cp.wait()
        acc[:] = jnp.concatenate(
            [acc[:, FLUSH:], jnp.zeros((ncols, FLUSH), jnp.float32)], axis=1)
        base_ref[0] = b0 + FLUSH

    def one_pass(processed):
        b0 = base_ref[0]
        l = gids - b0  # [1, CH]
        sel = (l >= 0) & (l < acc_w) & (gids >= processed)
        lsel = jnp.where(sel, l, -1)
        ind = (lane_acc == lsel).astype(jnp.float32)  # [ACC_W, CH]
        partial = jax.lax.dot_general(
            rows, ind, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [ncols, ACC_W]
        acc[:] = acc[:] + partial
        return b0 + acc_w  # new watermark: everything below is processed

    # first pass covers ids in [base, base + acc_w)
    processed = one_pass(jnp.int32(0))

    # sparse chunks can span beyond the window: advance + re-pass
    def cond(processed):
        return last >= processed

    def body(processed):
        flush_half()
        flush_half()
        return one_pass(processed)

    jax.lax.while_loop(cond, body, processed)

    # final drain
    @pl.when(c == nchunks - 1)
    def _():
        flush_half()
        flush_half()


def sorted_segment_reduce(rows_t: jnp.ndarray, gids_sorted: jnp.ndarray,
                          P: int, interpret: bool = False) -> jnp.ndarray:
    """Sum rows_t [C, R] (id-ascending columns) per gaussian id -> [C, OUT].

    gids_sorted: [R] ascending int32 in [0, P]; OUT = align(P + 1) + acc_w
    (caller slices [:, :P]). R must be a multiple of 1024.
    """
    C, R = rows_t.shape
    assert R % CH == 0, R
    nchunks = R // CH
    acc_w = acc_width_for(R, P)
    flush = acc_w // 2
    out_w = -(-(P + 1) // flush) * flush + acc_w
    chunk_last = gids_sorted[CH - 1:: CH]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((C, acc_w), jnp.float32),
            pltpu.VMEM((2, C, CH), jnp.float32),
            pltpu.VMEM((2, 1, CH), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_reduce_kernel, C, nchunks, acc_w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, out_w), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(chunk_last, rows_t, gids_sorted[None, :])


_KERNEL_OK: dict = {}


def kernel_available(C: int, R: int, P: int) -> bool:
    """Compile probe AT THE CALLER'S SHAPE (cached per shape): Mosaic
    lowering constraints are shape-dependent, so a fixed-shape probe can
    pass while the real workload is rejected (or vice versa). The probe
    runs once per (C, R, P) with concrete inputs; on failure that shape
    falls back to segment_sum instead of crashing the session."""
    key = (C, R, P)
    if key not in _KERNEL_OK:
        try:
            import warnings

            import numpy as np

            rows = jnp.zeros((C, R), jnp.float32)
            ids = jnp.sort(jnp.asarray(
                np.random.default_rng(0).integers(0, P + 1, R), jnp.int32))
            out = sorted_segment_reduce(rows, ids, P)
            jax.block_until_ready(out)
            _KERNEL_OK[key] = True
        except Exception as e:  # noqa: BLE001 — any lowering failure
            warnings.warn(f"sorted-reduce kernel unavailable at shape "
                          f"{key}, falling back to segment_sum: {e!r}")
            _KERNEL_OK[key] = False
    return _KERNEL_OK[key]


def reduce_rows_by_gid(rows_t: jnp.ndarray, gidc: jnp.ndarray, P: int,
                       interpret: bool = False) -> jnp.ndarray:
    """Per-gaussian sums of compacted gradient rows.

    rows_t: [C, R] (any id order); gidc: [R] int32 in [0, P] (P = sentinel,
    dropped). Returns [P, C].
    """
    C, R = rows_t.shape
    if interpret or R % CH != 0 or not kernel_available(C, R, P):
        # interpret / odd-size / no-Mosaic fallback: XLA segment_sum
        return jax.ops.segment_sum(rows_t.T, gidc, num_segments=P + 1)[:P]
    gid_sorted, perm = jax.lax.sort(
        (gidc, jnp.arange(R, dtype=jnp.int32)), num_keys=1)
    rows_sorted = rows_t.T[perm].T  # narrow-row gather (fast path)
    out = sorted_segment_reduce(rows_sorted, gid_sorted, P, interpret=interpret)
    return out[:, :P].T
