"""Key expansion as a sliding-window Pallas kernel.

Replaces bin_gaussians' XLA expansion stages (1-column delta-scatter +
[CAP] cumsum + [P, 4] attrs gather — each a scalar-pipeline op costing
10s of ms at the 1M-gaussian / 4M-key design point) with ONE kernel that
produces the pre-sort key triple (tile, depth_bits, gid) for every slot.

The insight: duplication offsets are ASCENDING in gaussian order, so slot
chunk c draws from a contiguous, monotonically-advancing window of
gaussians. Per chunk of 512 slots over a 2048-gaussian VMEM window:

  1. cmp[w, s] = (off_w <= s): one [W, CH] broadcast compare (the off
     column recombines exactly in f32 from 8-bit table planes);
  2. onehot[w, s] = cmp[w, s] - cmp[w+1, s] — 1 exactly for the gaussian
     owning slot s (off_w <= s < off_{w+1}), a sublane shift + subtract,
     no iota / argmax;
  3. attrs = table^T @ onehot: ONE MXU matmul gathers the owner's
     (off, rect, depth, windex) row; every table value is an 8-bit plane
     (exact in bf16) and each output column sums one nonzero term — exact;
  4. the rect walk j = s - off, tile = (y0 + j // w) * ntx + x0 + j % w is
     elementwise VPU work (float division with a +-1 floor correction —
     Mosaic has no dynamic integer division).

The window slides by 1024 whenever the chunk's first gaussian escapes the
window's first half (cub's duplicateWithKeys analog,
rasterizer_impl.cu:70-111, deterministic, no atomics). The table is stored
[PPAD, 16] with gaussians along sublanes so the off-vs-slot compare
broadcasts [W, 1] x [1, CH] without any in-kernel transpose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CH = 512  # slots per chunk
W = 2048  # gaussian window
FLUSH = 1024  # slide granularity; FLUSH + CH + 1 <= W keeps every owner in-window
K = 16  # table planes (14 used)
LANES = 128  # physical table width: Mosaic requires DMA slices lane-aligned
# to the (8,128) bf16 tile, so the table carries K logical planes in the
# first K of 128 lanes (the rest are zero and ignored by the kernel).


_KERNEL_OK: bool | None = None


def kernel_available() -> bool:
    """One-time compile probe of the expand kernel on the default backend.

    Mosaic lowering constraints only surface on real hardware; a failure
    here makes bin_gaussians fall back to its XLA chain instead of taking
    down every caller (train/bench/entry compile checks). Concrete inputs
    at a production-like shape (lowering constraints are SHAPE-DEPENDENT:
    a [5120, K] table compiled where a [104448, K] one was rejected), so
    this is safe to trigger from inside another trace and meaningful.
    """
    global _KERNEL_OK
    if _KERNEL_OK is None:
        try:
            import warnings

            n = 100_352
            off = jnp.asarray(np.arange(n), jnp.int32)
            rect = jnp.full((n,), (1 << 20) | 1, jnp.int32)
            dep = jnp.asarray(np.arange(n) % 997 + 1, jnp.int32)
            dead = jnp.zeros((n,), bool)
            out = expand_keys_pallas(off, rect, dep, dead, jnp.int32(n),
                                     n, 40, 1024, 131072)
            jax.block_until_ready(out[0])
            _KERNEL_OK = True
        except Exception as e:  # noqa: BLE001 — any lowering failure
            warnings.warn(f"expand kernel unavailable on this backend, "
                          f"falling back to the XLA chain: {e!r}")
            _KERNEL_OK = False
    return _KERNEL_OK


def _floor_div(num, den_f, den_i):
    """floor(num / den) for int32 num >= 0, den >= 1 (exact via correction)."""
    q = jnp.floor(num.astype(jnp.float32) / den_f).astype(jnp.int32)
    r = num - q * den_i
    q = jnp.where(r < 0, q - 1, q)
    r = num - q * den_i
    q = jnp.where(r >= den_i, q + 1, q)
    return q


def _expand_kernel(ntx: int, ntiles: int, sentinel: int,
                   nkeys_ref, tbl_hbm, out_ref, win, wsem, base_ref):
    c = pl.program_id(0)
    num_keys = nkeys_ref[0]

    def load(dst_half, src_block):
        # win halves: [FLUSH, K] each; tbl_hbm [PPAD, K] in FLUSH blocks
        return pltpu.make_async_copy(
            tbl_hbm.at[pl.ds(src_block * FLUSH, FLUSH), :],
            win.at[pl.ds(dst_half * FLUSH, FLUSH), :],
            wsem,
        )

    @pl.when(c == 0)
    def _():
        base_ref[0] = 0
        cp = load(0, 0)
        cp.start()
        cp.wait()
        cp = load(1, 1)
        cp.start()
        cp.wait()

    s_min = c * CH
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1) + s_min  # [1, CH]

    def off_col():  # [W, 1] f32, exact (off < 2^24)
        return (win[:, 0:1].astype(jnp.float32) * 65536.0
                + win[:, 1:2].astype(jnp.float32) * 256.0
                + win[:, 2:3].astype(jnp.float32))

    def first_count():
        return jnp.sum((off_col() <= jnp.float32(s_min)).astype(jnp.float32))

    # slide: keep the chunk's first gaussian inside the first half. The
    # decision is computed in the BODY and carried as a pure flag: a cond
    # that reads kernel refs can be lowered against a stale snapshot of the
    # mutated window (observed as an infinite loop in interpret mode).
    def cond(done):
        return jnp.logical_not(done)

    def body(done):
        can_slide = base_ref[0] + W < tbl_hbm.shape[0]
        do_slide = (first_count() > FLUSH) & can_slide

        @pl.when(do_slide)
        def _():
            b = base_ref[0]
            win[:FLUSH, :] = win[FLUSH:, :]
            cp = load(1, b // FLUSH + 2)
            cp.start()
            cp.wait()
            base_ref[0] = b + FLUSH

        return jnp.logical_not(do_slide)

    jax.lax.while_loop(cond, body, jnp.bool_(False))

    cmp = (off_col() <= slot.astype(jnp.float32)).astype(jnp.float32)  # [W, CH]
    # owner indicator: off_w <= s < off_{w+1}. The value shifted in at the
    # last row is 0 == (off_W <= s), correct by the slide invariant (the
    # owner's window index stays < W, so s < off_W always).
    onehot = cmp - jnp.concatenate(
        [cmp[1:, :], jnp.zeros((1, CH), jnp.float32)], axis=0)
    # f32 operands: Mosaic's dim-0-contraction (transposed-lhs) matmul
    # rejects bf16 lhs ("Bad lhs type"); the 8-bit planes are exact in f32.
    attrs = jax.lax.dot_general(
        win[:, :].astype(jnp.float32), onehot, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [K, CH]

    def b8(i):  # plane i as int32 row [1, CH]
        return attrs[i:i + 1].astype(jnp.int32)

    off_s = (b8(0) << 16) | (b8(1) << 8) | b8(2)
    rect = (b8(3) << 24) | (b8(4) << 16) | (b8(5) << 8) | b8(6)
    depth_bits = (b8(7) << 24) | (b8(8) << 16) | (b8(9) << 8) | b8(10)
    glow = (b8(11) << 8) | b8(12)  # owner's low 16 id bits
    owner_dead = b8(13)  # the owner's synthetic single key (count was 0)

    x0e = rect & 1023
    y0e = (rect >> 10) & 1023
    rw = jnp.maximum((rect >> 20) & 1023, 1)

    j = slot - off_s
    jdiv = _floor_div(j, rw.astype(jnp.float32), rw)
    jmod = j - jdiv * rw
    tile = (y0e + jdiv) * ntx + x0e + jmod

    valid = (slot < num_keys) & (owner_dead == 0)
    # gid = base + ((glow - base) mod 2^16): unambiguous since the owner
    # lies in [base, base + W) and W < 2^16
    gid = base_ref[0] + ((glow - base_ref[0]) & 0xFFFF)
    # Mosaic wants 8-sublane blocks; rows 3-7 are padding
    out_ref[0, :, :] = jnp.concatenate([
        jnp.where(valid, tile, ntiles),
        jnp.where(valid, depth_bits, 0x7FFFFFFF),
        jnp.where(valid, gid, sentinel),
        jnp.zeros((5, CH), jnp.int32),
    ], axis=0)


def expand_keys_pallas(off: jnp.ndarray, packed_rect: jnp.ndarray,
                       depth_bits: jnp.ndarray, dead: jnp.ndarray,
                       num_keys: jnp.ndarray,
                       P: int, ntx: int, ntiles: int, capacity: int,
                       interpret: bool = False):
    """Pre-sort key triple for every slot.

    off: [P] int32 exclusive duplication offsets (STRICTLY ascending —
      every gaussian owns >= 1 slot — and < 2^24); dead: [P] bool marks
      gaussians whose single slot is synthetic (count was 0);
    packed_rect: [P] int32 (x0 | y0 << 10 | w << 20, w clamped to 1023);
    depth_bits: [P] int32 order-preserving float bits.
    Returns (tile [CAP], depth_bits [CAP], gid [CAP]) int32; invalid/dead
    slots hold (ntiles, INT32_MAX, sentinel >= P).
    """
    cap_pad = -(-capacity // CH) * CH  # kernel granularity; sliced below
    nchunks = cap_pad // CH
    ppad = -(-max(P, 1) // FLUSH) * FLUSH + 2 * W
    big = jnp.int32(2**24 - 1)  # off sentinel: beyond any slot

    def planes8(x, n):  # n top-down 8-bit planes of int32 x (two's complement)
        x = x.astype(jnp.int32)
        return [(x >> (8 * (n - 1 - i))) & 255 for i in range(n)]

    # The owner's id is recovered as base + ((glow - base) & 0xFFFF): the
    # owner lies in [base, base + W) and W < 2^16, so storing only g's low
    # 16 bits (2 exact 8-bit planes) is unambiguous.
    glow = jnp.arange(P, dtype=jnp.int32) & 0xFFFF

    cols = (
        planes8(jnp.minimum(off, big), 3)
        + planes8(packed_rect, 4)
        + planes8(depth_bits, 4)
        + planes8(glow, 2)
        + [dead.astype(jnp.int32)]
    )
    fills = [float((2**24 - 1) >> 16), float((2**24 - 1) >> 8 & 255),
             float((2**24 - 1) & 255),
             0.0, 16.0, 0.0, 0.0,  # sentinel rect: w=1 -> plane layout below
             127.0, 255.0, 255.0, 255.0,
             0.0, 0.0,
             1.0]  # table-padding rows are dead
    # sentinel rect w=1: packed_rect = 1 << 20 -> planes (0, 16, 0, 0)

    def pad(x, fill):
        return jnp.full((ppad,), fill, jnp.float32).at[:P].set(
            x.astype(jnp.float32)).astype(jnp.bfloat16)

    col_list = [pad(x, f) for x, f in zip(cols, fills)]
    col_list += [jnp.zeros((ppad,), jnp.bfloat16)] * (K - len(col_list))
    tbl = jnp.stack(col_list, axis=1)  # [PPAD, K] bf16, gaussians = sublanes
    # Mosaic rejects DMA slices whose minor dim is narrower than the 128-lane
    # bf16 tile, so on hardware the table carries K planes in 128 lanes;
    # interpret mode skips the 8x pad (no tiling constraint, 8x less work).
    lanes = K if interpret else LANES
    tbl = jnp.pad(tbl, ((0, 0), (0, lanes - K)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, CH), lambda c, nk: (c, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((W, lanes), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_expand_kernel, ntx, ntiles, ppad),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nchunks, 8, CH), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.asarray(num_keys, jnp.int32).reshape(1), tbl)
    flat = out[:, :3].transpose(1, 0, 2).reshape(3, cap_pad)[:, :capacity]
    return flat[0], flat[1], flat[2]
