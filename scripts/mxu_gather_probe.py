"""Verify the primitives for the windowed-MXU binning redesign.

All timings cycle distinct input buffers (identical-args dispatches get
deduplicated somewhere in the axon stack and read ~0 ms).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)


def timeit(name, fn, args_list, reps=16):
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args_list[i % len(args_list)]) for i in range(reps)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:58s} {dt*1e3:8.3f} ms", flush=True)
    return out


# ---------------------------------------------------------------- 1. int8 MXU
CH, WG, C8 = 1024, 2048, 128


def int8_kernel(idx_ref, tbl_ref, out_ref):
    ix = idx_ref[0, 0]
    oh = (ix[:, None] == jax.lax.broadcasted_iota(jnp.int32, (CH, WG), 1)).astype(jnp.int8)
    out_ref[:] = jnp.dot(oh, tbl_ref[:], preferred_element_type=jnp.int32)


NCH = 512  # 512k rows


@jax.jit
def int8_gather(idx, table):
    return pl.pallas_call(
        int8_kernel, grid=(NCH,),
        in_specs=[pl.BlockSpec((1, 1, CH), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((WG, C8), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CH, C8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NCH * CH, C8), jnp.int32),
    )(idx, table)


tbl8 = jnp.asarray(rng.integers(-128, 127, (WG, C8)), jnp.int8)
idxs = [jnp.asarray(rng.integers(0, WG, (NCH, 1, CH)), jnp.int32) for _ in range(4)]
try:
    out = int8_gather(idxs[0], tbl8)
    ref = jnp.take(tbl8, idxs[0].reshape(-1), axis=0).astype(jnp.int32)
    print("int8 onehot gather exact:", bool(jnp.array_equal(out, ref)))
    timeit(f"int8 onehot gather [{NCH*CH}] win={WG} C={C8}", int8_gather,
           [(i, tbl8) for i in idxs])
except Exception as e:  # noqa: BLE001
    print("int8 FAILED:", type(e).__name__, str(e)[:200])


# ------------------------------------------------- 2. f32 indicator RLD exact
# run-length decode: out[k] = val[w] where off[w] <= k < off[w+1]
CV = 8  # int32 value columns


def rld_kernel(off_ref, val_ref, base_ref, out_ref):
    base = base_ref[0, 0]  # chunk's global slot offset (scalar path via iota)
    k = jax.lax.broadcasted_iota(jnp.int32, (CH, WG), 0) + base[0]
    off_lo = off_ref[0, 0][None, :]  # [1, WG]
    off_hi = jnp.concatenate([off_ref[0, 0][1:], jnp.full((1,), 2**30, jnp.int32)])[None, :]
    ind = ((k >= off_lo) & (k < off_hi)).astype(jnp.float32)
    out_ref[:] = jnp.dot(ind, val_ref[:].astype(jnp.float32),
                         preferred_element_type=jnp.float32).astype(jnp.int32)


@jax.jit
def rld(off, val, base):
    return pl.pallas_call(
        rld_kernel, grid=(NCH,),
        in_specs=[pl.BlockSpec((1, 1, WG), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((WG, CV), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CH, CV), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NCH * CH, CV), jnp.int32),
    )(off, val, base)


# build a consistent test: WG gaussians per chunk window is cheating a bit; we
# just verify numerics: off strictly increasing; values up to 2^23
off_np = np.sort(rng.integers(0, NCH * CH, (NCH, 1, WG))).astype(np.int32)
off_np[:, 0, 0] = 0
val_np = rng.integers(0, 2**23, (WG, CV)).astype(np.int32)
base_np = np.zeros((NCH, 1, 8), np.int32)
base_np[:, 0, 0] = 0  # k is global already via iota? no—per chunk base
for i in range(NCH):
    base_np[i, 0, 0] = i * CH
try:
    out = rld(jnp.asarray(off_np), jnp.asarray(val_np), jnp.asarray(base_np))
    # reference
    ks = np.arange(NCH * CH)[:, None]
    ref = np.zeros((NCH * CH, CV), np.int32)
    for i in range(4):  # spot check 4 chunks
        ch = rng.integers(0, NCH)
        o = off_np[ch, 0]
        k = np.arange(ch * CH, (ch + 1) * CH)
        w = np.searchsorted(o, k, side="right") - 1
        inb = (w >= 0) & (k < (np.concatenate([o[1:], [2**30]])[w]))
        got = np.asarray(out[ch * CH:(ch + 1) * CH])
        exp = np.where(inb[:, None], val_np[np.clip(w, 0, WG - 1)], 0)
        ok = np.array_equal(got, exp)
        print(f"RLD f32-matmul chunk {ch} exact: {ok}")
        if not ok:
            bad = np.nonzero(got != exp)
            print("  first bad:", bad[0][:5], got[bad][:5], exp[bad][:5])
            break
    timeit(f"RLD indicator f32 matmul [{NCH*CH}] win={WG} C={CV}", rld,
           [(jnp.asarray(off_np), jnp.asarray(val_np), jnp.asarray(base_np))])
except Exception as e:  # noqa: BLE001
    print("RLD FAILED:", type(e).__name__, str(e)[:300])


# --------------------------------------- 3. scalar-prefetch paged index_map
def paged_kernel(pages_ref, idx_ref, tbl_ref, out_ref):
    ix = idx_ref[0, 0]
    base = pages_ref[pl.program_id(0)] * WG
    local = ix - base
    oh = (local[:, None] == jax.lax.broadcasted_iota(jnp.int32, (CH, WG), 1)).astype(jnp.int8)
    out_ref[:] = jnp.dot(oh, tbl_ref[:], preferred_element_type=jnp.int32)


P_ROWS = WG * 8  # 16k-row table, 8 pages


@jax.jit
def paged_gather(pages, idx, table):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NCH,),
        in_specs=[pl.BlockSpec((1, 1, CH), lambda i, pg: (i, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((WG, C8), lambda i, pg: (pg[i], 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CH, C8), lambda i, pg: (i, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        paged_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NCH * CH, C8), jnp.int32),
    )(pages, idx, table)


big_tbl8 = jnp.asarray(rng.integers(-128, 127, (P_ROWS, C8)), jnp.int8)
pages_np = rng.integers(0, 8, NCH).astype(np.int32)
idx_np = np.empty((NCH, 1, CH), np.int32)
for i in range(NCH):
    idx_np[i, 0] = rng.integers(pages_np[i] * WG, (pages_np[i] + 1) * WG, CH)
try:
    out = paged_gather(jnp.asarray(pages_np), jnp.asarray(idx_np), big_tbl8)
    ref = jnp.take(big_tbl8, jnp.asarray(idx_np).reshape(-1), axis=0).astype(jnp.int32)
    print("paged scalar-prefetch gather exact:", bool(jnp.array_equal(out, ref)))
    timeit("paged gather (prefetch index_map)", paged_gather,
           [(jnp.asarray(pages_np), jnp.asarray(idx_np), big_tbl8)])
except Exception as e:  # noqa: BLE001
    print("paged FAILED:", type(e).__name__, str(e)[:300])


# --------------------------------------------- 4. lax.sort w/ carries @ 4.2M
CAP = 4_194_304
tiles = [jnp.asarray(rng.integers(0, 4056, CAP), jnp.int32) for _ in range(3)]
db = jnp.asarray(rng.integers(0, 2**30, CAP), jnp.int32)
gid = jnp.asarray(rng.integers(0, 2**20, CAP), jnp.int32)
dup = jnp.asarray(rng.integers(0, CAP, CAP), jnp.int32)


@jax.jit
def sort2carry2(t, d, g, u):
    return jax.lax.sort((t, d, g, u), num_keys=2, is_stable=False)[2]


@jax.jit
def sort2carry1(t, d, g):
    return jax.lax.sort((t, d, g), num_keys=2, is_stable=False)[2]


timeit("lax.sort 2key+1carry @4.2M", sort2carry1, [(t, db, gid) for t in tiles])
timeit("lax.sort 2key+2carry @4.2M", sort2carry2, [(t, db, gid, dup) for t in tiles])


@jax.jit
def sort1carry1(g, u):
    return jax.lax.sort((g, u), num_keys=1, is_stable=False)[1]


gids_s = [jnp.asarray(rng.integers(0, 2**20, 1_310_720), jnp.int32) for _ in range(3)]
rid = jnp.asarray(np.arange(1_310_720), jnp.int32)
timeit("lax.sort 1key+1carry @1.3M (reduce presort)", sort1carry1,
       [(g, rid) for g in gids_s])
