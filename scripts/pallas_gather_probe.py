"""Can Mosaic do dynamic row gathers from a VMEM-resident table, and how fast?
Tests: (1) jnp.take inside a kernel, (2) one-hot MXU gather, (3) per-row loop."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, fn, *args, reps=20):
    try:
        jax.block_until_ready(fn(*args))
    except Exception as e:  # noqa: BLE001
        print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:52s} {dt*1e3:8.3f} ms", flush=True)
    return out


PAGE = 16384  # rows per VMEM page
W = 32
CHUNK = 2048
NCHUNK = 256  # slots = 512k

rng = np.random.default_rng(0)
table = jnp.asarray(rng.normal(size=(PAGE, W)), jnp.float32)
idx = jnp.asarray(rng.integers(0, PAGE, (NCHUNK, 1, CHUNK)), jnp.int32)


# --- 1. jnp.take in kernel ---
def take_kernel(idx_ref, tbl_ref, out_ref):
    out_ref[:] = jnp.take(tbl_ref[:], idx_ref[0, 0], axis=0, fill_value=0)


@jax.jit
def take_gather(idx, table):
    return pl.pallas_call(
        take_kernel,
        grid=(NCHUNK,),
        in_specs=[
            pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PAGE, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NCHUNK * CHUNK, W), jnp.float32),
    )(idx, table)


r1 = timeit("pallas jnp.take from VMEM table [16k,32]", take_gather, idx, table)
if r1 is not None:
    ref = jnp.take(table, idx.reshape(-1), axis=0)
    print("   correct:", bool(jnp.allclose(r1, ref)))


# --- 1b. vector indexing syntax ---
def vidx_kernel(idx_ref, tbl_ref, out_ref):
    out_ref[:] = tbl_ref[idx_ref[0, 0], :]


@jax.jit
def vidx_gather(idx, table):
    return pl.pallas_call(
        vidx_kernel,
        grid=(NCHUNK,),
        in_specs=[
            pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PAGE, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NCHUNK * CHUNK, W), jnp.float32),
    )(idx, table)


timeit("pallas tbl[idx_vec, :] from VMEM", vidx_gather, idx, table)


# --- 2. one-hot MXU gather (block PAGE_B at a time) ---
PAGE_B = 2048


def onehot_kernel(idx_ref, tbl_ref, out_ref):
    ix = idx_ref[0, 0]  # [CHUNK]
    acc = jnp.zeros((CHUNK, W), jnp.float32)
    for b in range(PAGE // PAGE_B):
        local = ix - b * PAGE_B
        oh = (local[:, None] == jax.lax.broadcasted_iota(jnp.int32, (CHUNK, PAGE_B), 1)).astype(jnp.bfloat16)
        acc += jnp.dot(oh, tbl_ref[b * PAGE_B:(b + 1) * PAGE_B, :].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    out_ref[:] = acc


@jax.jit
def onehot_gather(idx, table):
    return pl.pallas_call(
        onehot_kernel,
        grid=(NCHUNK,),
        in_specs=[
            pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PAGE, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NCHUNK * CHUNK, W), jnp.float32),
    )(idx, table)


r2 = timeit("pallas one-hot MXU gather (bf16)", onehot_gather, idx, table)
if r2 is not None:
    ref = jnp.take(table, idx.reshape(-1), axis=0)
    print("   max err:", float(jnp.max(jnp.abs(r2 - ref))))


# --- 3. scatter-add into VMEM acc (segment reduce analog) ---
def scat_kernel(idx_ref, rows_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] = out_ref[:].at[idx_ref[0, 0]].add(rows_ref[:])


@jax.jit
def scat(idx, rows):
    return pl.pallas_call(
        scat_kernel,
        grid=(NCHUNK,),
        in_specs=[
            pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PAGE, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((PAGE, W), jnp.float32),
    )(idx, rows)


rows = jnp.asarray(rng.normal(size=(NCHUNK * CHUNK, W)), jnp.float32)
r3 = timeit("pallas .at[idx].add into VMEM [16k,32]", scat, idx, rows)
if r3 is not None:
    ref = jax.ops.segment_sum(rows, idx.reshape(-1), num_segments=PAGE)
    print("   max err:", float(jnp.max(jnp.abs(r3 - ref))))


# --- 4. one-hot MXU scatter-add (transpose trick) ---
def scatmxu_kernel(idx_ref, rows_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ix = idx_ref[0, 0]
    for b in range(PAGE // PAGE_B):
        local = ix - b * PAGE_B
        oh = (local[None, :] == jax.lax.broadcasted_iota(jnp.int32, (PAGE_B, CHUNK), 0)).astype(jnp.float32)
        out_ref[b * PAGE_B:(b + 1) * PAGE_B, :] += jnp.dot(
            oh, rows_ref[:], preferred_element_type=jnp.float32)


@jax.jit
def scatmxu(idx, rows):
    return pl.pallas_call(
        scatmxu_kernel,
        grid=(NCHUNK,),
        in_specs=[
            pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PAGE, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((PAGE, W), jnp.float32),
    )(idx, rows)


r4 = timeit("pallas one-hot MXU scatter-add f32", scatmxu, idx, rows)
if r4 is not None:
    ref = jax.ops.segment_sum(rows, idx.reshape(-1), num_segments=PAGE)
    print("   max err:", float(jnp.max(jnp.abs(r4 - ref))))
