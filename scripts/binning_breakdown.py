"""Internal timing of bin_gaussians stages at training scale."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gof_tpu import cameras
from gof_tpu.ops import binning, quadrics
from gof_tpu.sh import rgb_to_sh_dc

N = 100_000
W, H = 1237, 822
CAPACITY = 1 << 20
REPS = 8

rng = np.random.default_rng(0)
z = rng.uniform(2, 12, N)
means = jnp.asarray(np.stack([rng.uniform(-1, 1, N) * z * 0.45,
                              rng.uniform(-1, 1, N) * z * 0.3, z], -1), jnp.float32)
scales = jnp.asarray(np.exp(rng.normal(-3.2, 0.5, (N, 3))), jnp.float32)
q = rng.normal(size=(N, 4)); q /= np.linalg.norm(q, axis=-1, keepdims=True)
rots = jnp.asarray(q, jnp.float32)
shs = rgb_to_sh_dc(jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32))[:, None, :]
cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0), width=W, height=H)
ntx, nty = binning.tile_grid(W, H)
pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1)
rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty)
depth = pre.depth


def chain(fn, x, reps=REPS):
    def body(x):
        out = fn(x)
        for _ in range(reps - 1):
            leaf = jax.tree.leaves(out)[0]
            eps = (leaf.ravel()[:1].astype(jnp.float32) * 1e-30)
            x = x + eps.astype(x.dtype)
            out = fn(x)
        return out
    f = jax.jit(body)
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    jax.block_until_ready(f(x))
    return (time.perf_counter() - t0) / reps


def t(name, fn, x):
    print(f"{name:46s} {chain(fn, x)*1e3:8.2f} ms")


P = N
ntiles = ntx * nty
counts = rects.w * rects.h

# stage A: depth argsort [P]
t("A: argsort depth [P]", lambda d: jnp.argsort(jnp.where(counts > 0, d, jnp.inf)), depth)

order = jnp.argsort(jnp.where(counts > 0, depth, jnp.inf))
cnt_o = counts[order]
off_o = jnp.concatenate([jnp.zeros((1,), cnt_o.dtype), jnp.cumsum(cnt_o)])
off_clip = jnp.clip(off_o[:-1], 0, CAPACITY - 1).astype(jnp.int32)
in_cap = off_o[:-1] < CAPACITY


def expand(v):
    v = v.astype(jnp.int32)
    prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), v[:-1]])
    delta = jnp.where(in_cap, v - prev, 0)
    d = jnp.zeros((CAPACITY,), jnp.int32).at[off_clip].add(delta, mode="drop")
    return jnp.cumsum(d)


# stage B: the five [CAP] expansions
t("B: 5x delta-scatter+cumsum expansions [CAP]",
  lambda o: expand(off_o[:-1]) + expand(o) + expand(rects.w[order])
  + expand(rects.x0[order]) + expand(rects.y0[order]), order)

num_keys = off_o[-1]
k = jnp.arange(CAPACITY, dtype=jnp.int32)
dup_valid = k < num_keys
off_exp = expand(off_o[:-1])
gid = expand(order)
rw = jnp.maximum(expand(rects.w[order]), 1)
x0e = expand(rects.x0[order])
y0e = expand(rects.y0[order])
j = k - off_exp
tile = (y0e + j // rw) * ntx + x0e + j % rw
tile = jnp.where(dup_valid, tile, ntiles)

# stage C: the [CAP] stable sort with 1 carried value
t("C: stable sort [CAP] 1 key + 1 carried",
  lambda tl: jax.lax.sort((tl, jnp.where(dup_valid, gid, P)), num_keys=1, is_stable=True)[0],
  tile)

tile_sorted, gauss_sorted = jax.lax.sort(
    (tile, jnp.where(dup_valid, gid, P)), num_keys=1, is_stable=True
)

# stage D: per-tile ranges via searchsorted (few queries)
tile_ids = jnp.arange(ntiles, dtype=tile_sorted.dtype)
t("D: 2x searchsorted [NTILES] queries",
  lambda ts: jnp.searchsorted(ts, tile_ids, side="left")
  + jnp.searchsorted(ts, tile_ids, side="right"), tile_sorted)

seg_start = jnp.searchsorted(tile_sorted, tile_ids, side="left").astype(jnp.int32)
seg_end = jnp.searchsorted(tile_sorted, tile_ids, side="right").astype(jnp.int32)
seg_len = seg_end - seg_start
chunks = -(-seg_len // binning.CHUNK_SIZE)
pad_len = chunks * binning.CHUNK_SIZE
pad_start = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(pad_len).astype(jnp.int32)])
cap_pad = binning.padded_capacity(CAPACITY, ntiles)
pstart_clip = jnp.clip(pad_start[:-1], 0, cap_pad - 1)


def expand_pad(v):
    v = v.astype(jnp.int32)
    prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), v[:-1]])
    d = jnp.zeros((cap_pad,), jnp.int32).at[pstart_clip].add(v - prev, mode="drop")
    return jnp.cumsum(d)


# stage E: relayout expansions [CAP_PAD]
t("E: 3x expansions [CAP_PAD]",
  lambda s: expand_pad(s) + expand_pad(pad_start[:-1]) + expand_pad(seg_len), seg_start)

f_idx = jnp.arange(cap_pad, dtype=jnp.int32)
seg_start_f = expand_pad(seg_start)
pad_start_f = expand_pad(pad_start[:-1])
seg_len_f = expand_pad(seg_len)
local = f_idx - pad_start_f
src = jnp.clip(seg_start_f + local, 0, CAPACITY - 1)

# stage F: the relayout element gather [CAP_PAD] <- [CAP]
t("F: relayout gather gauss_sorted[src] [CAP_PAD]", lambda g: g[src], gauss_sorted)

# full pipeline for reference
t("FULL bin_gaussians", lambda d: binning.bin_gaussians(
    d, rects, ntx, nty, CAPACITY).slot_to_gaussian, depth)
