"""Internal timing of bin_gaussians stages at training scale (current
unaligned-segment pipeline: fused delta-scatter expansion -> (tile, depth)
2-key sort carrying the gaussian id -> bisection bounds)."""
import time

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from gof_tpu import cameras
from gof_tpu.ops import binning, quadrics
from gof_tpu.sh import rgb_to_sh_dc

N = 100_000
W, H = 1237, 822
CAPACITY = 1_638_400
REPS = 30

rng = np.random.default_rng(0)
z = rng.uniform(2, 12, N)
means = jnp.asarray(np.stack([rng.uniform(-1, 1, N) * z * 0.45,
                              rng.uniform(-1, 1, N) * z * 0.3, z], -1), jnp.float32)
scales = jnp.asarray(np.exp(rng.normal(-3.2, 0.5, (N, 3))), jnp.float32)
q = rng.normal(size=(N, 4)); q /= np.linalg.norm(q, axis=-1, keepdims=True)
rots = jnp.asarray(q, jnp.float32)
shs_rgb = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
cam = jax.tree.map(lambda x: np.asarray(x), cameras.look_at_camera(
    eye=(0, 0, 0), target=(0, 0, 5.0), width=W, height=H))
ntx, nty = binning.tile_grid(W, H)
ntiles = ntx * nty


@jax.jit
def setup(means, scales, rots, shs_rgb):
    shs = rgb_to_sh_dc(shs_rgb)[:, None, :]
    pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1)
    rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty,
                                   radius_xy=pre.radius_xy)
    return pre.depth, rects


depth, rects = setup(means, scales, rots, shs_rgb)
jax.block_until_ready(depth)


def t(name, fn, *args, reps=REPS):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:48s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms", flush=True)


t("full bin_gaussians", lambda d, r: binning.bin_gaussians(
    d, r, ntx, nty, CAPACITY).slot_to_gaussian, depth, rects)

P = N
counts = (rects.w * rects.h).astype(jnp.int32)
off = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])
starts = jnp.clip(off[:-1], 0, CAPACITY - 1).astype(jnp.int32)
in_cap = off[:-1] < CAPACITY


def expand6(d):
    cols = jnp.stack([
        off[:-1], jnp.arange(P, dtype=jnp.int32), rects.w.astype(jnp.int32),
        rects.x0.astype(jnp.int32), rects.y0.astype(jnp.int32),
        jax.lax.bitcast_convert_type(d.astype(jnp.float32), jnp.int32),
    ], axis=1)
    prev = jnp.concatenate([jnp.zeros((1, 6), jnp.int32), cols[:-1]], axis=0)
    delta = jnp.where(in_cap[:, None], cols - prev, 0)
    dd = jnp.zeros((CAPACITY, 6), jnp.int32).at[starts].add(
        delta, mode="drop", indices_are_sorted=True)
    return jnp.cumsum(dd, axis=0)


t("A: fused 6-col delta-scatter + [CAP,6] cumsum", expand6, depth)

exp = jax.jit(expand6)(depth)
k = jnp.arange(CAPACITY, dtype=jnp.int32)
num_keys = off[-1]
dup_valid = k < num_keys
off_exp, gid = exp[:, 0], exp[:, 1]
rw = jnp.maximum(exp[:, 2], 1)
j = k - off_exp
tile = (exp[:, 4] + j // rw) * ntx + exp[:, 3] + j % rw
tile = jnp.where(dup_valid, tile, ntiles)
depth_bits = exp[:, 5]

t("B: (tile, depth) 2-key sort + carried gid",
  lambda tl: jax.lax.sort((tl, depth_bits, jnp.where(dup_valid, gid, P)),
                          num_keys=2, is_stable=False)[2], tile)

tile_sorted = jax.lax.sort((tile, depth_bits, jnp.where(dup_valid, gid, P)),
                           num_keys=2, is_stable=False)[0]

t("C: bisection bounds [NTILES+1]",
  lambda ts: binning._bounds_by_bisection(ts, ntiles), tile_sorted)
