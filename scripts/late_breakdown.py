"""Per-stage timing at an arbitrary scale (use --gaussians 1000000 for the
late-training design point). Pipelined async dispatch, one terminal block."""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from gof_tpu import cameras
from gof_tpu.ops import binning, quadrics
from gof_tpu.ops import rasterize_pallas as rp
from gof_tpu.sh import rgb_to_sh_dc

ap = argparse.ArgumentParser()
ap.add_argument("--gaussians", type=int, default=1_000_000)
ap.add_argument("--capacity", type=int, default=6_553_600)
ap.add_argument("--compact-cap", type=int, default=0)
ap.add_argument("--sigma", type=float, default=-4.3)
ap.add_argument("--reps", type=int, default=10)
ap.add_argument("--cpu", action="store_true")
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

N = args.gaussians
W, H = 1237, 822
CAPACITY = args.capacity
REPS = args.reps

rng = np.random.default_rng(1)
z = rng.uniform(2, 12, N)
means = jnp.asarray(np.stack([rng.uniform(-1, 1, N) * z * 0.45,
                              rng.uniform(-1, 1, N) * z * 0.3, z], -1), jnp.float32)
scales = jnp.asarray(np.exp(rng.normal(args.sigma, 0.5, (N, 3))), jnp.float32)
q = rng.normal(size=(N, 4)); q /= np.linalg.norm(q, axis=-1, keepdims=True)
rots = jnp.asarray(q, jnp.float32)
opac = jnp.asarray(rng.uniform(0.3, 0.95, N), jnp.float32)
shs_np = np.asarray(rng.uniform(0, 1, (N, 3)), np.float32)
cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0), width=W, height=H)
cam = jax.tree.map(lambda x: np.asarray(x), cam)
ntx, nty = binning.tile_grid(W, H)
ntiles = ntx * nty
bg = np.zeros(3, np.float32)


@jax.jit
def setup(means, scales, rots, opac, shs_rgb):
    shs = rgb_to_sh_dc(shs_rgb)[:, None, :]
    pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1,
                              opacities=opac)
    rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty,
                                   radius_xy=pre.radius_xy)
    b = binning.bin_gaussians(pre.depth, rects, ntx, nty, CAPACITY)
    op_eff = opac * jnp.where(pre.valid, pre.coef, 0.0)
    sigma6 = rp.pack_sigma6(pre.v2g_M)
    bvec = jnp.einsum("pji,pj->pi", pre.v2g_M, pre.v2g_u0)
    payload = rp.build_payload32(pre.rgb, op_eff, pre.v2g_M, pre.v2g_u0, sigma6,
                                 bvec, pre.conic, pre.mean2d, b)
    mv = rp._meta_vec(cam.focal_x, cam.focal_y, bg, W, H)
    return pre, rects, b, op_eff, sigma6, bvec, payload, mv


pre, rects, b, op_eff, sigma6, bvec, payload, mv = setup(means, scales, rots,
                                                         opac, jnp.asarray(shs_np))
jax.block_until_ready(payload)
NK = int(b.num_keys)
print(f"num_keys={NK} capacity={CAPACITY} overflow={bool(b.overflow)}")
COMPACT = args.compact_cap or -(-int(NK * 0.25) // 65536) * 65536
print(f"compact_cap={COMPACT}")


def t(name, fn, *args, reps=REPS):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:46s} {dt*1e3:8.2f} ms", flush=True)
    return dt


shs_dev = jax.jit(lambda r: rgb_to_sh_dc(r)[:, None, :])(jnp.asarray(shs_np))

d1 = t("preprocess", lambda m, s, r, o, sh: quadrics.preprocess(
    m, s, r, sh, 0, cam, 0.1, opacities=o).mean2d,
    means, scales, rots, opac, shs_dev)

d2 = t("bin_gaussians", lambda d, rc: binning.bin_gaussians(
    d, rc, ntx, nty, CAPACITY).slot_to_gaussian, pre.depth, rects)

# --- binning internals ---
counts = (rects.w * rects.h).astype(jnp.int32)
off = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])
starts = jnp.clip(off[:-1], 0, CAPACITY - 1).astype(jnp.int32)
in_cap = off[:-1] < CAPACITY


def expand6(d):
    cols = jnp.stack([
        off[:-1], jnp.arange(N, dtype=jnp.int32), rects.w.astype(jnp.int32),
        rects.x0.astype(jnp.int32), rects.y0.astype(jnp.int32),
        jax.lax.bitcast_convert_type(d.astype(jnp.float32), jnp.int32),
    ], axis=1)
    prev = jnp.concatenate([jnp.zeros((1, 6), jnp.int32), cols[:-1]], axis=0)
    delta = jnp.where(in_cap[:, None], cols - prev, 0)
    dd = jnp.zeros((CAPACITY, 6), jnp.int32).at[starts].add(
        delta, mode="drop", indices_are_sorted=True)
    return jnp.cumsum(dd, axis=0)


t("  A: 6-col delta-scatter + [CAP,6] cumsum", expand6, pre.depth)

exp = jax.jit(expand6)(pre.depth)
k = jnp.arange(CAPACITY, dtype=jnp.int32)
num_keys = off[-1]
dup_valid = k < num_keys
off_exp, gid = exp[:, 0], exp[:, 1]
rw = jnp.maximum(exp[:, 2], 1)
j = k - off_exp
tile = (exp[:, 4] + j // rw) * ntx + exp[:, 3] + j % rw
tile = jnp.where(dup_valid, tile, ntiles)
depth_bits = exp[:, 5]

t("  B: (tile,depth) 2-key sort + gid",
  lambda tl: jax.lax.sort((tl, depth_bits, jnp.where(dup_valid, gid, N)),
                          num_keys=2, is_stable=False)[2], tile)

tile_sorted = jax.lax.sort((tile, depth_bits, jnp.where(dup_valid, gid, N)),
                           num_keys=2, is_stable=False)[0]
t("  C: bisection bounds",
  lambda ts: binning._bounds_by_bisection(ts, ntiles), tile_sorted)

d3 = t("build_payload32 (gather)", lambda r, oe, p, s6, bv, bb: rp.build_payload32(
    r, oe, p.v2g_M, p.v2g_u0, s6, bv, p.conic, p.mean2d, bb),
    pre.rgb, op_eff, pre, sigma6, bvec, b)

d4 = t("pallas forward kernel", lambda p, bb, m: rp.rasterize_fwd_pallas(
    p, bb, m, ntx, ntiles), payload, b, mv)

fout = jax.jit(lambda p, bb, m: rp.rasterize_fwd_pallas(p, bb, m, ntx, ntiles))(
    payload, b, mv)
gout = jax.jit(lambda f: jnp.ones_like(f))(fout)
d6 = t("bwd kernel alone (compact out)", lambda p, f, g, bb, m: rp.rasterize_bwd_pallas(
    p, f, g, bb, m, ntx, ntiles, W / 2.0, H / 2.0, compact_cap=COMPACT),
    payload, fout, gout, b, mv)

dslot = jax.jit(lambda p, f, g, bb, m: rp.rasterize_bwd_pallas(
    p, f, g, bb, m, ntx, ntiles, W / 2.0, H / 2.0, compact_cap=COMPACT))(
    payload, fout, gout, b, mv)


def reduce_fn(d):
    gid = d[31].astype(jnp.int32)
    return jax.ops.segment_sum(d.T, gid, num_segments=N + 1)[:N]


d7 = t("compact reduce (segment_sum)", reduce_fn, dslot)
print(f"SUM of stages: {(d1+d2+d3+d4+d6+d7)*1e3:.1f} ms")
