"""Internal timing of bin_gaussians stages at a chosen scale (class-stride
expansion: padded-size ladder -> [P] class sort -> closed-form slot owner +
one [CAP] attrs gather -> (tile, depth, id) 3-key sort -> bisection bounds).
"""
import argparse
import time

import _path  # noqa: F401,E402  (repo-root bootstrap)
import jax
import jax.numpy as jnp
import numpy as np

from gof_tpu import cameras
from gof_tpu.ops import binning, quadrics
from gof_tpu.sh import rgb_to_sh_dc

ap = argparse.ArgumentParser()
ap.add_argument("--gaussians", type=int, default=1_000_000)
ap.add_argument("--capacity", type=int, default=4_194_304)
ap.add_argument("--sigma", type=float, default=-4.3)
ap.add_argument("--cpu", action="store_true")
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

N = args.gaussians
W, H = 1237, 822
CAPACITY = args.capacity
REPS = 20

rng = np.random.default_rng(0)
z = rng.uniform(2, 12, N)
means = jnp.asarray(np.stack([rng.uniform(-1, 1, N) * z * 0.45,
                              rng.uniform(-1, 1, N) * z * 0.3, z], -1), jnp.float32)
scales = jnp.asarray(np.exp(rng.normal(args.sigma, 0.5, (N, 3))), jnp.float32)
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
b0 = jax.jit(lambda d, r: binning.bin_gaussians(d, r, ntx, nty, CAPACITY))(
    depth, rects)
print(f"num_keys={int(b0.num_keys)} num_slots={int(b0.num_slots)} "
      f"capacity={CAPACITY} overflow={bool(b0.overflow)}")


def t(name, fn, args_list, scalar_of, reps=REPS):
    f = jax.jit(fn)
    o = f(*args_list[0])
    _ = np.asarray(scalar_of(o))

    def run(n):
        t0 = time.perf_counter()
        for i in range(n):
            o = f(*args_list[i % len(args_list)])
        _ = np.asarray(scalar_of(o))
        return time.perf_counter() - t0

    run(1)
    d2 = run(2)
    d10 = run(reps)
    per = (d10 - d2) / (reps - 2)
    print(f"{name:48s} {per*1e3:8.2f} ms", flush=True)
    return per


depths = [depth, depth * 0.999, depth * 1.001]

t("full bin_gaussians", lambda d: binning.bin_gaussians(
    d, rects, ntx, nty, CAPACITY).slot_to_gaussian, [(d,) for d in depths],
  lambda o: o[0])

# stage isolation: class sort over [P]
counts = (rects.w * rects.h).astype(jnp.int32)
sizes = binning.class_sizes(ntiles)
gid = jnp.arange(N, dtype=jnp.int32)


def padded_of(c):
    padded = jnp.full_like(c, sizes[-1])
    for s in reversed(sizes[:-1]):
        padded = jnp.where(c <= s, s, padded)
    return jnp.where(c > 0, padded, 0)


t("A: padded-size ladder (elementwise [P])", padded_of,
  [(counts,), (counts + 0,), (counts * 1,)], lambda o: o[0])

padded = jax.jit(padded_of)(counts)
t("B: [P] class sort", lambda p: jax.lax.sort((p, gid), num_keys=1,
                                              is_stable=True)[1],
  [(padded,)] * 3, lambda o: o[0])

k = jnp.arange(CAPACITY, dtype=jnp.int32)
gidx_demo = jnp.minimum(k // 3, N - 1)
tbl = jnp.stack([counts, counts, counts, gid], 1)
t("C: [CAP, 4] attrs gather", lambda g: tbl[g], [(gidx_demo,)] * 3,
  lambda o: o[0, 0])

tile_demo = jnp.asarray(rng.integers(0, ntiles + 1, CAPACITY), jnp.int32)
depth_demo = jnp.asarray(rng.integers(0, 2**30, CAPACITY), jnp.int32)
gid_demo = jnp.asarray(rng.integers(0, N, CAPACITY), jnp.int32)
t("D: (tile, depth, id) 3-key sort [CAP]",
  lambda tl: jax.lax.sort((tl, depth_demo, gid_demo), num_keys=3,
                          is_stable=False)[2], [(tile_demo,)] * 3,
  lambda o: o[0])

ts = jax.lax.sort((tile_demo,), num_keys=1)[0]
t("E: bisection bounds [NTILES+1]",
  lambda x: binning._bounds_by_bisection(x, ntiles), [(ts,)] * 3,
  lambda o: o[0])
