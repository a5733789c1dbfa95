"""Isolate the fwd-kernel cost: aligned vs unaligned segment bounds.

Same kernel code; bounds_al rounds every segment start down to a chunk
multiple (wrong image, same memory-access shape as the round-1 aligned
layout). If aligned is much faster, misaligned DMA windows / boundary
chunks are the regression; otherwise it's the kernel body.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gof_tpu import cameras
from gof_tpu.ops import binning, quadrics
from gof_tpu.ops import rasterize_pallas as rp
from gof_tpu.sh import rgb_to_sh_dc

N = 100_000
W, H = 1237, 822
CAPACITY = 1 << 21
REPS = 8

rng = np.random.default_rng(0)
z = rng.uniform(2, 12, N)
means = jnp.asarray(np.stack([rng.uniform(-1, 1, N) * z * 0.45,
                              rng.uniform(-1, 1, N) * z * 0.3, z], -1), jnp.float32)
scales = jnp.asarray(np.exp(rng.normal(-3.2, 0.5, (N, 3))), jnp.float32)
q = rng.normal(size=(N, 4)); q /= np.linalg.norm(q, axis=-1, keepdims=True)
rots = jnp.asarray(q, jnp.float32)
opac = jnp.asarray(rng.uniform(0.3, 0.95, N), jnp.float32)
shs = rgb_to_sh_dc(jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32))[:, None, :]
cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0), width=W, height=H)
ntx, nty = binning.tile_grid(W, H)
ntiles = ntx * nty
bg = jnp.zeros(3)
mv = rp._meta_vec(cam.focal_x, cam.focal_y, bg, W, H)

pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1, opacities=opac)
rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty, radius_xy=pre.radius_xy)
b = jax.jit(lambda d: binning.bin_gaussians(d, rects, ntx, nty, CAPACITY))(pre.depth)
op_eff = opac * jnp.where(pre.valid, pre.coef, 0.0)
sigma6 = rp.pack_sigma6(pre.v2g_M)
bvec = jnp.einsum("pji,pj->pi", pre.v2g_M, pre.v2g_u0)
payload = rp.build_payload32(pre.rgb, op_eff, pre.v2g_M, pre.v2g_u0, sigma6, bvec,
                             pre.conic, pre.mean2d, b)
print(f"num_keys={int(b.num_keys)} capacity={CAPACITY}")

bounds = b.bounds
bounds_al = (bounds // 128) * 128  # chunk-aligned variant (image wrong, perf probe)

seg = np.asarray(bounds[1:] - bounds[:-1])
s = np.asarray(bounds[:-1])
wchunks = int((((s + seg + 127) // 128) - s // 128)[seg > 0].sum())
print(f"window chunks unaligned={wchunks}  aligned={int(-(-seg // 128).sum())}")


def chain(fn, *args, reps=REPS):
    def body(*args):
        out = fn(*args)
        for _ in range(reps - 1):
            eps = (out.ravel()[:1] * 1e-30).astype(args[0].dtype)
            a = (args[0] + eps.reshape((1,) * args[0].ndim),) + args[1:]
            out = fn(*a)
        return out
    f = jax.jit(body)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    return (time.perf_counter() - t0) / reps


def t(name, fn, *args):
    dt = chain(fn, *args)
    print(f"{name:44s} {dt*1e3:8.2f} ms")


def fwd_with(bb, with_reg=True):
    bin2 = b._replace(bounds=bb)
    return lambda p: rp.rasterize_fwd_pallas(p, bin2, mv, ntx, ntiles, with_reg=with_reg)


t("fwd unaligned (production)", fwd_with(bounds), payload)
t("fwd aligned-down bounds", fwd_with(bounds_al), payload)
t("fwd unaligned with_reg=False", fwd_with(bounds, False), payload)
