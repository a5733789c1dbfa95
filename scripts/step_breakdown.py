"""Per-stage timing of the production render+backward at bench scale.

Each stage is chained REPS times inside one jit with a data-dependent
perturbation so XLA cannot CSE the repetitions; one readback at the end.
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
CAPACITY = 1_638_400  # what the training growth policy picks for this scene
REPS = 30

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
bg = jnp.zeros(3)


def chain(fn, *args, reps=REPS, perturb=0):
    # Separate async dispatches, one block at the end: the tunnel pipelines
    # the queue, so the ~30 ms dispatch RTT is paid once, not per rep.
    del perturb
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def t(name, fn, *args, **kw):
    dt = chain(fn, *args, **kw)
    print(f"{name:38s} {dt*1e3:8.2f} ms")
    return dt


# stage 1: preprocess
pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1, opacities=opac)
d1 = t("preprocess", lambda m: quadrics.preprocess(m, scales, rots, shs, 0, cam, 0.1,
                                                   opacities=opac).mean2d, means)

# stage 2: rects + binning
rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty, radius_xy=pre.radius_xy)
d2 = t("bin_gaussians", lambda d: binning.bin_gaussians(
    d, rects, ntx, nty, CAPACITY).slot_to_gaussian, pre.depth)
b = jax.jit(lambda d: binning.bin_gaussians(d, rects, ntx, nty, CAPACITY))(pre.depth)
seg = np.asarray(b.bounds[1:]) - np.asarray(b.bounds[:-1])
chunks = int((-(-seg // 128)).sum())
print(f"  num_keys={int(b.num_keys)}  window_chunks~={chunks}")

# stage 3: payload build (gather)
op_eff = opac * jnp.where(pre.valid, pre.coef, 0.0)
sigma6 = rp.pack_sigma6(pre.v2g_M)
bvec = jnp.einsum("pji,pj->pi", pre.v2g_M, pre.v2g_u0)
d3 = t("build_payload32 (gather)", lambda r: rp.build_payload32(
    r, op_eff, pre.v2g_M, pre.v2g_u0, sigma6, bvec, pre.conic, pre.mean2d, b), pre.rgb)
payload = rp.build_payload32(pre.rgb, op_eff, pre.v2g_M, pre.v2g_u0, sigma6, bvec,
                             pre.conic, pre.mean2d, b)

# stage 4/5: fwd + bwd pallas kernels (payload pre-built; kernel cost only)
meta = rp.RasterMeta(ntx=ntx, nty=nty, width=W, height=H,
                     compact_cap=CAPACITY // 4)
mv = rp._meta_vec(cam.focal_x, cam.focal_y, bg, W, H)
ntiles = ntx * nty
d4 = t("pallas forward kernel", lambda p: rp.rasterize_fwd_pallas(
    p, b, mv, ntx, ntiles), payload)

carrier = jnp.zeros((N, 3), jnp.float32)


def loss_fn(r):
    out = rp.rasterize(meta, r, op_eff, pre.v2g_M, pre.v2g_u0, sigma6, bvec,
                       pre.conic, pre.mean2d, carrier, cam.focal_x, cam.focal_y,
                       bg, b)
    return jnp.sum(out[:, :9])


d5 = t("full fwd+bwd (rasterize VJP, incl gather+reduce)",
       lambda r: jax.value_and_grad(loss_fn)(r)[1], pre.rgb)

# stage 6: per-gaussian reduce
dslot = jnp.asarray(rng.standard_normal((payload.shape[1], 32)), jnp.float32)
d6 = t("reduce_per_gaussian (segment_sum)",
       lambda d: binning.reduce_per_gaussian(d, b, N), dslot)

tot = d1 + d2 + d5 + d6
print(f"{'TOTAL (pre+bin+VJP+reduce)':38s} {tot*1e3:8.2f} ms  -> {1/tot:.2f} it/s upper bound")

# with_reg=False variants (pre-15000-iteration training configuration)
d4b = t("pallas forward kernel (with_reg=False)", lambda p: rp.rasterize_fwd_pallas(
    p, b, mv, ntx, ntiles, with_reg=False), payload)

meta_off = meta._replace(with_reg=False)


def loss_off(r):
    out = rp.rasterize(meta_off, r, op_eff, pre.v2g_M, pre.v2g_u0, sigma6, bvec,
                       pre.conic, pre.mean2d, carrier, cam.focal_x, cam.focal_y,
                       bg, b)
    return jnp.sum(out[:, :3]) + jnp.sum(out[:, 7])


d5b = t("full fwd+bwd (with_reg=False)",
        lambda r: jax.value_and_grad(loss_off)(r)[1], pre.rgb)
