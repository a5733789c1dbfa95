"""Per-stage timing of the production render+backward at bench scale.

Timing: separate async dispatches with one terminal block (the tunnel
pipelines the queue; per-call dispatch RTT would otherwise add ~3 ms/stage).
All large arrays are jit ARGUMENTS, never closure constants: lowering a
captured device array downloads it host-side, and bulk D2H through the
tunnel can be pathologically slow.
"""
import time

import _path  # noqa: F401,E402  (repo-root bootstrap)
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
shs_np = np.asarray(rng.uniform(0, 1, (N, 3)), np.float32)
cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0), width=W, height=H)
# numpy-backed closure constants: lowering a captured DEVICE array triggers a
# D2H fetch, which can wedge through the tunnel
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


def t(name, fn, *args, reps=REPS):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:38s} {dt*1e3:8.2f} ms", flush=True)
    return dt


shs_dev = jax.jit(lambda r: rgb_to_sh_dc(r)[:, None, :])(jnp.asarray(shs_np))

d1 = t("preprocess", lambda m, s, r, o, sh: quadrics.preprocess(
    m, s, r, sh, 0, cam, 0.1, opacities=o).mean2d,
    means, scales, rots, opac, shs_dev)

d2 = t("bin_gaussians", lambda d, rc: binning.bin_gaussians(
    d, rc, ntx, nty, CAPACITY).slot_to_gaussian, pre.depth, rects)
print(f"  num_keys={int(b.num_keys)}")

d3 = t("build_payload32 (gather)", lambda r, oe, p, s6, bv, bb: rp.build_payload32(
    r, oe, p.v2g_M, p.v2g_u0, s6, bv, p.conic, p.mean2d, bb),
    pre.rgb, op_eff, pre, sigma6, bvec, b)

d4 = t("pallas forward kernel", lambda p, bb, m: rp.rasterize_fwd_pallas(
    p, bb, m, ntx, ntiles), payload, b, mv)

meta = rp.RasterMeta(ntx=ntx, nty=nty, width=W, height=H,
                     compact_cap=CAPACITY // 4)
meta_off = meta._replace(with_reg=False)


def vjp_fn(m):
    def loss(r, oe, M, u0, s6, bv, cn, m2, car, bb):
        out = rp.rasterize(m, r, oe, M, u0, s6, bv, cn, m2, car,
                           cam.focal_x, cam.focal_y, bg, bb)
        return jnp.sum(out[:, :9] if m.with_reg else out[:, :3])

    def run(r, oe, p, s6, bv, car, bb):
        g = jax.grad(loss, argnums=(0, 1))(r, oe, p.v2g_M, p.v2g_u0, s6, bv,
                                           p.conic, p.mean2d, car, bb)
        return g[0]
    return run


carrier = jax.jit(lambda n: jnp.zeros((n, 3), jnp.float32),
                  static_argnums=0)(N)

d5 = t("full fwd+bwd (VJP incl gather+reduce)", vjp_fn(meta),
       pre.rgb, op_eff, pre, sigma6, bvec, carrier, b)

tot = d1 + d2 + d5
print(f"{'TOTAL (pre+bin+VJP)':38s} {tot*1e3:8.2f} ms  -> {1/tot:.2f} it/s upper bound")

d4b = t("pallas forward kernel (with_reg=False)", lambda p, bb, m: rp.rasterize_fwd_pallas(
    p, bb, m, ntx, ntiles, with_reg=False), payload, b, mv)
d5b = t("full fwd+bwd (with_reg=False)", vjp_fn(meta_off),
        pre.rgb, op_eff, pre, sigma6, bvec, carrier, b)

# backward kernel alone (fout precomputed; cotangent = ones)
fout = jax.jit(lambda p, bb, m: rp.rasterize_fwd_pallas(p, bb, m, ntx, ntiles))(
    payload, b, mv)
gout = jax.jit(lambda f: jnp.ones_like(f))(fout)
d6 = t("bwd kernel alone (compact out)", lambda p, f, g, bb, m: rp.rasterize_bwd_pallas(
    p, f, g, bb, m, ntx, ntiles, W / 2.0, H / 2.0, compact_cap=CAPACITY // 4),
    payload, fout, gout, b, mv)

dslot = jax.jit(lambda p, f, g, bb, m: rp.rasterize_bwd_pallas(
    p, f, g, bb, m, ntx, ntiles, W / 2.0, H / 2.0, compact_cap=CAPACITY // 4))(
    payload, fout, gout, b, mv)


def reduce_fn(d):
    gid = d[31].astype(jnp.int32)
    return jax.ops.segment_sum(d.T, gid, num_segments=N + 1)[:N]


d7 = t("compact reduce (segment_sum)", reduce_fn, dslot)
