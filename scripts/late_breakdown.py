"""Per-stage timing at an arbitrary scale (use --gaussians 1000000 for the
late-training design point). Timings are D2H-anchored (block_until_ready
through the tunnel does not reliably wait): N dispatches + one scalar
readback, slope between N=2 and N=10."""
import argparse
import time

import _path  # noqa: F401,E402  (repo-root bootstrap)
import jax
import jax.numpy as jnp
import numpy as np

from gof_tpu import cameras
from gof_tpu.ops import binning, quadrics
from gof_tpu.ops import rasterize_pallas as rp
from gof_tpu.sh import rgb_to_sh_dc
from gof_tpu.utils import compile_cache

compile_cache.enable()

ap = argparse.ArgumentParser()
ap.add_argument("--gaussians", type=int, default=1_000_000)
ap.add_argument("--capacity", type=int, default=4_128_768)
ap.add_argument("--compact-cap", type=int, default=0)
ap.add_argument("--sigma", type=float, default=-4.3)
ap.add_argument("--cpu", action="store_true")
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

N = args.gaussians
W, H = 1237, 822
CAPACITY = args.capacity

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
    payload = rp.build_payload16(pre.rgb, op_eff, pre.v2g_M, pre.v2g_u0, b)
    mv = rp._meta_vec(cam.focal_x, cam.focal_y, bg, W, H)
    return pre, rects, b, op_eff, payload, mv


pre, rects, b, op_eff, payload, mv = setup(means, scales, rots, opac,
                                           jnp.asarray(shs_np))
NK = int(b.num_keys)
print(f"num_keys={NK} capacity={CAPACITY} overflow={bool(b.overflow)}")
COMPACT = args.compact_cap or -(-int(NK * 0.27) // 65536) * 65536
print(f"compact_cap={COMPACT}")


def t(name, fn, args_list, scalar_of):
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
    d10 = run(10)
    per = (d10 - d2) / 8
    print(f"{name:46s} {per*1e3:8.2f} ms", flush=True)
    return per


# distinct-input cycling: the tunnel dedupes identical-args dispatches
opacs = [opac, opac * 0.999, opac * 1.001]
shs_dev = jax.jit(lambda r: rgb_to_sh_dc(r)[:, None, :])(jnp.asarray(shs_np))

t("preprocess", lambda m, s, r, o, sh: quadrics.preprocess(
    m, s, r, sh, 0, cam, 0.1, opacities=o).mean2d,
    [(means, scales, rots, o, shs_dev) for o in opacs], lambda o: o[0, 0])

depths = [pre.depth, pre.depth * 0.999, pre.depth * 1.001]
t("bin_gaussians", lambda d, rc: binning.bin_gaussians(
    d, rc, ntx, nty, CAPACITY).slot_to_gaussian,
    [(d, rects) for d in depths], lambda o: o[0])

rgbs = [pre.rgb, pre.rgb * 0.99, pre.rgb * 1.01]
t("build_payload16 (gather)", lambda r, oe, p, bb: rp.build_payload16(
    r, oe, p.v2g_M, p.v2g_u0, bb),
    [(r, op_eff, pre, b) for r in rgbs], lambda o: o[0, 0])

payloads = [payload, payload * 0.999, payload * 1.001]
t("pallas forward kernel", lambda p, bb, m: rp.rasterize_fwd_pallas(
    p, bb, m, ntx, ntiles), [(p, b, mv) for p in payloads],
    lambda o: o[0, 0, 0])

fout = jax.jit(lambda p, bb, m: rp.rasterize_fwd_pallas(p, bb, m, ntx, ntiles))(
    payload, b, mv)
gout = jnp.ones_like(fout)

t("build_payload24 (stats gather)", lambda r, oe, p, bb: rp.build_payload16(
    r, oe, p.v2g_M, p.v2g_u0, bb, conic=p.conic, mean2d=p.mean2d),
    [(r, op_eff, pre, b) for r in rgbs], lambda o: o[0, 0])

payload24 = jax.jit(lambda r, oe, p, bb: rp.build_payload16(
    r, oe, p.v2g_M, p.v2g_u0, bb, conic=p.conic, mean2d=p.mean2d))(
    pre.rgb, op_eff, pre, b)
payloads24 = [payload24, payload24 * 0.999, payload24 * 1.001]

t("bwd kernel (stats)", lambda p, f, g, bb, m: rp.rasterize_bwd_pallas(
    p, f, g, bb, m, ntx, ntiles, W / 2.0, H / 2.0, compact_cap=COMPACT)[0],
    [(p, fout, gout, b, mv) for p in payloads24], lambda o: o[0, 0])

t("bwd kernel (reg, no stats)", lambda p, f, g, bb, m: rp.rasterize_bwd_pallas(
    p, f, g, bb, m, ntx, ntiles, W / 2.0, H / 2.0, compact_cap=COMPACT,
    with_stats=False)[0],
    [(p, fout, gout, b, mv) for p in payloads], lambda o: o[0, 0])

dslot, gidc, stats = jax.jit(lambda p, f, g, bb, m: rp.rasterize_bwd_pallas(
    p, f, g, bb, m, ntx, ntiles, W / 2.0, H / 2.0, compact_cap=COMPACT))(
    payload24, fout, gout, b, mv)

dslots = [dslot, dslot * 0.999, dslot * 1.001]
t("reduce (segment_sum 16+8)", lambda d, g, s: rp.reduce_compact_rows(
    d, g, s, N)[0], [(d, gidc, stats) for d in dslots], lambda o: o[0, 0])
t("reduce (16 only)", lambda d, g: rp.reduce_compact_rows(
    d, g, None, N)[0], [(d, gidc) for d in dslots], lambda o: o[0, 0])
