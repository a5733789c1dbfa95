"""Microbenchmark for the Pallas blend kernel (run on the TPU).

Separates per-tile fixed cost from per-chunk compute by sweeping the number
of Gaussians per tile vs the number of populated tiles at constant total
work, and times forward vs forward+backward kernels in isolation (payload
pre-built so no XLA pipeline in the loop).
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=736)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gof_tpu import cameras
    from gof_tpu.ops import binning, quadrics
    from gof_tpu.ops import rasterize_pallas as rp
    from gof_tpu.sh import rgb_to_sh_dc

    cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0),
                                 width=args.width, height=args.height)
    ntx, nty = binning.tile_grid(cam.width, cam.height)
    ntiles = ntx * nty
    bg = jnp.zeros(3)
    mv = rp._meta_vec(cam.focal_x, cam.focal_y, bg, cam.width, cam.height)

    def timed(f, *a, reps=args.reps):
        np.asarray(jax.tree.leaves(f(*a))[0])
        t0 = time.time()
        for _ in range(reps):
            r = f(*a)
            np.asarray(jax.tree.leaves(r)[0])
        return (time.time() - t0) / reps * 1000

    def synth(n, scale):
        rng = np.random.default_rng(0)
        z = rng.uniform(3, 9, n)
        x = rng.uniform(-1, 1, n) * z * 0.35
        y = rng.uniform(-1, 1, n) * z * 0.25
        means = jnp.asarray(np.stack([x, y, z], -1), jnp.float32)
        scales = jnp.asarray(rng.uniform(0.5, 1.5, (n, 3)) * scale, jnp.float32)
        q = rng.normal(size=(n, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        rots = jnp.asarray(q, jnp.float32)
        opac = jnp.asarray(rng.uniform(0.3, 0.9, n), jnp.float32)
        shs = rgb_to_sh_dc(jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32))[:, None, :]
        pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1)
        rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty, radius_xy=pre.radius_xy)
        CAP = 1 << 21
        b = binning.bin_gaussians(pre.depth, rects, ntx, nty, capacity=CAP)
        op_eff = opac * jnp.where(pre.valid, pre.coef, 0.0)
        sigma6 = rp.pack_sigma6(pre.v2g_M)
        bvec = jnp.einsum("pji,pj->pi", pre.v2g_M, pre.v2g_u0)
        payload = rp.build_payload32(pre.rgb, op_eff, pre.v2g_M, pre.v2g_u0,
                                     sigma6, bvec, pre.conic, pre.mean2d, b)
        nk = int(b.num_keys)
        seg = np.asarray(b.bounds[1:]) - np.asarray(b.bounds[:-1])
        s = np.asarray(b.bounds[:-1])
        chunks = int((((s + seg + 127) // 128) - s // 128)[seg > 0].sum())
        pop = int((seg > 0).sum())
        return payload, b, nk, chunks, pop

    fwd = jax.jit(lambda p, bounds: rp.rasterize_fwd_pallas(
        p, rp.Binning(  # only bounds is read by the kernel
            slot_to_gaussian=None, bounds=bounds, dup_offsets=None,
            num_keys=None, overflow=None,
        ), mv, ntx, ntiles).sum())

    def fwd_t(payload, b):
        return timed(fwd, payload, b.bounds)

    bwd = jax.jit(lambda p, bounds, fo, go: rp.rasterize_bwd_pallas(
        p, fo, go, rp.Binning(None, bounds, None, None, None),
        mv, ntx, ntiles, cam.width / 2, cam.height / 2).sum())

    print(f"# image {args.width}x{args.height}, tiles={ntiles}")
    for name, n, scale in [
        ("small-50k", 50_000, 0.012),
        ("small-200k", 200_000, 0.012),
        ("mid-100k", 100_000, 0.03),
        ("big-20k", 20_000, 0.12),
    ]:
        payload, b, nk, chunks, pop = synth(n, scale)
        t = fwd_t(payload, b)
        print(f"fwd  {name}: keys={nk} chunks={chunks} popTiles={pop} "
              f"-> {t:.2f} ms  ({t / max(chunks,1) * 1000:.1f} us/chunk, "
              f"{t / ntiles * 1000:.1f} us/tile)")

    # backward at one config
    payload, b, nk, chunks, pop = synth(100_000, 0.03)
    fo = rp.rasterize_fwd_pallas(
        payload, rp.Binning(None, b.bounds, None, None, None), mv, ntx, ntiles)
    go = jnp.ones_like(fo) * 0.1
    t = timed(bwd, payload, b.bounds, fo, go)
    print(f"bwd  mid-100k: chunks={chunks} -> {t:.2f} ms ({t / max(chunks,1) * 1000:.1f} us/chunk)")


if __name__ == "__main__":
    main()
