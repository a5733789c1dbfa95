"""Benchmark: full differentiable render step (fwd+bwd) on a synthetic scene.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor: the reference trains Mip-NeRF 360 "bicycle" (1237x822 at -r4)
for 30k iterations in ~45 min on an unspecified GPU (README.md:34), i.e.
~11.1 train iters/sec. This benchmark times our fused forward+backward render
step (preprocess + binning + Pallas rasterize + gradient reduction) at a
bicycle-like resolution and Gaussian count, which dominates the train step.

Run stages with --profile for a stage breakdown. Timing forces host readback
(block_until_ready is not reliable through the axon tunnel).
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--gaussians", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=1237)
    ap.add_argument("--height", type=int, default=822)
    # Capacity matches what the training loop's doubling policy (train.py:
    # key_capacity 262144 -> x2 on overflow) settles at for this workload:
    # 484k duplicated keys -> 524288. Binning/gather/reduce costs scale with
    # this static capacity, not with the live key count.
    ap.add_argument("--capacity", type=int, default=1 << 19)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gof_tpu import cameras
    from gof_tpu.ops import binning, quadrics, tiled_ref
    from gof_tpu.ops import rasterize_pallas as rp
    from gof_tpu.sh import rgb_to_sh_dc

    n = args.gaussians
    rng = np.random.default_rng(1)
    z = rng.uniform(3, 9, n)
    x = rng.uniform(-1, 1, n) * z * 0.35
    y = rng.uniform(-1, 1, n) * z * 0.25
    means = jnp.asarray(np.stack([x, y, z], -1), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.008, 0.03, (n, 3)), jnp.float32)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    rots = jnp.asarray(q, jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.95, n), jnp.float32)
    shs = rgb_to_sh_dc(jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32))[:, None, :]
    cam = cameras.look_at_camera(
        eye=(0, 0, 0), target=(0, 0, 5.0), width=args.width, height=args.height
    )
    bg = jnp.zeros(3)
    ntx, nty = binning.tile_grid(cam.width, cam.height)
    meta = rp.RasterMeta(ntx=ntx, nty=nty, width=cam.width, height=cam.height)
    CAP = args.capacity

    def full_impl(means, scales, rots, opac, shs, carrier):
        pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1, opacities=opac)
        rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty)
        b = binning.bin_gaussians(pre.depth, rects, ntx, nty, capacity=CAP)
        op_eff = opac * jnp.where(pre.valid, jax.lax.stop_gradient(pre.coef), 0.0)
        sigma6 = rp.pack_sigma6(pre.v2g_M)
        bvec = jnp.einsum("pji,pj->pi", pre.v2g_M, pre.v2g_u0)
        out = rp.rasterize(
            meta, pre.rgb, op_eff, pre.v2g_M, pre.v2g_u0, sigma6, bvec,
            pre.conic, pre.mean2d, carrier, cam.focal_x, cam.focal_y, bg, b,
        )
        return out, b.num_keys

    def one_step(means, scales, rots, opac, shs):
        def loss(m, s, r, o, sh, c):
            out, nk = full_impl(m, s, r, o, sh, c)
            img = tiled_ref.assemble_image(out, ntx, nty, cam.width, cam.height)
            return jnp.sum(img[:9] ** 2), nk

        (l, nk), g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4, 5), has_aux=True)(
            means, scales, rots, opac, shs, jnp.zeros((n, 3), jnp.float32)
        )
        return l, nk, g[0]

    # Chain `reps` steps on-device inside one jit: a host readback through the
    # TPU tunnel costs ~30ms, which would otherwise dominate the measurement.
    @jax.jit
    def step_chain(means, scales, rots, opac, shs):
        def body(i, carry):
            m, acc = carry
            l, nk, gm_ = one_step(m, scales, rots, opac, shs)
            return (m + gm_ * 1e-20, acc + l)

        m, acc = jax.lax.fori_loop(0, args.reps, body, (means, jnp.float32(0)))
        return acc

    def timed(f, *a, reps=args.reps):
        np.asarray(jax.tree.leaves(f(*a))[0])  # compile + sync
        t0 = time.time()
        np.asarray(jax.tree.leaves(f(*a))[0])
        return (time.time() - t0 - 0.03) / reps

    if args.profile:
        @jax.jit
        def fwd_chain(means, scales, rots, opac, shs):
            def body(i, carry):
                m, acc = carry
                out, nk = full_impl(m, scales, rots, opac, shs, jnp.zeros((n, 3), jnp.float32))
                return (m + out[0, 0, 0] * 1e-20, acc + out[0, 0, 1])

            m, acc = jax.lax.fori_loop(0, args.reps, body, (means, jnp.float32(0)))
            return acc

        tf = timed(fwd_chain, means, scales, rots, opac, shs)
        nk = jax.jit(lambda *a: full_impl(*a, jnp.zeros((n, 3), jnp.float32))[1])(
            means, scales, rots, opac, shs
        )
        print(f"# fwd: {tf*1000:.2f} ms  num_keys={int(nk)}")

    nk_check = int(
        jax.jit(lambda *a: full_impl(*a, jnp.zeros((n, 3), jnp.float32))[1])(
            means, scales, rots, opac, shs
        )
    )
    assert nk_check <= CAP, f"keys {nk_check} overflow capacity {CAP}"

    dt = timed(step_chain, means, scales, rots, opac, shs)
    iters_per_sec = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "fused_render_fwd_bwd_iters_per_sec",
                "value": round(iters_per_sec, 3),
                "unit": "iters/s",
                "vs_baseline": round(iters_per_sec / 11.1, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
