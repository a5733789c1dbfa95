"""First thing to run when the TPU tunnel is back: compile + execute the
Pallas kernels (sorted reduce) and the class-stride binning on real
hardware at small and production shapes, verifying against their
XLA-equivalent paths.

Interpret mode does NOT catch Mosaic lowering constraints (sublane
multiples, DMA alignment, layout changes) — this does.
"""
import os
import sys
import time

import _path  # noqa: F401,E402  (repo-root bootstrap)

import jax
import jax.numpy as jnp
import numpy as np


def check(name, fn, ref_fn, args, atol=0.0):
    t0 = time.perf_counter()
    out = jax.tree.map(np.asarray, jax.jit(fn)(*args))
    dt = time.perf_counter() - t0
    ref = jax.tree.map(np.asarray, ref_fn(*args))
    ok = all(
        np.allclose(a, b, atol=atol) if atol else np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(ref))
    )
    print(f"{name:48s} compile+run {dt:6.1f}s  match={ok}", flush=True)
    if not ok:
        for i, (a, b) in enumerate(zip(jax.tree.leaves(out), jax.tree.leaves(ref))):
            bad = np.sum(a != b) if not atol else np.sum(~np.isclose(a, b, atol=atol))
            print(f"  leaf {i}: {bad} mismatches of {a.size}")
    return ok


def main():
    from gof_tpu.ops import binning, reduce as red

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # --- class-stride binning: TPU vs CPU-evaluated reference semantics ---
    for n, ntx, nty, cap in ((3000, 10, 8, 8192), (500_000, 39, 26, 2_097_152)):
        mean2d = jnp.asarray(rng.uniform(-20, 1200, (n, 2)), jnp.float32)
        radius = jnp.asarray(rng.uniform(1, 60, n), jnp.float32)
        valid = jnp.asarray(rng.random(n) > 0.3)
        depth = jnp.asarray(rng.uniform(0.5, 30, n), jnp.float32)
        rects = binning.gaussian_rects(mean2d, radius, valid, ntx, nty)

        def kern(d, r=rects, ntx=ntx, nty=nty, cap=cap):
            b = binning.bin_gaussians(d, r, ntx, nty, cap)
            return b.slot_to_gaussian, b.bounds, b.num_slots, b.overflow

        with jax.default_device(jax.devices("cpu")[0]):
            ref_out = jax.tree.map(np.asarray, jax.jit(kern)(depth))
        check(f"binning n={n} cap={cap}", kern, lambda d: ref_out, (depth,))

    # --- sorted windowed reduce vs segment_sum ---
    for R, P in ((65_536, 100_000), (917_504, 1_000_000)):
        ids = jnp.asarray(rng.integers(0, P + 1, R), jnp.int32)
        rows = jnp.asarray(rng.normal(size=(16, R)), jnp.float32)

        def kern(r, g, P=P):
            return red.reduce_rows_by_gid(r, g, P)

        def ref(r, g, P=P):
            # reduce_rows_by_gid returns [P, C]
            return jax.ops.segment_sum(r.T, g, num_segments=P + 1)[:P]

        check(f"sorted reduce R={R} P={P}", kern, jax.jit(ref), (rows, ids),
              atol=1e-4)


if __name__ == "__main__":
    main()
