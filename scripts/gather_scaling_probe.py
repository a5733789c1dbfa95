"""Probe: how do row-gather / segment_sum costs scale with table size,
index order, and row width? Informs the late-scale binning redesign."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(name, fn, *args, reps=10):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:58s} {dt*1e3:8.2f} ms", flush=True)
    return dt


rng = np.random.default_rng(0)

for P, CAP in [(100_000, 1_638_400), (1_000_000, 4_194_304), (1_000_000, 6_553_600)]:
    print(f"--- P={P} CAP={CAP} ---")
    table = jnp.asarray(rng.normal(size=(P, 32)), jnp.float32)
    idx_rand = jnp.asarray(rng.integers(0, P, CAP), jnp.int32)
    idx_sort = jnp.sort(idx_rand)
    t(f"row gather [CAP] from [P,32], random idx", lambda tb, ix: jnp.take(tb, ix, axis=0), table, idx_rand)
    t(f"row gather [CAP] from [P,32], sorted idx", lambda tb, ix: jnp.take(tb, ix, axis=0), table, idx_sort)
    t(f"row gather [CAP] from [P,8] (narrow), random", lambda tb, ix: jnp.take(tb[:, :8], ix, axis=0), table, idx_rand)
    t(f"col gather x1 [CAP] from [P], random", lambda tb, ix: jnp.take(tb[:, 0], ix), table, idx_rand)
    # transposed layout: gather along axis=1 of [32, P]
    tableT = jnp.asarray(np.ascontiguousarray(np.asarray(table).T))
    t(f"gather [32,CAP] from [32,P] axis1, random", lambda tb, ix: jnp.take(tb, ix, axis=1), tableT, idx_rand)

    R = CAP // 8  # compact rows
    rows = jnp.asarray(rng.normal(size=(R, 32)), jnp.float32)
    gid_rand = jnp.asarray(rng.integers(0, P, R), jnp.int32)
    gid_sort = jnp.sort(gid_rand)
    t(f"segment_sum [R={R},32] -> P, random ids",
      lambda r, g: jax.ops.segment_sum(r, g, num_segments=P + 1), rows, gid_rand)
    t(f"segment_sum [R,32] -> P, sorted ids",
      lambda r, g: jax.ops.segment_sum(r, g, num_segments=P + 1, indices_are_sorted=True), rows, gid_sort)
    t(f"segment_sum [R,32] -> P, sorted ids (no hint)",
      lambda r, g: jax.ops.segment_sum(r, g, num_segments=P + 1), rows, gid_sort)
    # cumsum-diff alternative for sorted ids
    from gof_tpu.ops.binning import _bounds_by_bisection

    def cumsum_diff(r, g):
        cs = jnp.cumsum(r, axis=0)
        qi = _bounds_by_bisection(g, P)  # [P+1]
        tot = jnp.concatenate([jnp.zeros((1, 32), r.dtype), cs])[qi]
        return tot[1:] - tot[:-1]
    t(f"cumsum+bisect-diff [R,32] -> P (sorted)", cumsum_diff, rows, gid_sort)
