"""Probe reduce alternatives at bench scale (1.6M rows, 100k gaussians).

Plan R1: invert the tile-sort permutation with a second sort, gather the
gradient rows into dup (gaussian-contiguous) order, then reduce contiguous
segments (sorted segment_sum or cumsum-diff).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

K, P = 1_638_400, 100_000
rng = np.random.default_rng(0)

cnt = rng.integers(0, 2 * K // P, P)
off = np.concatenate([[0], np.cumsum(cnt)]).astype(np.int32)
Kr = int(off[-1])
assert Kr <= K
gid_dup = np.repeat(np.arange(P, dtype=np.int32), cnt)  # dup order (sorted ids)
sorted_to_dup = np.full(K, 2**30, np.int32)
sorted_to_dup[:Kr] = rng.permutation(Kr)
gid_slot = np.full(K, P, np.int32)
gid_slot[:Kr] = gid_dup[sorted_to_dup[:Kr]]

seg_unsorted = jnp.asarray(gid_slot)
seg_sorted = jnp.asarray(np.concatenate([gid_dup, np.full(K - Kr, P, np.int32)]))
s2d = jnp.asarray(sorted_to_dup)
offs = jnp.asarray(np.clip(off, 0, K))


def timed(name, fn, x, reps=4):
    def body(x):
        out = fn(x)
        for _ in range(reps - 1):
            eps = (jax.tree.leaves(out)[0].ravel()[:1] * 1e-30).astype(x.dtype)
            x = x + eps.reshape((1,) * x.ndim)
            out = fn(x)
        return out
    f = jax.jit(body)
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    jax.block_until_ready(f(x))
    print(f"{name:52s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms/op")
    sys.stdout.flush()


d32 = jnp.asarray(rng.standard_normal((K, 32)), jnp.float32)
which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "a"):
    timed("segment_sum unsorted ids [K,32]",
          lambda x: jax.ops.segment_sum(x, seg_unsorted, num_segments=P + 1), d32)
if which in ("all", "b"):
    timed("segment_sum sorted ids [K,32] (flag)",
          lambda x: jax.ops.segment_sum(x, seg_sorted, num_segments=P + 1,
                                        indices_are_sorted=True), d32)
if which in ("all", "c"):
    iota = jnp.arange(K, dtype=jnp.int32)
    timed("invert perm: 2-op sort [K]",
          lambda x: jax.lax.sort((s2d + (x[0, 0] * 1e-30).astype(jnp.int32), iota),
                                 num_keys=1, is_stable=False)[1], d32)
if which in ("all", "d"):
    iota = jnp.arange(K, dtype=jnp.int32)
    d2s = jax.lax.sort((s2d, iota), num_keys=1, is_stable=False)[1]
    timed("gather rows [K,32] via dup_to_slot", lambda x: x[d2s], d32)
if which in ("all", "e"):
    def cumsum_diff(x):
        cs = jnp.cumsum(x, axis=0)
        csz = jnp.concatenate([jnp.zeros((1, 32), x.dtype), cs], axis=0)
        return csz[offs[1:]] - csz[offs[:-1]]
    timed("XLA cumsum [K,32] + P diff gathers", cumsum_diff, d32, reps=2)
