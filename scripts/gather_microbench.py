"""Microbenchmark: payload gather alternatives at training scale.

Verdict recorded in COMPONENTS.md: the [K,32] row gather is latency-bound
(~55ns/row, width-independent), and both alternatives (batched
delta-scatter+cumsum expansion; value-carrying sort) are slower at the
same K. The sort-carry roadmap item is therefore dead.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

P = 100_000
K = 600_000
REPS = 8

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, P, K), jnp.int32)
cnt = rng.integers(0, 12, P)
cnt = (cnt * (K / cnt.sum())).astype(np.int64)
off = np.concatenate([[0], np.cumsum(cnt)]).clip(0, K - 1).astype(np.int32)
off_j = jnp.asarray(off[:-1])


def timed(name, fn, x, reps=REPS):
    """Chain `reps` dependent applications inside one jit: each rep's input
    is perturbed by a data-dependent, non-foldable epsilon."""

    def body(x):
        out = fn(x)
        for _ in range(reps - 1):
            eps = (out.ravel()[:1] * 1e-30).astype(x.dtype)  # ~0 but not 0
            x = x + eps.reshape((1,) * (x.ndim - 1) + (1,))
            out = fn(x)
        return out

    f = jax.jit(body)
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    jax.block_until_ready(f(x))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:46s} {dt*1e3:8.2f} ms/op")
    return dt


for C in (32, 16, 8):
    flat = jnp.asarray(rng.standard_normal((P, C)), jnp.float32)
    timed(f"gather rows [P,{C}] -> [K,{C}] (+T)", lambda f: f[idx].T, flat)

flat32 = jnp.asarray(rng.standard_normal((P, 32)), jnp.float32)


def expand_batched(f):
    v = jax.lax.bitcast_convert_type(f, jnp.int32)
    prev = jnp.concatenate([jnp.zeros((1, 32), jnp.int32), v[:-1]], axis=0)
    delta = v - prev
    d = jnp.zeros((K, 32), jnp.int32).at[off_j].add(delta, mode="drop")
    s = jnp.cumsum(d, axis=0)
    return jax.lax.bitcast_convert_type(s, jnp.float32).T


timed("delta-scatter + cumsum [K,32] (expansion)", expand_batched, flat32, 4)

tile = jnp.asarray(rng.integers(0, 1200, K), jnp.int32)
vals = jnp.asarray(rng.integers(0, 2**30, (K, 16)), jnp.int32)


def sort_carry(t):
    ops = (t,) + tuple(vals[:, i] for i in range(16))
    return jax.lax.sort(ops, num_keys=1, is_stable=True)[1]


timed("stable sort 1 key + 16 carried int32 [K]", sort_carry, tile, 4)
