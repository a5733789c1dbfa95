"""Probe the delta-scatter + cumsum replacement for the [CAP]-row attrs
gather in bin_gaussians (binning.py:270).

gidx is monotonic with steps in {0,1}: slot start of class-sorted gaussian i
is closed-form, so tbl[gidx] == cumsum(delta) with
delta[start_i] = v[i] - v[i-1] (telescoping is exact in int32 wraparound).
Measures each piece at the late design point.
"""
import time

import _path  # noqa: F401,E402  (repo-root bootstrap)
from gof_tpu.utils import compile_cache
compile_cache.enable()
import jax
import jax.numpy as jnp
import numpy as np


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
    print(f"{name:52s} {per*1e3:8.2f} ms", flush=True)
    return per


rng = np.random.default_rng(0)
CAP = 3_670_016
P = 1_000_000

starts = np.sort(rng.choice(CAP, P, replace=False)).astype(np.int32)
starts_l = [jnp.asarray(starts) for _ in range(3)]
v7 = [jnp.asarray(rng.integers(-2**31, 2**31, (P, 7), dtype=np.int64).astype(np.int32))
      for _ in range(3)]
v1 = [x[:, 0] for x in v7]

t("1D cumsum [CAP] i32", lambda d: jnp.cumsum(d),
  [(jnp.zeros((CAP,), jnp.int32),)], lambda o: o[-1])
t("2D cumsum [CAP,7] axis0 i32", lambda d: jnp.cumsum(d, axis=0),
  [(jnp.zeros((CAP, 7), jnp.int32),)], lambda o: o[-1, 0])
t("2D cumsum [7,CAP] axis1 i32", lambda d: jnp.cumsum(d, axis=1),
  [(jnp.zeros((7, CAP), jnp.int32),)], lambda o: o[0, -1])
t("scatter [P] rows -> [CAP] 1col", lambda s, v:
  jnp.zeros((CAP,), jnp.int32).at[s].add(v, mode="drop"),
  list(zip(starts_l, v1)), lambda o: o[0])
t("scatter [P,7] rows -> [CAP,7]", lambda s, v:
  jnp.zeros((CAP, 7), jnp.int32).at[s].add(v, mode="drop"),
  list(zip(starts_l, v7)), lambda o: o[0, 0])


def full_expand(s, v):
    prev = jnp.concatenate([jnp.zeros((1, 7), jnp.int32), v[:-1]])
    delta = v - prev
    d = jnp.zeros((CAP, 7), jnp.int32).at[s].add(delta, mode="drop")
    return jnp.cumsum(d, axis=0)


def full_expand_t(s, v):
    prev = jnp.concatenate([jnp.zeros((1, 7), jnp.int32), v[:-1]])
    delta = (v - prev).T  # [7, P]
    d = jnp.zeros((7, CAP), jnp.int32).at[:, s].add(delta, mode="drop")
    return jnp.cumsum(d, axis=1)


t("FULL expand (scatter+cumsum) [CAP,7]", full_expand,
  list(zip(starts_l, v7)), lambda o: o[0, 0])
t("FULL expand transposed [7,CAP]", full_expand_t,
  list(zip(starts_l, v7)), lambda o: o[0, 0])

# correctness vs gather
gidx = np.zeros(CAP, np.int32)
gidx[starts[1:]] = 1
gidx = np.cumsum(gidx).astype(np.int32)
want = np.asarray(v7[0])[gidx]
got = np.asarray(jax.jit(full_expand)(starts_l[0], v7[0]))
print("exact match:", bool((want == got).all()), flush=True)
