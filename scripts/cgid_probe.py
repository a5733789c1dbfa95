"""Probe the compact-gid construction components at late scale."""
import time

import _path  # noqa: F401,E402  (repo-root bootstrap)
import jax
import jax.numpy as jnp
import numpy as np

CCAP = 917_504
CAP = 4_194_304
NT = 1014
P = 1_000_000

rng = np.random.default_rng(0)
s2g = jnp.asarray(rng.integers(0, P + 1, CAP), jnp.int32)
cstart = jnp.asarray(np.arange(NT) * (CCAP // NT), jnp.int32)
base = jnp.asarray(np.sort(rng.integers(0, CAP - 128, NT)), jnp.int32)
vals = [(base - cstart + i) for i in range(3)]
karr = jnp.arange(CCAP, dtype=jnp.int32)
deltas = [jnp.asarray(rng.integers(0, 3, CCAP), jnp.int32) for _ in range(3)]
idxs = [jnp.asarray(rng.integers(0, CAP, CCAP), jnp.int32) for _ in range(3)]


def t(name, fn, args_list, scalar_of):
    f = jax.jit(fn)
    o = f(*args_list[0])
    _ = np.asarray(scalar_of(o))
    t0 = time.perf_counter()
    for i in range(2):
        o = f(*args_list[i % 3])
    _ = np.asarray(scalar_of(o))
    d2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(10):
        o = f(*args_list[i % 3])
    _ = np.asarray(scalar_of(o))
    d10 = time.perf_counter() - t0
    print(f"{name:48s} {(d10-d2)/8*1e3:8.2f} ms", flush=True)


t("cumsum [917k] i32", jnp.cumsum, [(d,) for d in deltas], lambda o: o[0])
t("scatter 1014 -> [917k]",
  lambda v: jnp.zeros((CCAP,), jnp.int32).at[cstart].add(v, mode="drop"),
  [(v,) for v in vals], lambda o: o[0])
t("gather [917k] rows from [CAP] i32", lambda i: s2g[i],
  [(i,) for i in idxs], lambda o: o[0])
tbl8 = jnp.asarray(rng.normal(size=(P + 1, 8)), jnp.float32)
gidc = [jnp.asarray(rng.integers(0, P + 1, CCAP), jnp.int32) for _ in range(3)]
t("gather [917k, 8] rows from [P+1, 8]", lambda g: tbl8[g].T,
  [(g,) for g in gidc], lambda o: o[0, 0])
t("associative_scan add [917k]",
  lambda d: jax.lax.associative_scan(jnp.add, d),
  [(d,) for d in deltas], lambda o: o[0])
# 2D trick: [917k] -> [896, 1024]: per-row cumsum + row-total scan
def cumsum2d(d):
    x = d.reshape(-1, 1024)
    r = jnp.cumsum(x, axis=1)
    tot = jnp.concatenate([jnp.zeros((1,), d.dtype), jnp.cumsum(r[:, -1])[:-1]])
    return (r + tot[:, None]).reshape(-1)
t("2D-blocked cumsum [896x1024]", cumsum2d, [(d,) for d in deltas],
  lambda o: o[0])
