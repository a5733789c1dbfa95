"""Probe gather-fusion candidates: wide-row slot gathers (payload+aux in
one gather), multi-operand [P] sorts (attrs carried through the class sort
instead of a separate gather)."""
import time

import _path  # noqa: F401,E402  (repo-root bootstrap)
import jax
import jax.numpy as jnp
import numpy as np

CAP = 4_194_304
P = 1_000_000

rng = np.random.default_rng(0)
gids = [jnp.asarray(rng.integers(0, P + 1, CAP), jnp.int32) for _ in range(3)]


def t(name, fn, args_list, scalar_of, reps=10):
    f = jax.jit(fn)
    o = f(*args_list[0])
    _ = np.asarray(scalar_of(o))
    t0 = time.perf_counter()
    for i in range(2):
        o = f(*args_list[i % 3])
    _ = np.asarray(scalar_of(o))
    d2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(reps):
        o = f(*args_list[i % 3])
    _ = np.asarray(scalar_of(o))
    d10 = time.perf_counter() - t0
    print(f"{name:48s} {(d10-d2)/(reps-2)*1e3:8.2f} ms", flush=True)


for w in (16, 24, 32):
    tbl = jnp.asarray(rng.normal(size=(P + 1, w)), jnp.float32)
    t(f"gather [4.2M, {w}] from [1M, {w}] (+ transpose)",
      lambda g, tbl=tbl: tbl[g].T, [(g,) for g in gids], lambda o: o[0, 0])

# the same fused as two gathers (current state)
tbl16 = jnp.asarray(rng.normal(size=(P + 1, 16)), jnp.float32)
tbl8 = jnp.asarray(rng.normal(size=(P + 1, 8)), jnp.float32)
t("two gathers 16 + 8 [4.2M]",
  lambda g: (tbl16[g].T, tbl8[g].T), [(g,) for g in gids],
  lambda o: o[0][0, 0])

# [P] sorts with varying operand counts
pad = jnp.asarray(rng.integers(1, 33, P), jnp.int32)
cols = [jnp.asarray(rng.integers(0, 2**30, P), jnp.int32) for _ in range(4)]
t("sort [1M] 2 ops nk=1 stable",
  lambda p: jax.lax.sort((p, cols[0]), num_keys=1, is_stable=True)[1],
  [(pad + i,) for i in range(3)], lambda o: o[0])
t("sort [1M] 5 ops nk=1 stable",
  lambda p: jax.lax.sort((p, cols[0], cols[1], cols[2], cols[3]),
                         num_keys=1, is_stable=True)[1],
  [(pad + i,) for i in range(3)], lambda o: o[0])
tbl4 = jnp.asarray(rng.integers(0, 2**30, (P, 4)), jnp.int32)
gp = [jnp.asarray(rng.permutation(P), jnp.int32) for _ in range(3)]
t("gather [1M, 4] by permutation", lambda g: tbl4[g],
  [(g,) for g in gp], lambda o: o[0, 0])
