"""Probe lax.sort cost at binning shapes (operand count / stability /
batching / size) to pick the cheapest key-sort formulation."""
import time

import _path  # noqa: F401,E402  (repo-root bootstrap)
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
CAP = 4_194_304
NT = 1014

tiles = [jnp.asarray(rng.integers(0, NT + 1, CAP), jnp.int32) for _ in range(3)]
depths = [jnp.asarray(rng.integers(0, 2**30, CAP), jnp.int32) for _ in range(3)]
gids = jnp.asarray(rng.integers(0, 1_000_000, CAP), jnp.int32)

t("sort3 nk=2 stable @4.2M (current)",
  lambda t_, d, g: jax.lax.sort((t_, d, g), num_keys=2, is_stable=True)[2],
  [(t_, d, gids) for t_, d in zip(tiles, depths)], lambda o: o[0])

t("sort2 nk=1 stable @4.2M (packed key)",
  lambda t_, g: jax.lax.sort((t_, g), num_keys=1, is_stable=True)[1],
  [(t_, gids) for t_ in tiles], lambda o: o[0])

t("sort2 nk=1 UNstable @4.2M",
  lambda t_, g: jax.lax.sort((t_, g), num_keys=1, is_stable=False)[1],
  [(t_, gids) for t_ in tiles], lambda o: o[0])

t("sort1 nk=1 UNstable @4.2M (key only)",
  lambda t_: jax.lax.sort((t_,), num_keys=1, is_stable=False)[0],
  [(t_,) for t_ in tiles], lambda o: o[0])

t("sort2 nk=1 unstable batched [16, 262144]",
  lambda t_, g: jax.lax.sort(
      (t_.reshape(16, -1), g.reshape(16, -1)), num_keys=1, is_stable=False,
      dimension=1)[1],
  [(t_, gids) for t_ in tiles], lambda o: o[0, 0])

t("sort2 nk=1 unstable batched [64, 65536]",
  lambda t_, g: jax.lax.sort(
      (t_.reshape(64, -1), g.reshape(64, -1)), num_keys=1, is_stable=False,
      dimension=1)[1],
  [(t_, gids) for t_ in tiles], lambda o: o[0, 0])

P = 1_048_576
dp = [jnp.asarray(rng.integers(0, 2**30, P), jnp.int32) for _ in range(3)]
gp = jnp.asarray(np.arange(P), jnp.int32)
t("sort2 nk=1 unstable @1M (gaussian presort)",
  lambda d, g: jax.lax.sort((d, g), num_keys=1, is_stable=False)[1],
  [(d, gp) for d in dp], lambda o: o[0])

t("sort2 nk=1 stable @1M",
  lambda d, g: jax.lax.sort((d, g), num_keys=1, is_stable=True)[1],
  [(d, gp) for d in dp], lambda o: o[0])

# f32 keys instead of i32?
tf = [x.astype(jnp.float32) for x in tiles]
t("sort2 f32-key nk=1 unstable @4.2M",
  lambda t_, g: jax.lax.sort((t_, g), num_keys=1, is_stable=False)[1],
  [(t_, gids) for t_ in tf], lambda o: o[0])

# compact 917504-row reduce presort shape
R = 917_504
gr = [jnp.asarray(rng.integers(0, P + 1, R), jnp.int32) for _ in range(3)]
ir = jnp.asarray(np.arange(R), jnp.int32)
t("sort2 nk=1 unstable @917k (reduce presort)",
  lambda a, b: jax.lax.sort((a, b), num_keys=1, is_stable=False)[1],
  [(a, ir) for a in gr], lambda o: o[0])
