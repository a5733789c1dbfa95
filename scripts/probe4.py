"""Definitive timing: N dispatches then ONE scalar D2H readback (np.asarray
forces real completion). Per-op cost = slope between N=2 and N=10."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(name, f, args_list, scalar_of):
    f = jax.jit(f)
    o = f(*args_list[0])
    _ = np.asarray(scalar_of(o))  # compile + settle

    def run(n):
        t0 = time.perf_counter()
        s = 0.0
        for i in range(n):
            o = f(*args_list[i % len(args_list)])
        s = float(np.asarray(scalar_of(o)))
        return time.perf_counter() - t0, s

    run(1)
    d2, _ = run(2)
    d10, _ = run(10)
    per = (d10 - d2) / 8
    print(f"{name:56s} {per*1e3:8.2f} ms/op  (2:{d2*1e3:.1f} 10:{d10*1e3:.1f})", flush=True)
    return per


rng = np.random.default_rng(0)
P, CAP = 1_000_000, 4_194_304
R = 851_968

table = jnp.asarray(rng.normal(size=(P + 1, 32)), jnp.float32)
idxs = [jnp.asarray(rng.integers(0, P, CAP), jnp.int32) for _ in range(3)]

t("gather [CAP,32] no T", lambda tb, ix: tb[ix], [(table, i) for i in idxs], lambda o: o[0, 0])
t("gather [32,CAP] with T (current)", lambda tb, ix: tb[ix].T, [(table, i) for i in idxs], lambda o: o[0, 0])
t("gather [CAP,16]", lambda tb, ix: tb[:, :16][ix], [(table, i) for i in idxs], lambda o: o[0, 0])

rows_l = [jnp.asarray(rng.normal(size=(R, 32)), jnp.float32) for _ in range(3)]
gids = [jnp.asarray(rng.integers(0, P, R), jnp.int32) for _ in range(3)]
gids_s = [jnp.sort(g) for g in gids]
t("segsum [R,32]->P random", lambda r, g: jax.ops.segment_sum(r, g, num_segments=P + 1),
  list(zip(rows_l, gids)), lambda o: o[0, 0])
t("segsum [R,32]->P sorted+hint",
  lambda r, g: jax.ops.segment_sum(r, g, num_segments=P + 1, indices_are_sorted=True),
  list(zip(rows_l, gids_s)), lambda o: o[0, 0])

x6s = [jnp.asarray(rng.integers(0, 3, (CAP, 6)), jnp.int32) for _ in range(3)]
t("cumsum [CAP,6] int32", lambda x: jnp.cumsum(x, axis=0), [(x,) for x in x6s], lambda o: o[-1, 0])

tiles = [jnp.asarray(rng.integers(0, 1014, CAP), jnp.int32) for _ in range(3)]
db = jnp.asarray(rng.integers(0, 2**30, CAP), jnp.int32)
gid_c = jnp.asarray(rng.integers(0, P, CAP), jnp.int32)
t("sort 2key+1carry stable @CAP",
  lambda t_, d, g: jax.lax.sort((t_, d, g), num_keys=2, is_stable=True)[2],
  [(t_, db, gid_c) for t_ in tiles], lambda o: o[0])
