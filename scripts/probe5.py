"""XLA gather width/table-size scaling + scatter cost, D2H-anchored."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(name, f, args_list, scalar_of):
    f = jax.jit(f)
    o = f(*args_list[0])
    _ = np.asarray(scalar_of(o))

    def run(n):
        t0 = time.perf_counter()
        for i in range(n):
            o = f(*args_list[i % len(args_list)])
        _ = float(np.asarray(scalar_of(o)))
        return time.perf_counter() - t0

    run(1)
    d2 = run(2)
    d10 = run(10)
    per = (d10 - d2) / 8
    print(f"{name:56s} {per*1e3:8.2f} ms/op", flush=True)
    return per


rng = np.random.default_rng(0)
P, CAP = 1_000_000, 4_194_304

table = jnp.asarray(rng.normal(size=(P + 1, 32)), jnp.float32)
idxs = [jnp.asarray(rng.integers(0, P, CAP), jnp.int32) for _ in range(3)]

for w in (1, 2, 4, 8):
    t(f"gather [CAP,{w}]", lambda tb, ix, w=w: tb[:, :w][ix],
      [(table, i) for i in idxs], lambda o: o.reshape(-1)[0])

t("gather 2x16 concat", lambda tb, ix: jnp.concatenate([tb[:, :16][ix], tb[:, 16:][ix]], axis=1),
  [(table, i) for i in idxs], lambda o: o[0, 0])
t("gather 4x8 concat", lambda tb, ix: jnp.concatenate([tb[:, j:j + 8][ix] for j in range(0, 32, 8)], axis=1),
  [(table, i) for i in idxs], lambda o: o[0, 0])

# table-size dependence at fixed 16 cols
for PT in (131_072, 262_144, 1_000_000):
    tbl = jnp.asarray(rng.normal(size=(PT, 16)), jnp.float32)
    ix2 = [jnp.asarray(rng.integers(0, PT, CAP), jnp.int32) for _ in range(3)]
    t(f"gather [CAP,16] from P={PT}", lambda tb, ix: tb[ix],
      [(tbl, i) for i in ix2], lambda o: o[0, 0])

# scatter: [CAP,k].at[P sorted idx].add
starts = [jnp.sort(jnp.asarray(rng.integers(0, CAP, P), jnp.int32)) for _ in range(3)]
vals6 = jnp.asarray(rng.integers(0, 100, (P, 6)), jnp.int32)
t("scatter-add [CAP,6] @P sorted", lambda s, v: jnp.zeros((CAP, 6), jnp.int32).at[s].add(v, mode="drop", indices_are_sorted=True),
  [(s, vals6) for s in starts], lambda o: o[0, 0])
t("scatter-add [CAP,1] @P sorted", lambda s, v: jnp.zeros((CAP,), jnp.int32).at[s].add(v[:, 0], mode="drop", indices_are_sorted=True),
  [(s, vals6) for s in starts], lambda o: o[0])
t("scatter-set [CAP,1] @P sorted", lambda s, v: jnp.zeros((CAP,), jnp.int32).at[s].set(v[:, 0], mode="drop", indices_are_sorted=True),
  [(s, vals6) for s in starts], lambda o: o[0])

# segsum width scaling
R = 851_968
rows16 = [jnp.asarray(rng.normal(size=(R, 16)), jnp.float32) for _ in range(3)]
gids = [jnp.asarray(rng.integers(0, P, R), jnp.int32) for _ in range(3)]
t("segsum [R,16]->P random", lambda r, g: jax.ops.segment_sum(r, g, num_segments=P + 1),
  list(zip(rows16, gids)), lambda o: o[0, 0])
