"""Lean probe: payload-gather layout variants + reduce variants at late scale.

Timings cycle distinct input buffers: identical-args dispatches get
deduplicated in the axon stack and read ~0 ms.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(name, fn, args_list, reps=9):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args_list[0]))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [f(*args_list[i % len(args_list)]) for i in range(reps)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:56s} {dt*1e3:8.2f} ms (compile {tc:.0f}s)", flush=True)
    return dt


rng = np.random.default_rng(0)
P, CAP = 1_000_000, 4_194_304
table = jnp.asarray(rng.normal(size=(P + 1, 32)), jnp.float32)
idxs = [jnp.asarray(rng.integers(0, P, CAP), jnp.int32) for _ in range(3)]

t("gather [CAP,32] = tbl[idx] (no T)", lambda tb, ix: tb[ix], [(table, i) for i in idxs])
t("gather [32,CAP] = tbl[idx].T (current)", lambda tb, ix: tb[ix].T, [(table, i) for i in idxs])
t("gather [CAP,16] narrow", lambda tb, ix: tb[:, :16][ix], [(table, i) for i in idxs])

R = 851_968
rows_l = [jnp.asarray(rng.normal(size=(R, 32)), jnp.float32) for _ in range(3)]
gids = [jnp.asarray(rng.integers(0, P, R), jnp.int32) for _ in range(3)]
gids_s = [jnp.sort(g) for g in gids]
t("segsum random ids [R,32]->P", lambda r, g: jax.ops.segment_sum(r, g, num_segments=P + 1),
  list(zip(rows_l, gids)))
t("segsum sorted ids (hint)", lambda r, g: jax.ops.segment_sum(r, g, num_segments=P + 1, indices_are_sorted=True),
  list(zip(rows_l, gids_s)))
t("sort gid 1key+1carry @R", lambda g: jax.lax.sort((g, jnp.arange(R, dtype=jnp.int32)), num_keys=1)[1],
  [(g,) for g in gids])

x6s = [jnp.asarray(rng.integers(0, 3, (CAP, 6)), jnp.int32) for _ in range(3)]
t("jnp.cumsum [CAP,6] int32 axis0", lambda x: jnp.cumsum(x, axis=0), [(x,) for x in x6s])
t("jnp.cumsum [R,32] f32 axis0", lambda x: jnp.cumsum(x, axis=0), [(x,) for x in rows_l])
