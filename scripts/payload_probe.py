"""THE payload-gather question (late-scale design): how to get [CAP, 16]
per-key payload rows into (tile, depth) slot order fast.

Candidates measured (D2H-anchored timing, distinct input buffers — the
tunnel dedupes identical dispatches and block_until_ready is unreliable):

  A. XLA row gather from [P,16] f32 vs table size (find the table-size cliff)
  B. same from a bf16 table (half the table bytes)
  C. column-split gathers (2 x [P,8])
  D. lax.sort carrying the 16 payload cols (apply-permutation-by-sort)
  E. narrow (tile,depth,gid) sort for reference
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--cap", type=int, default=4_194_304)
ap.add_argument("--cpu", action="store_true")
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

CAP = args.cap
rng = np.random.default_rng(0)


def t(name, fn, args_list, scalar_of, reps_hi=8):
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
    dh = run(reps_hi)
    per = (dh - d2) / (reps_hi - 2)
    print(f"{name:58s} {per*1e3:8.2f} ms", flush=True)
    return per


for P in (100_000, 250_000, 500_000, 1_000_000):
    table = jnp.asarray(rng.normal(size=(P, 16)), jnp.float32)
    tables = [table, table * 1.001, table * 0.999]
    idx = jnp.asarray(rng.integers(0, P, CAP), jnp.int32)
    t(f"A: gather [CAP,16] from [{P},16] f32 ({P*64//2**20}MB)",
      lambda tb, ix: tb[ix], [(tb, idx) for tb in tables], lambda o: o[0, 0])

tableb = jnp.asarray(rng.normal(size=(1_000_000, 16)), jnp.bfloat16)
tbs = [tableb, tableb * 1.001, tableb * 0.999]
idx = jnp.asarray(rng.integers(0, 1_000_000, CAP), jnp.int32)
t("B: gather [CAP,16] from [1M,16] bf16 (32MB)",
  lambda tb, ix: tb[ix], [(tb, idx) for tb in tbs], lambda o: o[0, 0].astype(jnp.float32))

table = jnp.asarray(rng.normal(size=(1_000_000, 16)), jnp.float32)
tables = [table, table * 1.001, table * 0.999]
t("C: 2 x gather [CAP,8] from [1M,8] halves",
  lambda tb, ix: (tb[:, :8][ix], tb[:, 8:][ix]),
  [(tb, idx) for tb in tables], lambda o: o[0][0, 0])

pay = jnp.asarray(rng.normal(size=(CAP, 16)), jnp.float32)
pays = [pay, pay * 1.001, pay * 0.999]
tile = jnp.asarray(rng.integers(0, 1014, CAP), jnp.int32)
dep = jnp.asarray(rng.integers(0, 1 << 30, CAP), jnp.int32)
gid = jnp.asarray(rng.integers(0, 1_000_000, CAP), jnp.int32)


def sort_carry16(p, tl, dp):
    cols = tuple(p[:, i] for i in range(16))
    out = jax.lax.sort((tl, dp) + cols, num_keys=2, is_stable=True)
    return out[2]


t("D: 2-key sort carrying 16 f32 cols", sort_carry16,
  [(p, tile, dep) for p in pays], lambda o: o[0])

t("E: 2-key sort carrying gid only",
  lambda tl, dp, g: jax.lax.sort((tl, dp, g), num_keys=2, is_stable=True)[2],
  [(tile, dep, gid + k) for k in range(3)], lambda o: o[0])
