"""Probe XLA gather cost vs width / table size at the late design point:
is the [CAP]-row gather width-independent, and does a small (ntiles-sized)
lookup table gather cost less per row than a [P]-row one?"""
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
NT = 1054

idx = [jnp.asarray(rng.integers(0, P, CAP), jnp.int32) for _ in range(3)]
idx_small = [jnp.asarray(rng.integers(0, NT, CAP), jnp.int32) for _ in range(3)]
# monotonic index with steps in {0, 1} (the class-expansion structure)
steps = (rng.random(CAP) < P / CAP).astype(np.int32)
mono = np.minimum(np.cumsum(steps) - steps[0], P - 1).astype(np.int32)
idx_mono = [jnp.asarray(np.minimum(mono + k, P - 1), jnp.int32) for k in range(3)]

tbl1 = jnp.asarray(rng.standard_normal((P, 1)), jnp.float32)
tbl4 = jnp.asarray(rng.standard_normal((P, 4)), jnp.float32)
tbl8 = jnp.asarray(rng.standard_normal((P, 8)), jnp.float32)
tbl16 = jnp.asarray(rng.standard_normal((P, 16)), jnp.float32)
small = jnp.asarray(rng.standard_normal((NT,)), jnp.float32)

t("[CAP] <- [P,1] gather", lambda i: tbl1[i], [(i,) for i in idx], lambda o: o[0, 0])
t("[CAP] <- [P,4] gather", lambda i: tbl4[i], [(i,) for i in idx], lambda o: o[0, 0])
t("[CAP] <- [P,8] gather", lambda i: tbl8[i], [(i,) for i in idx], lambda o: o[0, 0])
t("[CAP] <- [P,16] gather", lambda i: tbl16[i], [(i,) for i in idx], lambda o: o[0, 0])
t("[CAP] <- [NT] small-table gather", lambda i: small[i],
  [(i,) for i in idx_small], lambda o: o[0])
t("[CAP] <- [P,4] MONOTONIC gather", lambda i: tbl4[i],
  [(i,) for i in idx_mono], lambda o: o[0, 0])
# sorted+take_along_axis variant
t("[CAP] <- [NT] one-hot dot (f32)", lambda i: jnp.einsum(
    "ck,k->c", (i[:, None] == jnp.arange(NT, dtype=jnp.int32)[None, :16]).astype(jnp.float32),
    small[:16]), [(i,) for i in idx_small], lambda o: o[0])
