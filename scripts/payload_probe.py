"""Probe: payload-delivery strategies for the blend kernels at the 3M
endgame point (P=3M gaussians, CAP~7.3M key slots).

The production path gathers the 16-col payload AFTER the (tile,depth,id)
sort: `flat[slot_to_gaussian].T` — measured ~161 ms at this shape (~10 ms
per gathered column + ~40 ms fixed). Candidates:

  A. post-sort XLA row gather (status quo)          flat[gid].T
  B. pre-sort class_gather (monotonic, MXU) of the payload columns, then
     CARRY them through the 3-key sort as extra int32 operands
  C. B but bf16-packed (2 cols per int32 operand) to halve sort payload
  D. post-sort lane-axis gather                      flat_t[:, gid]

All data device-generated; timing is D2H-anchored (the tunnel's
block_until_ready is unreliable).
"""
import time

import _path  # noqa: F401,E402
import jax
import jax.numpy as jnp
import numpy as np

from gof_tpu.utils import compile_cache
from gof_tpu.ops import class_gather

compile_cache.enable()

P = 3_000_000
CAP = 7_340_032


def timed(name, f, state, reps=10):
    state = f(state)
    _ = np.asarray(jax.tree.leaves(state)[0].ravel()[0])

    def run(n):
        s = state
        t0 = time.perf_counter()
        for _ in range(n):
            s = f(s)
        _ = np.asarray(jax.tree.leaves(s)[0].ravel()[0])
        return time.perf_counter() - t0

    run(1)
    d2 = run(2)
    dn = run(reps)
    dt = (dn - d2) / (reps - 2)
    print(f"{name:44s} {dt*1e3:8.2f} ms", flush=True)


def dev(fn):
    return jax.jit(fn)()


k0 = jax.random.PRNGKey(0)
tile = dev(lambda: jax.random.randint(k0, (CAP,), 0, 1014, jnp.int32))
depth = dev(lambda: jax.random.randint(k0, (CAP,), 0, 2**30, jnp.int32))
gid = dev(lambda: jax.random.randint(k0, (CAP,), 0, P, jnp.int32))
# monotonic gidx with steps in {0,1} covering [0, P)
gmono = dev(lambda: jnp.minimum(
    jnp.cumsum(jax.random.bernoulli(
        k0, P / CAP, (CAP,)).astype(jnp.int32)), P - 1))
flat = dev(lambda: jax.random.normal(k0, (P + 1, 16), jnp.float32))
flat24 = dev(lambda: jax.random.normal(k0, (P + 1, 24), jnp.float32))
flat_t = dev(lambda: jax.random.normal(k0, (16, P + 1), jnp.float32))
cols16 = dev(lambda: [jax.random.randint(jax.random.PRNGKey(i), (P,),
                                         0, 2**30, jnp.int32)
                      for i in range(16)])
cols24 = dev(lambda: [jax.random.randint(jax.random.PRNGKey(i), (P,),
                                         0, 2**30, jnp.int32)
                      for i in range(24)])


def mut(x):
    """Perturb an int32 key array so chained reps don't no-op."""
    return x ^ 1


# --- sorts ---
def sort_n(nextra):
    def f(s):
        t, d, g = s
        extras = tuple(d + i for i in range(nextra))
        out = jax.lax.sort((t, d, g) + extras, num_keys=3, is_stable=False)
        return out[0] ^ 1, out[1], out[2]
    return f


if not __import__("os").environ.get("SKIP_SORTS"):
    for ne in (0, 8, 12, 16, 24):
        timed(f"3-key sort + {ne} extra int32 operands", jax.jit(sort_n(ne)),
              (tile, depth, gid))


# --- post-sort gathers (tables ride the state so they aren't inlined as
# HLO constants — the tunnel's remote_compile rejects >200MB requests)
if not __import__("os").environ.get("SKIP_A"):
    timed("A: row gather [P+1,16].T (production)",
          jax.jit(lambda s: (s[0], s[1] + jnp.sum(s[2][s[0]].T), s[2])),
          (gid, jnp.float32(0), flat))
timed("A24: row gather [P+1,24].T",
      jax.jit(lambda s: (s[0], s[1] + jnp.sum(s[2][s[0]].T), s[2])),
      (gid, jnp.float32(0), flat24))
timed("D: lane gather flat_t[:, gid]",
      jax.jit(lambda s: (s[0], s[1] + jnp.sum(s[2][:, s[0]]), s[2])),
      (gid, jnp.float32(0), flat_t))


# --- pre-sort class_gather (monotonic) ---
def cg(nc):
    def f(s):
        gi, z, cols = s
        outs = class_gather.expand([(c, 4) for c in cols], gi, P,
                                   force="kernel")
        return gi, z + outs[0][0], cols
    return f


timed("B-gather: class_gather 16x4B cols", jax.jit(cg(16)),
      (gmono, jnp.int32(0), cols16))
timed("B-gather: class_gather 24x4B cols", jax.jit(cg(24)),
      (gmono, jnp.int32(0), cols24))
