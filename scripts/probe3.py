"""Ground-truth device timing: chain K dependent iterations of each op inside
ONE jit (lax.scan with a data dependency), so per-op time = wall/K regardless
of tunnel dispatch caching/async artifacts."""
import time

import jax
import jax.numpy as jnp
import numpy as np

K = 20


def t(name, mk, reps=3):
    f, args = mk()
    f = jax.jit(f)
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    tc = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:56s} {best/K*1e3:8.2f} ms/op (compile {tc:.0f}s)", flush=True)


rng = np.random.default_rng(0)
P, CAP = 1_000_000, 4_194_304
R = 851_968


def mk_gather(transpose, cols):
    table = jnp.asarray(rng.normal(size=(P + 1, 32)), jnp.float32)[:, :cols]
    idx = jnp.asarray(rng.integers(0, P, CAP), jnp.int32)

    def f(tb, ix):
        def body(c, _):
            g = tb[(ix + c) & (P - 1)]
            out = g.T if transpose else g
            return c + out.reshape(-1)[0].astype(jnp.int32) % 2, out[0, 0]
        c, ys = jax.lax.scan(body, jnp.int32(0), None, length=K)
        return ys
    return f, (table, idx)


def mk_cumsum6():
    x = jnp.asarray(rng.integers(0, 3, (CAP, 6)), jnp.int32)

    def f(x):
        def body(c, _):
            cs = jnp.cumsum(x + c, axis=0)
            return c + cs[-1, 0] % 2, cs[0, 0]
        _, ys = jax.lax.scan(body, jnp.int32(0), None, length=K)
        return ys
    return f, (x,)


def mk_segsum(sorted_ids):
    rows = jnp.asarray(rng.normal(size=(R, 32)), jnp.float32)
    g = jnp.asarray(rng.integers(0, P, R), jnp.int32)
    if sorted_ids:
        g = jnp.sort(g)

    def f(rows, g):
        def body(c, _):
            s = jax.ops.segment_sum(rows + c, g, num_segments=P + 1,
                                    indices_are_sorted=sorted_ids)
            return c + s[0, 0] * 0, s[0, 0]
        _, ys = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return ys
    return f, (rows, g)


def mk_sort2key():
    tile = jnp.asarray(rng.integers(0, 1014, CAP), jnp.int32)
    db = jnp.asarray(rng.integers(0, 2**30, CAP), jnp.int32)
    gid = jnp.asarray(rng.integers(0, P, CAP), jnp.int32)

    def f(tile, db, gid):
        def body(c, _):
            s = jax.lax.sort((tile + c, db, gid), num_keys=2, is_stable=True)[2]
            return c + s[0] % 2, s[0]
        _, ys = jax.lax.scan(body, jnp.int32(0), None, length=K)
        return ys
    return f, (tile, db, gid)


t("gather [CAP,32] no T", lambda: mk_gather(False, 32))
t("gather [32,CAP] with T (current)", lambda: mk_gather(True, 32))
t("gather [CAP,16]", lambda: mk_gather(False, 16))
t("cumsum [CAP,6] int32", mk_cumsum6)
t("segsum [R,32]->P random", lambda: mk_segsum(False))
t("segsum [R,32]->P sorted+hint", lambda: mk_segsum(True))
t("sort 2key+1carry stable @CAP", mk_sort2key)
