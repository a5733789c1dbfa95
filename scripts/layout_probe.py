"""Probe: does the minor-dim (lane) padding of [P, C] / [P, 15, 3] f32
arrays dominate elementwise/Adam traffic at 3M gaussians? All data is
generated ON DEVICE (the tunnel's H2D path is slow); timing is D2H-anchored
(N chained dispatches + one scalar readback, slope between 2 and N reps)."""
import time

import _path  # noqa: F401,E402
import jax
import jax.numpy as jnp
import numpy as np

from gof_tpu.utils import compile_cache

compile_cache.enable()

P = 3_000_000


def timed(name, f, state, nbytes, reps=12):
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
    print(f"{name:28s} {dt*1e3:8.2f} ms  logical {nbytes/1e9:.2f} GB "
          f"-> {nbytes/max(dt,1e-9)/1e9:7.1f} GB/s effective", flush=True)


def dev_normal(shape, seed=0):
    return jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(seed), shape, jnp.float32))()


def bench(name, shape):
    x = dev_normal(shape)

    @jax.jit
    def f(x):
        return x * 1.000001 + 1e-9

    timed(name, f, x, 2 * 4 * int(np.prod(shape)))


bench("[P, 59]", (P, 59))
bench("[59, P]", (59, P))
bench("[P, 3]", (P, 3))
bench("[3, P]", (3, P))
bench("[P, 15, 3] (f_rest shape)", (P, 15, 3))
bench("[P, 45]", (P, 45))
bench("[P*59] flat 1D", (P * 59,))


def adam_like(g, m, v):
    m2 = 0.9 * m + 0.1 * g
    v2 = 0.999 * v + 0.001 * g * g
    upd = -0.001 * m2 / (jnp.sqrt(v2) + 1e-15)
    return upd + 1e-12, m2, v2


for name, shape in (("adam [P, 59]", (P, 59)), ("adam [59, P]", (59, P)),
                    ("adam [P*59] 1D", (P * 59,))):
    g0 = dev_normal(shape)

    @jax.jit
    def f(s):
        g, m, v = s
        upd, m2, v2 = adam_like(g, m, v)
        return upd, m2, v2

    s = (g0, jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
    timed(name, f, s, 6 * 4 * int(np.prod(shape)))

# the production fused Adam: concat 6 leaves -> [P, 59] -> adam -> unflat
from gof_tpu import config as config_lib, train as train_lib  # noqa: E402
from gof_tpu.model import gaussians as gm  # noqa: E402


@jax.jit
def dev_params():
    k = jax.random.PRNGKey(1)
    return gm.GaussianParams(
        xyz=jax.random.normal(k, (P, 3)),
        features_dc=jax.random.normal(k, (P, 1, 3)),
        features_rest=jnp.zeros((P, 15, 3), jnp.float32),
        scaling=jax.random.normal(k, (P, 3)) - 4.0,
        rotation=jax.random.normal(k, (P, 4)),
        opacity=jax.random.normal(k, (P,)),
    )


params = dev_params()
opt = config_lib.OptimizationParams()
tx = train_lib.make_optimizer(opt, 5.0)
tp = train_lib.TrainParams(gauss=params, app_net=None, app_emb=None)
opt_state = tx.init(tp)
grads = jax.jit(lambda t: jax.tree.map(lambda x: x * 1e-6, t))(tp)


@jax.jit
def prod_step(s):
    tp, opt_state = s
    import optax
    upd, opt_state = tx.update(grads, opt_state, tp)
    tp = optax.apply_updates(tp, upd)
    return tp, opt_state


timed("PROD fused Adam+apply", prod_step, (tp, opt_state),
      (6 + 2) * 4 * P * 59)
