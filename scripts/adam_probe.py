"""Isolate the non-render step costs at 1M gaussians: fused Adam update,
overflow gating, densification-stat accumulation, quadrics VJP."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import _path  # noqa: F401,E402  (repo-root bootstrap)
from bench import make_state  # noqa: E402

from gof_tpu import cameras, config as config_lib, train as train_lib  # noqa: E402
from gof_tpu.model import gaussians as gm  # noqa: E402
from gof_tpu.ops import quadrics  # noqa: E402

N = 1_000_000
rng = np.random.default_rng(1)
params, gstate = make_state(N, rng, sigma=-4.3)
opt = config_lib.OptimizationParams()
tx = train_lib.make_optimizer(opt, 5.0)
cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0), width=1237, height=822)
cam = jax.tree.map(np.asarray, cam)


def t(name, f, args_list, scalar_of):
    f = jax.jit(f)
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
    print(f"{name:52s} {(d10 - d2) / 8 * 1e3:8.2f} ms", flush=True)


tp0 = train_lib.TrainParams(gauss=params, app_net=None, app_emb=None)
s0 = tx.init(tp0)
# distinct on-device buffers (no host round-trip: bulk D2H through the
# tunnel can wedge); jnp.copy defeats constant-dedup without downloading
s0 = jax.tree.map(jnp.copy, s0)
grads_l = [train_lib.TrainParams(
    gauss=jax.tree.map(lambda x: x * f, params), app_net=None, app_emb=None)
    for f in (1e-6, 2e-6, 3e-6)]

import optax  # noqa: E402


def upd(g, s, tp):
    u, s2 = tx.update(g, s, tp)
    tp2 = optax.apply_updates(tp, u)
    return tp2.gauss.xyz[0, 0] + s2.mu_flat[0, 0]


t("tx.update + apply (fused adam)", upd,
  [(g, s0, tp0) for g in grads_l], lambda o: o)


def upd_gate(g, s, tp, ov):
    u, s2 = tx.update(g, s, tp)
    tp2 = optax.apply_updates(tp, u)
    gate = lambda old, new: jax.tree.map(
        lambda a, b: jnp.where(ov, a, b) if hasattr(b, "dtype") else b, old, new)
    tp3 = gate(tp, tp2)
    s3 = gate(s, s2)
    return tp3.gauss.xyz[0, 0] + s3.mu_flat[0, 0]


t("adam + overflow gate", upd_gate,
  [(g, s0, tp0, jnp.bool_(False)) for g in grads_l], lambda o: o)

# quadrics preprocess VJP at 1M (the P-sized backward chain)
means = params.xyz
scales_l = [jnp.exp(params.scaling) * f for f in (1.0, 1.001, 0.999)]


def pre_vjp(m, s, r, o):
    def loss(m, s, r, o):
        pre = quadrics.preprocess(m, s, r, jnp.zeros((N, 1, 3)), 0, cam, 0.1,
                                  opacities=o)
        return (jnp.sum(pre.mean2d * 1e-6) + jnp.sum(pre.v2g_M * 1e-6)
                + jnp.sum(pre.v2g_u0 * 1e-6) + jnp.sum(pre.rgb * 1e-6)
                + jnp.sum(pre.coef * 1e-6))
    g = jax.grad(loss, argnums=(0, 1, 2, 3))(m, s, r, o)
    return g[0][0, 0] + g[1][0, 0]


rots = params.rotation
opac = jax.nn.sigmoid(params.opacity)
t("quadrics preprocess fwd+vjp @1M", pre_vjp,
  [(means, s, rots, opac) for s in scales_l], lambda o: o)

# filtered scaling/opacity + masked_shs + stat accumulation
def model_glue(g, filt):
    sf = gm.filtered_scaling(g, filt)
    of = gm.filtered_opacity(g, filt)
    shs = train_lib.masked_shs(g, jnp.int32(3), 3)
    return jnp.sum(sf * 1e-6) + jnp.sum(of * 1e-6) + jnp.sum(shs * 1e-6)


t("filtered scales/opacity + masked_shs fwd", model_glue,
  [(jax.tree.map(lambda x: x * f, params), gstate.filter_3d)
   for f in (1.0, 1.001, 0.999)], lambda o: o)

carrier_l = [jnp.full((N, 3), f, jnp.float32) for f in (1e-6, 2e-6, 3e-6)]
radii = jnp.full((N,), 5.0)
vis = jnp.ones((N,), bool)
t("add_densification_stats", lambda c: gm.add_densification_stats(
    gstate, c, radii, vis).grad_accum[0],
  [(c,) for c in carrier_l], lambda o: o)
