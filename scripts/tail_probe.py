"""Decompose the late-step 'tail': preprocess VJP, quadric chain, fused
Adam, overflow-gate wheres — each timed in isolation at 1M gaussians."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import _path  # noqa: F401,E402  (repo-root bootstrap)
from bench import make_state  # noqa: E402

from gof_tpu import cameras, config as config_lib, train as train_lib  # noqa: E402
from gof_tpu.model import gaussians as gm  # noqa: E402
from gof_tpu.ops import quadrics  # noqa: E402

N = 1_000_000
rng = np.random.default_rng(1)
params, gstate = make_state(N, rng, sigma=-4.3)
cam = jax.tree.map(np.asarray, cameras.look_at_camera(
    eye=(0, 0, 0), target=(0, 0, 5.0), width=1237, height=822))
opt = config_lib.OptimizationParams()
tx = train_lib.make_optimizer(opt, 5.0)
tp0 = train_lib.TrainParams(gauss=params, app_net=None, app_emb=None)
opt_state0 = tx.init(tp0)


def t(name, fn, args_list, scalar_of, reps=10):
    f = jax.jit(fn)
    o = f(*args_list[0])
    _ = np.asarray(scalar_of(o))
    t0 = time.perf_counter()
    for i in range(2):
        o = f(*args_list[i % 3])
    _ = np.asarray(scalar_of(o))
    d2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(reps):
        o = f(*args_list[i % 3])
    _ = np.asarray(scalar_of(o))
    d10 = time.perf_counter() - t0
    print(f"{name:52s} {(d10-d2)/(reps-2)*1e3:8.2f} ms", flush=True)


gs = [params._replace(opacity=params.opacity * s) for s in (1.0, 0.999, 1.001)]


def pre_fwd_bwd(g):
    def f(g):
        scales_f = gm.filtered_scaling(g, gstate.filter_3d)
        opac_f = gm.filtered_opacity(g, gstate.filter_3d)
        shs = train_lib.masked_shs(g, jnp.int32(3), 3)
        pre = quadrics.preprocess(g.xyz, scales_f, g.rotation, shs, 3, cam,
                                  0.1, active_mask=gstate.active,
                                  opacities=opac_f)
        # pretend cotangents on the kernel-facing outputs
        return (jnp.sum(pre.rgb) + jnp.sum(pre.v2g_M) + jnp.sum(pre.v2g_u0)
                + jnp.sum(pre.mean2d) + jnp.sum(opac_f * pre.coef))

    return jax.grad(f)(g).xyz


t("preprocess fwd+VJP (full chain)", pre_fwd_bwd, [(g,) for g in gs],
  lambda o: o[0, 0])


def quad_chain(g):
    # (Sigma, b, uu) -> (M, u0) chain as in _raster_bwd
    scales_f = gm.filtered_scaling(g, gstate.filter_3d)
    v2g = quadrics.view_to_gaussian(g.xyz, scales_f, g.rotation,
                                    cam.world_view)
    M, u0 = v2g.M, v2g.u0
    per_g = jnp.ones((N, 16), jnp.float32) * g.opacity[:, None] * 1e-3
    sp = [per_g[:, 4 + i] for i in range(6)]
    db = [per_g[:, 10 + i] for i in range(3)]
    duu = per_g[:, 13]
    H = ((2.0 * sp[0], sp[1], sp[2]), (sp[1], 2.0 * sp[3], sp[4]),
         (sp[2], sp[4], 2.0 * sp[5]))
    Mc = [[M[:, a, k] for k in range(3)] for a in range(3)]
    dM = jnp.stack([jnp.stack(
        [Mc[a][0] * H[0][b] + Mc[a][1] * H[1][b] + Mc[a][2] * H[2][b]
         + u0[:, a] * db[b] for b in range(3)], -1) for a in range(3)], -2)
    du0 = jnp.stack([Mc[a][0] * db[0] + Mc[a][1] * db[1] + Mc[a][2] * db[2]
                     + 2.0 * duu * u0[:, a] for a in range(3)], -1)
    return dM.sum() + du0.sum()


t("quadric chain (Sigma,b,uu)->(M,u0) alone", quad_chain,
  [(g,) for g in gs], lambda o: o)


def adam_only(g):
    tp = train_lib.TrainParams(gauss=g, app_net=None, app_emb=None)
    grads = jax.tree.map(lambda x: x * 1e-6, tp)
    upd, st = tx.update(grads, opt_state0, tp)
    tp = optax.apply_updates(tp, upd)
    return tp.gauss.xyz


t("fused Adam update + apply", adam_only, [(g,) for g in gs],
  lambda o: o[0, 0])


def adam_gated(g):
    tp = train_lib.TrainParams(gauss=g, app_net=None, app_emb=None)
    grads = jax.tree.map(lambda x: x * 1e-6, tp)
    upd, st = tx.update(grads, opt_state0, tp)
    tp2 = optax.apply_updates(tp, upd)
    ov = g.opacity[0] > 1e9
    gate = lambda a, b: jax.tree.map(
        lambda x, y: jnp.where(ov, x, y) if hasattr(y, "dtype") else y, a, b)
    tp3 = gate(tp, tp2)
    st3 = gate(opt_state0, st)
    return tp3.gauss.xyz + st3.mu_flat[:3].T


t("fused Adam + overflow gate", adam_gated, [(g,) for g in gs],
  lambda o: o[0, 0])
