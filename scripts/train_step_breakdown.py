"""Top-down breakdown of the full train step at bench scale: swap the loss
term to isolate SSIM / L1 / regularizer / optimizer costs."""
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
from gof_tpu.ops import render as render_lib  # noqa: E402
from gof_tpu.utils import losses  # noqa: E402

N = 100_000
W, H = 1237, 822
CAP = 1_638_400
REPS = 30

rng = np.random.default_rng(1)
params, gstate = make_state(N, rng)
cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0), width=W, height=H)
gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
bg = jnp.zeros(3)
opt = config_lib.OptimizationParams()
tx = train_lib.make_optimizer(opt, 5.0)


def run(name, loss_mode, with_reg=False, do_opt=True):
    @jax.jit
    def step(gauss, opt_state, step_i):
        tp = train_lib.TrainParams(gauss=gauss, app_net=None, app_emb=None)

        def loss_fn(tp, carrier):
            g = tp.gauss
            scales_f = gm.filtered_scaling(g, gstate.filter_3d)
            opac_f = gm.filtered_opacity(g, gstate.filter_3d)
            shs = gm.get_features(g)
            out = render_lib.render(
                cam, g.xyz, scales_f, g.rotation, opac_f, shs, 3, 0.1, bg,
                carrier=carrier, active_mask=gstate.active, capacity=CAP,
                backend="pallas", with_stats=True, with_reg=with_reg,
                compact_capacity=327680)
            image = out.image[:3]
            if loss_mode == "sum":
                return jnp.sum(image), out
            if loss_mode == "l1":
                return losses.l1_loss(image, gt), out
            l1 = losses.l1_loss(image, gt)
            ssim_val = losses.ssim(image, gt)
            loss = 0.8 * l1 + 0.2 * (1 - ssim_val)
            if loss_mode == "full_reg":
                loss = loss + 100.0 * jnp.mean(out.image[8])
                depth = out.image[6]
                d2n = train_lib.depth_to_normal(cam, depth)
                rn = out.image[3:6]
                rn = rn * jax.lax.rsqrt(jnp.sum(rn * rn, axis=0, keepdims=True) + 1e-12)
                rn_world = jnp.einsum("ij,jhw->ihw", cam.world_view[:3, :3].T, rn)
                loss = loss + 0.05 * jnp.mean(1.0 - jnp.sum(rn_world * d2n, axis=0))
            return loss, out

        carrier0 = jnp.zeros((gauss.xyz.shape[0], 3), jnp.float32)
        (loss, out), (grads, cgrad) = jax.value_and_grad(
            lambda tp, c: loss_fn(tp, c), argnums=(0, 1), has_aux=True)(tp, carrier0)
        if do_opt:
            updates, opt_state = tx.update(grads, opt_state, tp)
            tp = optax.apply_updates(tp, updates)
        return tp.gauss, opt_state, loss + jnp.sum(cgrad[0])

    tp0 = train_lib.TrainParams(gauss=params, app_net=None, app_emb=None)
    s0 = tx.init(tp0)
    s0 = jax.tree.map(lambda x: jnp.array(np.asarray(x)), s0)
    g = jax.tree.map(jnp.copy, params)
    step_i = jnp.int32(5000)
    g, s, l = step(g, s0, step_i)
    jax.block_until_ready(l)
    t0 = time.perf_counter()
    for _ in range(REPS):
        g, s, l = step(g, s, step_i)
    jax.block_until_ready(l)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:46s} {dt*1e3:8.1f} ms")
    sys.stdout.flush()
    return dt


run("loss=sum(image), no optimizer", "sum", do_opt=False)
run("loss=sum(image), +Adam", "sum")
run("loss=L1, +Adam", "l1")
run("loss=L1+SSIM, +Adam (densify phase)", "full")
run("loss=L1+SSIM+dist+normal, +Adam (reg phase)", "full_reg", with_reg=True)


def run_grads_only(name, with_reg=False):
    @jax.jit
    def step(gauss, step_i):
        tp = train_lib.TrainParams(gauss=gauss, app_net=None, app_emb=None)

        def loss_fn(tp, carrier):
            g = tp.gauss
            scales_f = gm.filtered_scaling(g, gstate.filter_3d)
            opac_f = gm.filtered_opacity(g, gstate.filter_3d)
            shs = gm.get_features(g)
            out = render_lib.render(
                cam, g.xyz, scales_f, g.rotation, opac_f, shs, 3, 0.1, bg,
                carrier=carrier, active_mask=gstate.active, capacity=CAP,
                backend="pallas", with_stats=True, with_reg=with_reg,
                compact_capacity=327680)
            return jnp.sum(out.image[:3]), out

        carrier0 = jnp.zeros((gauss.xyz.shape[0], 3), jnp.float32)
        (loss, out), (grads, cgrad) = jax.value_and_grad(
            lambda tp, c: loss_fn(tp, c), argnums=(0, 1), has_aux=True)(tp, carrier0)
        gsum = sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(grads))
        return loss + gsum + jnp.sum(cgrad[0])

    g = jax.tree.map(jnp.copy, params)
    step_i = jnp.int32(5000)
    l = step(g, step_i)
    jax.block_until_ready(l)
    t0 = time.perf_counter()
    for _ in range(REPS):
        l = step(g, step_i)
    jax.block_until_ready(l)
    print(f"{name:46s} {(time.perf_counter()-t0)/REPS*1e3:8.1f} ms")
    sys.stdout.flush()


run_grads_only("loss=sum, param grads materialized, no opt")
