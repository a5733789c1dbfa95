"""What does the full late-scale step spend OUTSIDE the render stages?
Swap loss terms / optimizer on the real train step at N=1M, D2H-anchored."""
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

N = 1_000_000
W, H = 1237, 822
CAP = 4_128_768
COMPACT = 851_968
REPS = 8

rng = np.random.default_rng(1)
params, gstate = make_state(N, rng, sigma=-4.3)
cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0), width=W, height=H)
gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
bg = jnp.zeros(3)
opt = config_lib.OptimizationParams()
tx = train_lib.make_optimizer(opt, 5.0)


def run(name, loss_mode, with_reg=False, do_opt=True, with_stats=True):
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
                backend="pallas", with_stats=with_stats, with_reg=with_reg,
                compact_capacity=COMPACT)
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
    _ = float(np.asarray(l))

    def m(n):
        t0 = time.perf_counter()
        for _ in range(n):
            g2, s2, l = step(g, s, step_i)
        _ = float(np.asarray(l))
        return time.perf_counter() - t0

    m(1)
    d2 = m(2)
    d8 = m(REPS)
    dt = (d8 - d2) / (REPS - 2)
    print(f"{name:52s} {dt*1e3:8.1f} ms", flush=True)
    return dt


run("loss=sum, no Adam (render fwd+bwd core)", "sum", do_opt=False)
run("loss=sum, +Adam", "sum")
run("loss=L1+SSIM, +Adam (densify phase)", "full")
run("L1+SSIM+dist+normal, +Adam, reg, no stats", "full_reg", with_reg=True, with_stats=False)
