"""Top-down ablation of the FULL train step at the late design point:
time the production step, then variants with components removed, to expose
costs the bottom-up stage timings miss (loss assembly, preprocess VJP,
optimizer, gating)."""
import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import _path  # noqa: F401,E402  (repo-root bootstrap)
from bench import make_state  # noqa: E402

from gof_tpu import cameras, config as config_lib, train as train_lib  # noqa: E402
from gof_tpu.model import gaussians as gm  # noqa: E402
from gof_tpu.ops import render as render_lib  # noqa: E402
from gof_tpu.utils import losses  # noqa: E402
from gof_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

ap = argparse.ArgumentParser()
ap.add_argument("--gaussians", type=int, default=1_000_000)
ap.add_argument("--capacity", type=int, default=3_670_016)
ap.add_argument("--compact-cap", type=int, default=458_752)
ap.add_argument("--sigma", type=float, default=-4.3)
ap.add_argument("--reps", type=int, default=10)
ap.add_argument("--only", type=str, default="",
                help="run only variants whose name contains this substring")
args = ap.parse_args()

N = args.gaussians
W, H = 1237, 822
CAP = args.capacity
CCAP = args.compact_cap
REPS = args.reps

rng = np.random.default_rng(1)
params, gstate = make_state(N, rng, sigma=args.sigma)
cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0), width=W, height=H)
gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
bg = jnp.zeros(3)
opt = config_lib.OptimizationParams()
tx = train_lib.make_optimizer(opt, 5.0)
tp0 = train_lib.TrainParams(gauss=params, app_net=None, app_emb=None)
opt_state0 = tx.init(tp0)


def run(name, with_stats, with_reg, loss_mode="full", do_opt=True,
        grad=True):
    if args.only and args.only not in name:
        return

    @jax.jit
    def step(gauss, opt_state, step_i):
        tp = train_lib.TrainParams(gauss=gauss, app_net=None, app_emb=None)

        def loss_fn(tp, carrier):
            g = tp.gauss
            scales_f = gm.filtered_scaling(g, gstate.filter_3d)
            opac_f = gm.filtered_opacity(g, gstate.filter_3d)
            shs = train_lib.masked_shs(g, jnp.int32(3), 3)
            out = render_lib.render(
                cam, g.xyz, scales_f, g.rotation, opac_f, shs, 3, 0.1, bg,
                carrier=carrier, active_mask=gstate.active, capacity=CAP,
                backend="pallas", with_stats=with_stats, with_reg=with_reg,
                compact_capacity=CCAP)
            image = out.image[:3]
            if loss_mode == "sum":
                return jnp.sum(out.image), out
            l1 = losses.l1_loss(image, gt)
            if loss_mode == "l1":
                return l1, out
            ssim_val = losses.ssim(image, gt)
            loss = 0.8 * l1 + 0.2 * (1.0 - ssim_val)
            if loss_mode == "full" and with_reg:
                depth = out.image[6]
                d2n = train_lib.depth_to_normal(cam, depth)
                rn = out.image[3:6]
                rn = rn * jax.lax.rsqrt(jnp.sum(rn * rn, 0, keepdims=True) + 1e-12)
                rnw = jnp.einsum("ij,jhw->ihw", cam.world_view[:3, :3].T, rn)
                loss = loss + 100.0 * jnp.mean(out.image[8]) \
                    + 0.05 * jnp.mean(1.0 - jnp.sum(rnw * d2n, 0))
            return loss, out

        carrier0 = jnp.zeros((gauss.xyz.shape[0], 3), jnp.float32)
        if grad:
            (loss, out), (grads, cg) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(tp, carrier0)
        else:
            loss, out = loss_fn(tp, carrier0)
            grads, cg = jax.tree.map(jnp.zeros_like, tp), carrier0
        if do_opt:
            upd, opt_state = tx.update(grads, opt_state, tp)
            import optax
            tp = optax.apply_updates(tp, upd)
        return tp.gauss, opt_state, loss

    g = jax.tree.map(jnp.copy, tp0.gauss)
    s = opt_state0
    g, s, loss = step(g, s, jnp.int32(20000))
    _ = np.asarray(loss)
    t0 = time.perf_counter()
    for i in range(2):
        g, s, loss = step(g, s, jnp.int32(20000 + i))
    _ = np.asarray(loss)
    d2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(REPS):
        g, s, loss = step(g, s, jnp.int32(20000 + i))
    _ = np.asarray(loss)
    d10 = time.perf_counter() - t0
    print(f"{name:52s} {(d10-d2)/(REPS-2)*1e3:8.1f} ms", flush=True)


run("reg phase FULL (prod)", False, True, "full", True)
run("reg  - no optimizer", False, True, "full", do_opt=False)
run("reg  - rgb loss only (no dist/normal terms)", False, True, "l1")
run("reg  - loss=sum(image) (no SSIM/L1)", False, True, "sum")
run("reg  - forward only (no grad)", False, True, "sum", do_opt=False,
    grad=False)
run("stats phase FULL (prod)", True, False, "full", True)
run("stats - loss=sum(image)", True, False, "sum")
run("stats - forward only", True, False, "sum", do_opt=False, grad=False)
