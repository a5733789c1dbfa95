"""Scaling probe for the P-sized (per-gaussian) stages: preprocess fwd/bwd,
Adam update, SSIM, depth_to_normal regs. Linear-in-P => real work;
flat-in-P => fixed overhead worth hunting."""
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
from gof_tpu.utils import losses  # noqa: E402

W, H = 1237, 822
cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0), width=W, height=H)
opt = config_lib.OptimizationParams()
tx = train_lib.make_optimizer(opt, 5.0)


def timed(name, fn, *args, reps=30):
    # Separate async dispatches, one block at the end: the tunnel pipelines
    # the queue, so the ~30 ms dispatch RTT is paid once, not per rep.
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms")
    sys.stdout.flush()


for N in (100_000, 400_000):
    rng = np.random.default_rng(1)
    params, gstate = make_state(N, rng)
    scales_f = gm.filtered_scaling(params, gstate.filter_3d)
    opac_f = gm.filtered_opacity(params, gstate.filter_3d)
    shs = gm.get_features(params)

    def pre_fn(xyz):
        pre = quadrics.preprocess(xyz, scales_f, params.rotation, shs, 3, cam,
                                  0.1, opacities=opac_f)
        return pre.mean2d, pre.v2g_M, pre.rgb, pre.depth

    timed(f"preprocess fwd        N={N}", pre_fn, params.xyz)

    def pre_bwd(xyz):
        def loss(x):
            pre = quadrics.preprocess(x, scales_f, params.rotation, shs, 3, cam,
                                      0.1, opacities=opac_f)
            return (jnp.sum(pre.mean2d) + jnp.sum(pre.v2g_M) + jnp.sum(pre.rgb)
                    + jnp.sum(pre.v2g_u0))
        return jax.grad(loss)(xyz)

    timed(f"preprocess fwd+bwd    N={N}", pre_bwd, params.xyz)

    tp0 = train_lib.TrainParams(gauss=params, app_net=None, app_emb=None)
    s0 = tx.init(tp0)
    s0 = jax.tree.map(lambda x: jnp.array(np.asarray(x)), s0)
    grads = jax.tree.map(jnp.ones_like, tp0)

    def adam_fn(tp, s):
        up, s2 = tx.update(grads, s, tp)
        return optax.apply_updates(tp, up), s2

    timed(f"adam update           N={N}", adam_fn, tp0, s0)

rng = np.random.default_rng(1)
img = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
timed("ssim fwd+bwd", lambda a: jax.grad(lambda x: losses.ssim(x, gt))(a), img)

depth = jnp.asarray(rng.uniform(1, 10, (H, W)), jnp.float32)


def reg_fn(d):
    def loss(dd):
        d2n = train_lib.depth_to_normal(cam, dd)
        return jnp.sum(d2n * d2n)
    return jax.grad(loss)(d)


timed("depth_to_normal fwd+bwd", reg_fn, depth)
