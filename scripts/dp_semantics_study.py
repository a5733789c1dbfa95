"""DP semantics study (VERDICT r3 #4): does dp-camera batching with a
scaled LR track 1-camera SGD?

Trains the tiny renderable scene (GT = renders of a target gaussian set)
three ways on the virtual CPU mesh and reports the eval-loss trajectories:
  - dp=1, 2N steps (the reference semantics, train.py:135-141)
  - dp=2, N steps, lr x1
  - dp=2, N steps, lr x2
"""
import dataclasses
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
import _path  # noqa: F401,E402  (repo-root bootstrap)

import jax.numpy as jnp
import numpy as np

from gof_tpu import cameras, config as config_lib, train as train_lib
from gof_tpu.model import appearance as app_lib
from gof_tpu.model import gaussians as gm
from gof_tpu.ops import render as render_lib
from gof_tpu.parallel import sharding
from gof_tpu.utils import losses

SIZE = 48
CAP = 1 << 12
N_VIEWS = 8


def setup(seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(128, 3)).astype(np.float32) * 0.5
    cols = rng.random((128, 3)).astype(np.float32)
    gauss, gstate = gm.init_from_points(pts, cols, sh_degree=1, capacity=256)
    cams = [cameras.look_at_camera(
        eye=(3.0 * np.sin(t), 0.8, 3.0 * np.cos(t)), target=(0, 0, 0),
        width=SIZE, height=SIZE, uid=i)
        for i, t in enumerate(np.linspace(0, 2 * np.pi, N_VIEWS, endpoint=False))]
    # target = renders of a color/position-perturbed copy (a realistic,
    # attainable target, unlike random-noise GTs)
    tgt = gauss._replace(
        features_dc=gauss.features_dc + 0.6 * rng.standard_normal(
            gauss.features_dc.shape).astype(np.float32),
        xyz=gauss.xyz + 0.05 * rng.standard_normal(
            gauss.xyz.shape).astype(np.float32))
    model_cfg = config_lib.ModelParams(sh_degree=1, kernel_size=0.1)
    pipe = config_lib.PipelineParams(backend="pallas", key_capacity=CAP)

    def render_gt(cam):
        scales_f = gm.filtered_scaling(tgt, gstate.filter_3d)
        opac_f = gm.filtered_opacity(tgt, gstate.filter_3d)
        shs = gm.get_features(tgt)
        out = render_lib.render(cam, tgt.xyz, scales_f, tgt.rotation, opac_f,
                                shs, 1, 0.1, jnp.zeros(3),
                                active_mask=gstate.active, capacity=CAP,
                                backend="pallas", interpret=True)
        return out.image[:3]

    gts = jnp.stack([render_gt(c) for c in cams])
    return gauss, gstate, cams, gts, model_cfg, pipe


def run(dp, n_steps, lr_mult, gauss, gstate, cams, gts, model_cfg, pipe,
        mesh=None):
    opt = config_lib.OptimizationParams()
    if lr_mult != 1.0:
        opt = dataclasses.replace(
            opt,
            position_lr_init=opt.position_lr_init * lr_mult,
            position_lr_final=opt.position_lr_final * lr_mult,
            feature_lr=opt.feature_lr * lr_mult,
            scaling_lr=opt.scaling_lr * lr_mult,
            rotation_lr=opt.rotation_lr * lr_mult,
            opacity_lr=opt.opacity_lr * lr_mult,
        )
    tx = train_lib.make_optimizer(opt, 1.0)
    app_net, app_emb = app_lib.init_appearance(jax.random.PRNGKey(0))
    tp = train_lib.TrainParams(gauss=jax.tree.map(jnp.copy, gauss),
                               app_net=app_net, app_emb=app_emb)
    opt_state = jax.tree.map(lambda x: jnp.array(np.asarray(x)), tx.init(tp))
    step_fn = train_lib.build_train_step(
        opt, model_cfg, pipe, tx, interpret=True, dp=dp, mesh=mesh)
    bg = jnp.zeros(3)
    order = []
    rng = np.random.default_rng(42)
    while len(order) < n_steps * dp:
        deck = rng.permutation(N_VIEWS).tolist()
        order += deck
    gs = gstate
    for i in range(n_steps):
        ids = order[i * dp:(i + 1) * dp]
        if dp == 1:
            cam, gt = cams[ids[0]], gts[ids[0]]
        else:
            cam = jax.tree.map(lambda *xs: jnp.stack(xs), *[cams[j] for j in ids])
            gt = jnp.stack([gts[j] for j in ids])
        tp, opt_state, gs, m = step_fn(tp, opt_state, gs, gt,
                                       jnp.asarray(i, jnp.int32), cam, bg)
    # eval loss over all views (single-view renders)
    evals = []
    eval_step = train_lib.build_train_step(
        config_lib.OptimizationParams(), model_cfg, pipe,
        train_lib.make_optimizer(config_lib.OptimizationParams(), 1.0),
        interpret=True)
    for j in range(N_VIEWS):
        _, _, _, m = eval_step(jax.tree.map(jnp.copy, tp), opt_state, gs,
                               gts[j], jnp.asarray(0, jnp.int32), cams[j], bg)
        evals.append(float(m["l1"]))
    return float(np.mean(evals))


def main():
    mesh2 = sharding.make_mesh(2)
    gauss, gstate, cams, gts, model_cfg, pipe = setup()
    # initial loss
    l0 = run(1, 0, 1.0, gauss, gstate, cams, gts, model_cfg, pipe)
    print(f"initial eval L1: {l0:.5f}", flush=True)
    N = 32
    l_dp1 = run(1, 2 * N, 1.0, gauss, gstate, cams, gts, model_cfg, pipe)
    print(f"dp=1, {2*N} steps, lr x1: {l_dp1:.5f}", flush=True)
    for mult in (1.0, 1.41, 2.0):
        l_dp2 = run(2, N, mult, gauss, gstate, cams, gts, model_cfg, pipe,
                    mesh=mesh2)
        print(f"dp=2, {N} steps, lr x{mult}: {l_dp2:.5f}", flush=True)


if __name__ == "__main__":
    main()
