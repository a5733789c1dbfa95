"""Sharding tests on the 8-virtual-device CPU mesh (SURVEY.md §2.3).

Every test drives PRODUCTION code paths: the real train step
(train.build_train_step with dp>1), the real mesh-extraction field
evaluator (mesh.extract.FieldEvaluator with a mesh), and the real scene
stepper — not toy lambdas.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gof_tpu import cameras, config as config_lib, train as train_lib
from gof_tpu.model import appearance as app_lib
from gof_tpu.model import gaussians as gm
from gof_tpu.parallel import sharding


@pytest.fixture(scope="module")
def mesh8():
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    return sharding.make_mesh(8)


@pytest.fixture(scope="module")
def mesh4():
    if jax.device_count() < 4:
        pytest.skip("needs 4 devices")
    return sharding.make_mesh(4)


def _tiny_setup(n=256, size=48, capacity=1 << 12, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n // 2, 3)).astype(np.float32) * 0.5
    cols = rng.random((n // 2, 3)).astype(np.float32)
    gauss, gstate = gm.init_from_points(pts, cols, sh_degree=1, capacity=n)
    app_net, app_emb = app_lib.init_appearance(jax.random.PRNGKey(0))
    tp = train_lib.TrainParams(gauss=gauss, app_net=app_net, app_emb=app_emb)
    opt_cfg = config_lib.OptimizationParams()
    model_cfg = config_lib.ModelParams(sh_degree=1, kernel_size=0.1)
    pipe = config_lib.PipelineParams(backend="pallas", key_capacity=capacity)
    tx = train_lib.make_optimizer(opt_cfg, 1.0)
    opt_state = jax.tree.map(lambda x: jnp.array(np.asarray(x)), tx.init(tp))
    cams = [
        cameras.look_at_camera(
            eye=(3.0 * np.sin(t), 0.8, 3.0 * np.cos(t)), target=(0, 0, 0),
            width=size, height=size, uid=i,
        )
        for i, t in enumerate(np.linspace(0, 2 * np.pi, 8, endpoint=False))
    ]
    gts = jnp.asarray(rng.random((8, 3, size, size)), jnp.float32)
    return tp, opt_state, gstate, opt_cfg, model_cfg, pipe, tx, cams, gts


class TestDataParallel:
    @pytest.mark.slow
    def test_dp_train_step_runs(self, mesh8):
        """One PRODUCTION camera-batch DP step over 8 devices (the
        __graft_entry__ dryrun path): finite loss, params move, no
        overflow."""
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_dp_identical_views_match_single_chip(self, mesh4):
        """DP over 4 copies of the SAME view must reproduce the single-chip
        update (pmean of identical grads) and 4x its stat deltas."""
        tp, opt_state, gstate, opt_cfg, model_cfg, pipe, tx, cams, gts = _tiny_setup()
        bg = jnp.zeros(3)
        step = jnp.asarray(3, jnp.int32)

        single = train_lib.build_train_step(
            opt_cfg, model_cfg, pipe, tx, interpret=True)
        tp1 = jax.tree.map(jnp.copy, tp)
        tp1, opt1, gs1, m1 = single(tp1, opt_state, gstate, gts[0], step,
                                    cams[0], bg)

        dp_step = train_lib.build_train_step(
            opt_cfg, model_cfg, pipe, tx, interpret=True, dp=4, mesh=mesh4)
        cam_b = jax.tree.map(lambda *xs: jnp.stack(xs), *([cams[0]] * 4))
        gt_b = jnp.stack([gts[0]] * 4)
        tp4 = jax.tree.map(jnp.copy, tp)
        tp4, opt4, gs4, m4 = dp_step(tp4, opt_state, gstate, gt_b, step,
                                     cam_b, bg)

        np.testing.assert_allclose(float(m4["loss"]), float(m1["loss"]), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(tp4.gauss.xyz), np.asarray(tp1.gauss.xyz),
            rtol=1e-4, atol=1e-7)
        # stats: 4 views' contributions summed (as if 4 reference iterations)
        np.testing.assert_allclose(
            np.asarray(gs4.denom), 4.0 * np.asarray(gs1.denom), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(gs4.grad_accum), 4.0 * np.asarray(gs1.grad_accum),
            rtol=1e-4, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(gs4.max_radii2d), np.asarray(gs1.max_radii2d),
            rtol=1e-5)

    def test_dp_distinct_views_finite_and_moves(self, mesh4):
        """DP over 4 DIFFERENT views: finite loss, params move, metrics
        reduced sanely (num_keys is the max over devices)."""
        tp, opt_state, gstate, opt_cfg, model_cfg, pipe, tx, cams, gts = _tiny_setup()
        bg = jnp.zeros(3)
        dp_step = train_lib.build_train_step(
            opt_cfg, model_cfg, pipe, tx, interpret=True, dp=4, mesh=mesh4)
        cam_b = jax.tree.map(lambda *xs: jnp.stack(xs), *cams[:4])
        gt_b = gts[:4]
        xyz0 = np.asarray(tp.gauss.xyz)
        tp, opt_state, gstate, m = dp_step(
            tp, opt_state, gstate, gt_b, jnp.asarray(1, jnp.int32), cam_b, bg)
        assert np.isfinite(float(m["loss"]))
        assert not bool(m["key_overflow"])
        assert float(np.abs(np.asarray(tp.gauss.xyz) - xyz0).max()) > 0
        assert int(m["num_keys"]) > 0

    @pytest.mark.slow
    def test_dp_lr_scaling_tracks_single_camera_sgd(self, mesh4):
        """SEMANTICS, not mechanics (SURVEY §2.3 caveat): dp-camera batching
        changes SGD; with LRs scaled by ~sqrt(dp) the half-length dp=2 run
        must reach the dp=1 eval loss (measured on the renderable toy scene:
        dp=2 @ lr x1.41 -> 0.00631 vs dp=1 -> 0.00641; lr x1 lags at
        0.00726 — scripts/dp_semantics_study.py)."""
        import dataclasses

        from gof_tpu.ops import render as render_lib
        from gof_tpu.parallel import sharding as shard_lib

        mesh2 = shard_lib.make_mesh(2)
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(128, 3)).astype(np.float32) * 0.5
        cols = rng.random((128, 3)).astype(np.float32)
        gauss, gstate = gm.init_from_points(pts, cols, sh_degree=1, capacity=256)
        cams = [cameras.look_at_camera(
            eye=(3.0 * np.sin(t), 0.8, 3.0 * np.cos(t)), target=(0, 0, 0),
            width=48, height=48, uid=i)
            for i, t in enumerate(np.linspace(0, 2 * np.pi, 8, endpoint=False))]
        model_cfg = config_lib.ModelParams(sh_degree=1, kernel_size=0.1)
        pipe = config_lib.PipelineParams(backend="pallas", key_capacity=1 << 12)
        tgt = gauss._replace(
            features_dc=gauss.features_dc + 0.6 * rng.standard_normal(
                gauss.features_dc.shape).astype(np.float32))

        def render_view(g, cam):
            out = render_lib.render(
                cam, g.xyz, gm.filtered_scaling(g, gstate.filter_3d),
                g.rotation, gm.filtered_opacity(g, gstate.filter_3d),
                gm.get_features(g), 1, 0.1, jnp.zeros(3),
                active_mask=gstate.active, capacity=1 << 12,
                backend="pallas", interpret=True)
            return out.image[:3]

        gts = jnp.stack([render_view(tgt, c) for c in cams])

        def run(dp, n_steps, lr_mult, mesh=None):
            opt = config_lib.OptimizationParams()
            opt = dataclasses.replace(
                opt,
                position_lr_init=opt.position_lr_init * lr_mult,
                position_lr_final=opt.position_lr_final * lr_mult,
                feature_lr=opt.feature_lr * lr_mult,
                scaling_lr=opt.scaling_lr * lr_mult,
                rotation_lr=opt.rotation_lr * lr_mult,
                opacity_lr=opt.opacity_lr * lr_mult)
            tx = train_lib.make_optimizer(opt, 1.0)
            app_net, app_emb = app_lib.init_appearance(jax.random.PRNGKey(0))
            tp = train_lib.TrainParams(gauss=jax.tree.map(jnp.copy, gauss),
                                       app_net=app_net, app_emb=app_emb)
            opt_state = jax.tree.map(lambda x: jnp.array(np.asarray(x)),
                                     tx.init(tp))
            step_fn = train_lib.build_train_step(
                opt, model_cfg, pipe, tx, interpret=True, dp=dp, mesh=mesh)
            order = np.concatenate([np.random.default_rng(42).permutation(8)
                                    for _ in range(n_steps * dp // 8 + 1)])
            gs = gstate
            for i in range(n_steps):
                ids = order[i * dp:(i + 1) * dp]
                if dp == 1:
                    cam, gt = cams[ids[0]], gts[ids[0]]
                else:
                    cam = jax.tree.map(lambda *xs: jnp.stack(xs),
                                       *[cams[j] for j in ids])
                    gt = jnp.stack([gts[j] for j in ids])
                tp, opt_state, gs, _ = step_fn(
                    tp, opt_state, gs, gt, jnp.asarray(i, jnp.int32), cam,
                    jnp.zeros(3))
            l1j = jax.jit(lambda g, cam, gt: jnp.mean(
                jnp.abs(render_view(g, cam) - gt)))
            return float(np.mean([float(l1j(tp.gauss, cams[j], gts[j]))
                                  for j in range(8)]))

        n = 16
        l_dp1 = run(1, 2 * n, 1.0)
        l_dp2 = run(2, n, 1.41, mesh=mesh2)
        l0 = run(1, 0, 1.0)
        assert l_dp1 < 0.6 * l0  # dp=1 actually trains
        assert l_dp2 < 0.6 * l0  # dp=2 trains too
        # sqrt(dp)-scaled half-length dp run tracks the dp=1 trajectory
        assert l_dp2 < l_dp1 * 1.25, (l_dp2, l_dp1)

    def test_dp_overflow_gate_skips_update(self, mesh4):
        """If ANY device overflows its key capacity the whole update is a
        no-op (params, optimizer state, and stats unchanged)."""
        tp, opt_state, gstate, opt_cfg, model_cfg, pipe, tx, cams, gts = _tiny_setup()
        pipe.key_capacity = 128  # guaranteed overflow
        bg = jnp.zeros(3)
        dp_step = train_lib.build_train_step(
            opt_cfg, model_cfg, pipe, tx, interpret=True, dp=4, mesh=mesh4)
        cam_b = jax.tree.map(lambda *xs: jnp.stack(xs), *cams[:4])
        xyz0 = np.asarray(tp.gauss.xyz)
        tp, opt_state, gstate, m = dp_step(
            tp, opt_state, gstate, gts[:4], jnp.asarray(1, jnp.int32), cam_b, bg)
        assert bool(m["key_overflow"])
        np.testing.assert_array_equal(np.asarray(tp.gauss.xyz), xyz0)
        assert float(np.asarray(gstate.denom).max()) == 0.0


class TestSceneParallel:
    def test_scene_parallel_real_step(self, mesh8):
        """Share-nothing multi-scene training with the REAL single-chip train
        step: 8 stacked scenes advance independently; device 0's result
        equals running its scene alone."""
        bg = jnp.zeros(3)
        step = jnp.asarray(1, jnp.int32)
        setups = [_tiny_setup(seed=s) for s in range(2)]
        # one shared step fn (same static config for every scene)
        tp0, opt0, gs0, opt_cfg, model_cfg, pipe, tx, cams, gts = setups[0]
        single = train_lib.build_train_step(
            opt_cfg, model_cfg, pipe, tx, interpret=True)

        def scene_step(tp, opt_state, gstate, gt, camera):
            tp, opt_state, gstate, m = single(tp, opt_state, gstate, gt, step,
                                              camera, bg)
            return tp, opt_state, gstate, m["loss"]

        # stack 8 scenes: seeds 0,1 alternating
        tps, opts, gss, gtss, camss = [], [], [], [], []
        for i in range(8):
            t, o, g, *_cfg, cams_i, gts_i = setups[i % 2]
            tps.append(jax.tree.map(jnp.copy, t))
            opts.append(jax.tree.map(jnp.copy, o))
            gss.append(g)
            gtss.append(gts_i[i % 8])
            camss.append(cams_i[i % 8])
        stack = lambda xs: jax.tree.map(lambda *ls: jnp.stack(ls), *xs)
        par = sharding.build_scene_parallel_step(scene_step, mesh8)
        tp_s, opt_s, gs_s, losses = par(
            stack(tps), stack(opts), stack(gss), jnp.stack(gtss), stack(camss))

        assert np.isfinite(np.asarray(losses)).all()
        # scene 0 alone must match its slice of the parallel run
        t0 = jax.tree.map(jnp.copy, setups[0][0])
        t0, _, _, loss0 = scene_step(t0, setups[0][1], setups[0][2],
                                     gtss[0], camss[0])
        np.testing.assert_allclose(float(losses[0]), float(loss0), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(tp_s.gauss.xyz[0]), np.asarray(t0.gauss.xyz),
            rtol=1e-5, atol=1e-7)


class TestShardedFieldEval:
    def test_field_eval_matches_unsharded(self, mesh8):
        """mesh.extract.FieldEvaluator with a mesh: point-sharded opacity
        field equals the unsharded evaluation (production extract path)."""
        from gof_tpu.mesh import extract as extract_lib

        rng = np.random.default_rng(0)
        n = 128
        pts3d = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
        cols = rng.random((n, 3)).astype(np.float32)
        gauss, gstate = gm.init_from_points(pts3d, cols, sh_degree=0,
                                            capacity=n)
        cams = [
            cameras.look_at_camera(
                eye=(2.5 * np.sin(t), 0.5, 2.5 * np.cos(t)), target=(0, 0, 0),
                width=48, height=48, uid=i,
            )
            for i, t in enumerate(np.linspace(0, np.pi, 2))
        ]
        # query points NOT a multiple of 8: exercises the far-point padding
        q = rng.normal(size=(101, 3)).astype(np.float32) * 0.5

        ev0 = extract_lib.FieldEvaluator(
            gauss, gstate, cams, 0, 0.1, 1 << 12, interpret=True)
        a0 = ev0.alpha(q)
        ev8 = extract_lib.FieldEvaluator(
            gauss, gstate, cams, 0, 0.1, 1 << 12, interpret=True, mesh=mesh8)
        a8 = ev8.alpha(q)
        assert a8.shape == a0.shape == (101,)
        np.testing.assert_allclose(a8, a0, rtol=1e-5, atol=1e-6)
