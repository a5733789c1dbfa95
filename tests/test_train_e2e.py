"""End-to-end training tests on a tiny oracle-rendered synthetic scene."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gof_tpu import config as config_lib
from gof_tpu import train as train_lib
from gof_tpu.data import scene as scene_lib
from gof_tpu.model import appearance as app_lib

from make_synthetic_scene import make_multiscale_scene, make_scene


@pytest.fixture(scope="module")
def synth_scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    make_scene(root, n_gaussians=16, n_views=8, size=64)
    return root


@pytest.fixture(scope="module")
def multiscale_scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ms"))
    make_multiscale_scene(root, n_gaussians=16, n_views=4, base_size=64,
                          n_scales=2)
    return root


class TestAppearanceNet:
    def test_shapes_and_range(self, rng):
        params, emb = app_lib.init_appearance(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.random((1, 2, 3, 3 + 64)), jnp.float32)
        out = app_lib.AppearanceNetwork().apply(params, x)
        assert out.shape == (1, 64, 96, 3)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_pixel_shuffle_matches_torch_semantics(self):
        import torch

        x = np.arange(1 * 2 * 2 * 8, dtype=np.float32).reshape(1, 8, 2, 2)  # NCHW
        want = torch.pixel_shuffle(torch.from_numpy(x), 2).numpy()  # [1, 2, 4, 4]
        got = app_lib.pixel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)  # NHWC
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want)

    @pytest.mark.slow

    def test_appearance_l1_zero_when_identity(self, rng):
        """If the multiplier were exactly 1 the loss equals plain L1; here we
        just check it runs, is finite and differentiable."""
        params, emb = app_lib.init_appearance(jax.random.PRNGKey(0))
        img = jnp.asarray(rng.random((3, 70, 95)), jnp.float32)
        gt = jnp.asarray(rng.random((3, 70, 95)), jnp.float32)

        def f(p, e):
            return app_lib.appearance_l1(img, gt, p, e, jnp.asarray(3))

        val, grads = jax.value_and_grad(f, argnums=(0, 1))(params, emb)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(grads[1]).sum())
        # only the used embedding row receives gradient
        g_emb = np.asarray(grads[1])
        assert np.abs(g_emb[3]).sum() > 0
        assert np.abs(g_emb[4]).sum() == 0


class TestTrainE2E:
    @pytest.mark.slow
    def test_convergence_xla_backend(self, synth_scene, tmp_path):
        """150 iterations on the synthetic scene must improve PSNR by > 4 dB
        (densification disabled; XLA reference backend on CPU)."""
        model_cfg = config_lib.ModelParams(
            source_path=synth_scene, model_path=str(tmp_path / "out"), sh_degree=1,
            kernel_size=0.1, eval=True,
        )
        pipe = config_lib.PipelineParams(backend="xla", key_capacity=512)
        opt = config_lib.OptimizationParams(
            iterations=100, densify_from_iter=10_000, densify_until_iter=0,
            opacity_reset_interval=100_000, distortion_from_iter=50, depth_normal_from_iter=50,
            lambda_distortion=10.0,
        )
        train_lib.training(model_cfg, opt, pipe, test_iterations={1, 100},
                           save_iterations={100}, checkpoint_iterations=set(), quiet=True)
        log = [json.loads(l) for l in open(os.path.join(model_cfg.model_path, "train_log.jsonl"))]
        evals = [r["eval"]["psnr"] for r in log if "eval" in r]
        assert len(evals) >= 2
        assert evals[-1] > evals[0] + 3.0, evals
        # snapshot written and loadable
        ply_path = os.path.join(model_cfg.model_path, "point_cloud", "iteration_100", "point_cloud.ply")
        p, s = scene_lib.load_gaussians_ply(ply_path, 1)
        assert int(np.asarray(s.active).sum()) > 0

    @pytest.mark.slow

    def test_pallas_interpret_with_densify(self, synth_scene, tmp_path):
        """Short pallas-backend run (interpret mode) exercising densification,
        opacity reset and the stats carrier; must stay finite."""
        model_cfg = config_lib.ModelParams(
            source_path=synth_scene, model_path=str(tmp_path / "out2"), sh_degree=1,
            kernel_size=0.1,
        )
        pipe = config_lib.PipelineParams(backend="pallas", key_capacity=512)
        opt = config_lib.OptimizationParams(
            iterations=30, densify_from_iter=9, densify_until_iter=30,
            densification_interval=10, opacity_reset_interval=25,
            distortion_from_iter=5, depth_normal_from_iter=5,
        )
        train_lib.training(model_cfg, opt, pipe, test_iterations=set(),
                           save_iterations=set(), checkpoint_iterations={30},
                           quiet=True, interpret=True)
        log = [json.loads(l) for l in open(os.path.join(model_cfg.model_path, "train_log.jsonl"))]
        final = [r for r in log if "loss" in r][-1]
        assert np.isfinite(final["loss"])
        # checkpoint exists and loads
        tp, opt_state, gstate, it = train_lib.load_checkpoint(
            os.path.join(model_cfg.model_path, "chkpnt30.pkl")
        )
        assert it == 30


class TestMultiResolution:
    @pytest.mark.slow
    def test_multires_scan_windows_with_liveness(self, multiscale_scene,
                                                 tmp_path):
        """A mixed-resolution scene (load_allres multi-scale) must keep
        scan windows (n_inner > 1) AND temporal liveness culling: cameras
        train in per-resolution groups, the live cache is indexed by
        global camera id with per-camera tile-grid slicing/padding
        (round-4 gap: mixed resolutions silently forced n_inner=1 and
        disabled liveness, train.py:597-598 then)."""
        model_cfg = config_lib.ModelParams(
            source_path=multiscale_scene, model_path=str(tmp_path / "ms"),
            sh_degree=1, kernel_size=0.1, load_allres=True,
        )
        pipe = config_lib.PipelineParams(backend="pallas", key_capacity=2048)
        # densify_until_iter=0 so liveness turns on right away (it waits
        # for densification to end); all cadences multiples of 10 so
        # n_inner stays 10
        opt = config_lib.OptimizationParams(
            iterations=60, densify_from_iter=10_000, densify_until_iter=0,
            opacity_reset_interval=100_000, distortion_from_iter=20,
            depth_normal_from_iter=20, lambda_distortion=10.0,
        )
        train_lib.training(model_cfg, opt, pipe, test_iterations=set(),
                           save_iterations=set(), checkpoint_iterations=set(),
                           quiet=False, interpret=True)
        log = [json.loads(l) for l in open(
            os.path.join(model_cfg.model_path, "train_log.jsonl"))]
        recs = [r for r in log if "loss" in r]
        assert recs[-1]["iter"] == 60
        assert np.isfinite(recs[-1]["loss"])
        # loss must actually improve (both resolution groups contribute)
        assert recs[-1]["loss"] < recs[0]["loss"]

    def test_multires_groups_visit_all_cameras(self, multiscale_scene,
                                               tmp_path, capsys):
        """Group scheduler sanity at the unit level: per-resolution groups
        partition the cameras and weights are proportional to group size."""
        from gof_tpu.data import scene as scene_lib

        sc = scene_lib.Scene(multiscale_scene, str(tmp_path / "m2"),
                             resolution=-1, load_allres=True)
        sizes = {}
        for c in sc.train_cameras:
            sizes.setdefault(sc._scaled_size(c), 0)
            sizes[sc._scaled_size(c)] += 1
        assert len(sizes) == 2, sizes
        # 4 views x [64, 32, 32, 32] cycle -> 4 at 64px, 12 at 32px
        assert sorted(sizes.values()) == [4, 12]


class TestDebugMode:
    @pytest.mark.slow
    def test_debug_dumps_on_nonfinite_loss(self, synth_scene, tmp_path):
        """--debug is the analog of the reference's fail-time snapshot dumps
        (dgr/__init__.py:89-96): corrupt one input, train, and the loop must
        abort with a FloatingPointError after writing a replayable npz of
        every render input."""
        import glob

        out = str(tmp_path / "dbg")
        model_cfg = config_lib.ModelParams(
            source_path=synth_scene, model_path=out, sh_degree=1,
            kernel_size=0.1,
        )
        pipe = config_lib.PipelineParams(backend="xla", key_capacity=512,
                                         debug=True)
        opt = config_lib.OptimizationParams(
            iterations=10, densify_from_iter=10_000, densify_until_iter=0,
            opacity_reset_interval=100_000, distortion_from_iter=5,
            depth_normal_from_iter=5,
        )
        train_lib.training(model_cfg, opt, pipe, test_iterations=set(),
                           save_iterations=set(), checkpoint_iterations={10},
                           quiet=True)
        ckpt = os.path.join(out, "chkpnt10.pkl")
        tp, opt_state, gstate, _ = train_lib.load_checkpoint(ckpt)
        # poison one SH-DC coefficient: rgb -> NaN -> image -> loss
        poisoned = tp._replace(gauss=tp.gauss._replace(
            features_dc=tp.gauss.features_dc.at[0].set(jnp.nan)))
        train_lib.save_checkpoint(out, 10, poisoned, opt_state, gstate)
        opt2 = config_lib.OptimizationParams(
            iterations=30, densify_from_iter=10_000, densify_until_iter=0,
            opacity_reset_interval=100_000, distortion_from_iter=5,
            depth_normal_from_iter=5,
        )
        with pytest.raises(FloatingPointError, match="snapshot_iter"):
            train_lib.training(model_cfg, opt2, pipe, test_iterations=set(),
                               save_iterations=set(),
                               checkpoint_iterations=set(), quiet=True,
                               start_checkpoint=ckpt)
        dumps = glob.glob(os.path.join(out, "debug", "snapshot_iter*.npz"))
        assert dumps, "debug snapshot not written"
        blob = np.load(dumps[0])
        assert "gauss_xyz" in blob and "packed_metrics" in blob
        assert not np.isfinite(blob["packed_metrics"][:, 0]).all()
        assert np.isnan(blob["gauss_features_dc"][0]).any()


class TestOverflowGating:
    def test_compact_overflow_gates_update(self, rng):
        """A step whose compact gradient buffer overflows must be a no-op:
        clamped gradient-row writes would otherwise train on partial
        gradients (train.py overflow gate; compact telemetry from the
        forward kernel's demand channels)."""
        import jax
        import jax.numpy as jnp

        from gof_tpu import cameras
        from gof_tpu.model import gaussians as gm
        from gof_tpu.sh import rgb_to_sh_dc

        n = 40
        z = rng.uniform(4, 7, n)
        xyz = np.stack([rng.uniform(-1, 1, n) * z * 0.2,
                        rng.uniform(-1, 1, n) * z * 0.2, z], -1)
        q = rng.normal(size=(n, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        params = gm.GaussianParams(
            xyz=jnp.asarray(xyz, jnp.float32),
            features_dc=rgb_to_sh_dc(jnp.asarray(rng.uniform(0, 1, (n, 3)),
                                                 jnp.float32))[:, None, :],
            features_rest=jnp.zeros((n, 3, 3), jnp.float32),
            scaling=jnp.asarray(np.log(rng.uniform(0.2, 0.5, (n, 3))), jnp.float32),
            rotation=jnp.asarray(q, jnp.float32),
            opacity=jnp.asarray(np.zeros(n), jnp.float32),
        )
        zf = jnp.zeros((n,), jnp.float32)
        gstate = gm.GaussianState(
            active=jnp.ones((n,), bool), filter_3d=zf + 1e-4, max_radii2d=zf,
            grad_accum=zf, grad_abs_accum=zf, denom=zf,
        )
        cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0),
                                     width=96, height=64)
        gt = jnp.asarray(rng.uniform(0, 1, (3, 64, 96)), jnp.float32)
        bg = jnp.zeros(3)
        opt = config_lib.OptimizationParams()
        model_cfg = config_lib.ModelParams(sh_degree=1, kernel_size=0.1)

        def run(compact_capacity):
            pipe = config_lib.PipelineParams(
                backend="pallas", key_capacity=4096,
                compact_capacity=compact_capacity)
            tx = train_lib.make_optimizer(opt, 5.0)
            tp0 = train_lib.TrainParams(gauss=jax.tree.map(jnp.copy, params),
                                        app_net=None, app_emb=None)
            s0 = tx.init(tp0)
            step = train_lib.build_train_step(opt, model_cfg, pipe, tx,
                                              interpret=True)
            tp, s, g, m = step(tp0, s0, gstate, gt, jnp.int32(100), cam, bg)
            return tp, m

        tp_ok, m_ok = run(0)  # safe capacity: update applies
        assert not bool(m_ok["compact_overflow"])
        assert float(jnp.abs(tp_ok.gauss.xyz - params.xyz).max()) > 0

        tp_of, m_of = run(128)  # absurdly small: overflow, step is a no-op
        assert bool(m_of["compact_overflow"])
        assert float(jnp.abs(tp_of.gauss.xyz - params.xyz).max()) == 0
