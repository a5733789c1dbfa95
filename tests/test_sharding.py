"""Sharding tests on the 8-virtual-device CPU mesh (SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gof_tpu.parallel import sharding


@pytest.fixture(scope="module")
def mesh8():
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    return sharding.make_mesh(8)


class TestSharding:
    @pytest.mark.slow
    def test_dp_train_step_runs(self, mesh8):
        """One camera-batch DP step over 8 devices (the __graft_entry__
        dryrun path): finite loss, params move, grads identical across
        devices (replicated after psum)."""
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_scene_parallel_independent(self, mesh8):
        """Share-nothing scene parallelism: per-device results equal running
        each scene alone."""

        def step(x, y):
            return x * 2 + y.sum()

        stacked = (jnp.arange(8.0).reshape(8, 1), jnp.ones((8, 4)))
        par = sharding.build_scene_parallel_step(step, mesh8)
        out = par(*stacked)
        want = np.stack([np.asarray(step(stacked[0][i], stacked[1][i])) for i in range(8)])
        np.testing.assert_allclose(np.asarray(out).reshape(8, -1), want.reshape(8, -1))

    def test_sharded_field_eval(self, mesh8):
        """Point-sharded evaluation matches the unsharded function."""

        def eval_fn(points, weights):
            return jnp.sum(points * weights[None, :], axis=-1)

        pts = jnp.asarray(np.random.default_rng(0).random((64, 3)), jnp.float32)
        w = jnp.asarray([1.0, 2.0, 3.0])
        run = sharding.sharded_min_transmittance(eval_fn, mesh8)
        got = run(pts, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(eval_fn(pts, w)), rtol=1e-6)
