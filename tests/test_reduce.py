"""Sorted windowed-matmul gradient reduction (ops/reduce.py).

Semantics under test: reduce_rows_by_gid == segment_sum over [0, P) with the
sentinel id P dropped — the deterministic replacement for the reference's
atomicAdd accumulation (backward.cu:824-952). The Pallas kernel is exercised
in interpret mode on CPU; the TPU compile path is covered by kernel_bench /
the production step on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gof_tpu.ops import reduce as red


def _ref(rows_t, gids, P):
    return jax.ops.segment_sum(rows_t.T, gids, num_segments=P + 1)[:P].T


def _case(R, P, seed, clustered=False):
    rng = np.random.default_rng(seed)
    if clustered:
        ids = np.sort(rng.integers(0, P, R // 2))
        ids = np.concatenate([ids, rng.integers(0, P, R - len(ids))])
    else:
        ids = rng.integers(0, P + 1, R)  # includes sentinel P
    rng.shuffle(ids)
    rows = rng.normal(size=(16, R)).astype(np.float32)
    return jnp.asarray(rows), jnp.asarray(ids.astype(np.int32))


@pytest.mark.parametrize("R,P", [(2048, 100), (4096, 5000), (8192, 63)])
def test_sorted_reduce_matches_segment_sum(R, P):
    rows, ids = _case(R, P, seed=R + P)
    ids_sorted, perm = jax.lax.sort((ids, jnp.arange(R, dtype=jnp.int32)), num_keys=1)
    rows_sorted = rows.T[perm].T
    out = red.sorted_segment_reduce(rows_sorted, ids_sorted, P, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out[:, :P]), np.asarray(_ref(rows, ids, P)), rtol=1e-5, atol=1e-5
    )


def test_reduce_rows_by_gid_unsorted_and_sparse():
    # sparse ids (most gaussians receive nothing) spanning many windows
    R, P = 6144, 300_000
    rng = np.random.default_rng(0)
    ids = np.concatenate(
        [
            rng.integers(0, 50, R // 3),  # dense head
            rng.integers(P - 40, P, R // 3),  # dense tail
            rng.integers(0, P + 1, R - 2 * (R // 3)),  # sparse middle + sentinels
        ]
    ).astype(np.int32)
    rng.shuffle(ids)
    rows = jnp.asarray(rng.normal(size=(16, R)).astype(np.float32))
    ids_j = jnp.asarray(ids)
    ids_sorted, perm = jax.lax.sort((ids_j, jnp.arange(R, dtype=jnp.int32)), num_keys=1)
    rows_sorted = rows.T[perm].T
    out = red.sorted_segment_reduce(rows_sorted, ids_sorted, P, interpret=True)
    ref = _ref(rows, ids_j, P)
    np.testing.assert_allclose(np.asarray(out[:, :P]), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_reduce_all_sentinel():
    R, P = 2048, 777
    rows = jnp.asarray(np.random.default_rng(1).normal(size=(16, R)).astype(np.float32))
    ids = jnp.full((R,), P, jnp.int32)
    out = red.sorted_segment_reduce(rows, ids, P, interpret=True)
    assert float(jnp.abs(out[:, :P]).max()) == 0.0
