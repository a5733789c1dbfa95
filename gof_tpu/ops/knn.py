"""Mean squared distance to the 3 nearest neighbors (initial Gaussian scales).

Replacement for simple-knn (simple_knn.cu:45-183 / distCUDA2,
spatial.cu:14-26). Two implementations:

- `mean_sq_dist_3nn_exact`: host-side exact KD-tree (scipy). Used at model
  init (the only place the reference uses distCUDA2) — init is setup code
  outside jit, so a host computation is the right tool.
- `mean_sq_dist_3nn`: jit-compatible TPU approximation via Morton-code sort +
  windowed scan with multiple shifted grids (overestimates only; used where a
  device-side estimate is needed inside a compiled step).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def mean_sq_dist_3nn_exact(points: np.ndarray) -> np.ndarray:
    """Exact mean squared 3-NN distance (host, scipy cKDTree)."""
    from scipy.spatial import cKDTree

    pts = np.asarray(points, np.float64)
    tree = cKDTree(pts)
    d, _ = tree.query(pts, k=4)  # includes self at distance 0
    return (d[:, 1:] ** 2).mean(axis=1).astype(np.float32)


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so consecutive bits are 3 apart."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton_codes(points: jnp.ndarray) -> jnp.ndarray:
    """30-bit Morton codes of (P, 3) points normalized to their bbox."""
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    q = (points - lo) / jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip((q * 1023.0), 0, 1023).astype(jnp.int32)
    return _expand_bits(q[:, 0]) | (_expand_bits(q[:, 1]) << 1) | (_expand_bits(q[:, 2]) << 2)


def mean_sq_dist_3nn(
    points: jnp.ndarray, window: int = 16, mask: jnp.ndarray | None = None, passes: int = 3
) -> jnp.ndarray:
    """Mean squared distance to the (approx) 3 nearest neighbors per point.

    Runs `passes` Morton orders with permuted axes and takes the per-point
    minimum — each pass can only overestimate (miss neighbors), so the min
    tightens toward the exact value.
    """
    perms = ((0, 1, 2), (2, 0, 1), (1, 2, 0))
    span = jnp.max(points, axis=0) - jnp.min(points, axis=0)
    out = None
    for k in range(passes):
        p = perms[k % 3]
        # shift the quantization grid so Morton cell boundaries move between
        # passes (a pure axis permutation barely changes the ordering)
        shifted = points[:, p] + span[None, list(p)] * (k / (passes + 1.0)) * (1.0 / 64.0)
        d = _mean_sq_dist_single(shifted, window, mask)
        out = d if out is None else jnp.minimum(out, d)
    return out


def _mean_sq_dist_single(points: jnp.ndarray, window: int, mask: jnp.ndarray | None) -> jnp.ndarray:
    P = points.shape[0]
    codes = morton_codes(points)
    if mask is not None:
        codes = jnp.where(mask, codes, jnp.int32(0x3FFFFFFF))
    order = jnp.argsort(codes)
    ps = points[order]
    big = jnp.float32(1e20)

    m1 = jnp.full((P,), big)
    m2 = jnp.full((P,), big)
    m3 = jnp.full((P,), big)
    for delta in range(1, window + 1):
        for sgn in (1, -1):
            shifted = jnp.roll(ps, sgn * delta, axis=0)
            d2 = jnp.sum((ps - shifted) ** 2, axis=-1)
            # wrap-around pairs are invalid
            idx = jnp.arange(P)
            valid = (idx >= delta) if sgn == 1 else (idx < P - delta)
            if mask is not None:
                valid = valid & mask[order] & jnp.roll(mask[order], sgn * delta)
            d2 = jnp.where(valid, d2, big)
            swap3 = d2 < m3
            m3 = jnp.where(swap3, d2, m3)
            swap2 = m3 < m2
            m2n = jnp.where(swap2, m3, m2)
            m3 = jnp.where(swap2, m2, m3)
            m2 = m2n
            swap1 = m2 < m1
            m1n = jnp.where(swap1, m2, m1)
            m2 = jnp.where(swap1, m1, m2)
            m1 = m1n

    # average over however many (<=3) neighbors were found; 1e-8 if none
    found = (m1 < big).astype(jnp.float32) + (m2 < big) + (m3 < big)
    total = (
        jnp.where(m1 < big, m1, 0.0)
        + jnp.where(m2 < big, m2, 0.0)
        + jnp.where(m3 < big, m3, 0.0)
    )
    mean_sorted = jnp.where(found > 0, total / jnp.maximum(found, 1.0), 1e-8)
    out = jnp.zeros((P,), mean_sorted.dtype).at[order].set(mean_sorted, unique_indices=True)
    return out
