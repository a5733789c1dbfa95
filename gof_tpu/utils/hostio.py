"""Robust device->host transfers.

One-shot D2H of large buffers through a tunneled backend (the axon loopback
relay) can degrade to KB/s or wedge entirely, while small transfers stay
healthy. Fetch large arrays in bounded slices instead: each slice is cut
under jit (eager slicing would itself allocate an unfetchable intermediate)
and pulled separately.
"""

from __future__ import annotations

import functools

import numpy as np

CHUNK_BYTES = 1 << 18  # 256 KiB per transfer


@functools.lru_cache(maxsize=64)
def _slicer(ndim: int, rows: int):
    import jax
    from jax import lax

    @functools.partial(jax.jit, static_argnums=())
    def f(x, i):
        return lax.dynamic_slice_in_dim(x, i, rows, axis=0)

    return f


def device_get(x, chunk_bytes: int = CHUNK_BYTES):
    """np.asarray(x) with no single transfer larger than chunk_bytes."""
    if not hasattr(x, "shape"):
        return x
    x_np_like = getattr(x, "dtype", None)
    if x_np_like is None:
        return np.asarray(x)
    nbytes = int(np.prod(x.shape)) * x.dtype.itemsize
    if isinstance(x, np.ndarray) or x.ndim == 0 or nbytes <= chunk_bytes:
        return np.asarray(x)
    rowbytes = max(nbytes // max(x.shape[0], 1), 1)
    rows = max(1, chunk_bytes // rowbytes)
    if rows >= x.shape[0]:
        return np.asarray(x)
    f = _slicer(x.ndim, rows)
    parts = []
    i = 0
    n = x.shape[0]
    while i + rows <= n:
        parts.append(np.asarray(f(x, i)))
        i += rows
    if i < n:
        # tail: dynamic_slice clamps the start so the last full-size window
        # ends exactly at n
        tail = np.asarray(f(x, n - rows))
        parts.append(tail[rows - (n - i):])
    return np.concatenate(parts, axis=0)


def tree_get(tree, chunk_bytes: int = CHUNK_BYTES):
    """jax.tree.map(device_get) over a pytree."""
    import jax

    return jax.tree.map(lambda l: device_get(l, chunk_bytes), tree)
