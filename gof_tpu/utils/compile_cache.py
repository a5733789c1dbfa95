"""Persistent XLA compilation cache.

Training re-jits its step on every key/compact-capacity change and eval
render growth retry; each phase compile costs 45-60 s on the v5e tunnel.
The reference pays nothing here (CUDA kernels are AOT), so the TPU rebuild
must amortize: a process-wide persistent cache turns every re-jit at a
previously-seen shape into a disk hit.

Enabled by every CLI entry point (train / render / extract / metrics /
bench). GOF_XLA_CACHE_DIR overrides the location; GOF_XLA_CACHE=0 disables.
"""

from __future__ import annotations

import os

_ENABLED = False


def enable() -> None:
    global _ENABLED
    if _ENABLED or os.environ.get("GOF_XLA_CACHE", "1") == "0":
        return
    import jax

    path = os.environ.get(
        "GOF_XLA_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "gof_tpu_xla"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every nontrivial compile (default threshold 1s skips small jits
    # like the densify/reset/filter helpers that still re-trace per capacity)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _ENABLED = True
