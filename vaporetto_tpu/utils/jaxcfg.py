"""JAX runtime configuration helpers."""

from __future__ import annotations

import os

_configured = False


def ensure_compilation_cache() -> None:
    """Enable the persistent XLA compilation cache.

    First-time compiles over the axon TPU tunnel are expensive (minutes);
    the on-disk cache makes every later process start fast.
    """
    global _configured
    if _configured:
        return
    _configured = True
    import jax

    cache_dir = os.environ.get(
        "VAPORETTO_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "vaporetto_tpu_jax"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
