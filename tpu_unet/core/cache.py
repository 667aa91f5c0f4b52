"""Persistent XLA compilation cache (first compile ~minutes over the TPU tunnel;
subsequent runs hit the on-disk cache)."""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                              os.path.expanduser("~/.cache/tpu_unet_xla"))


def enable_compilation_cache(cache_dir: str = _DEFAULT_DIR) -> None:
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
