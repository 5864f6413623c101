"""Persistent XLA compilation cache setup.

CLI cold starts otherwise pay a full jit compile per process (≈1-2 min for
the embedder over a TPU tunnel).  Cache dir: $PIXELBOX_TPU_CACHE_DIR or
~/.cache/pixelbox_tpu/jax_cache.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    import jax

    cache_dir = os.environ.get(
        "PIXELBOX_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "pixelbox_tpu", "jax_cache"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization; never fail startup over it
