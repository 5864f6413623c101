"""Persistent XLA compilation cache setup.

CLI cold starts otherwise pay a full jit compile per process (≈1-2 min for
the embedder over a TPU tunnel).  Cache dir: $PIXELBOX_TPU_CACHE_DIR or
~/.cache/pixelbox_tpu/jax_cache.
"""

from __future__ import annotations

import hashlib
import os
import platform


def machine_fingerprint() -> str:
    """Short stable hash of this host's CPU identity.

    XLA:CPU AOT cache entries are microarch-specific; loading entries
    compiled on a different machine logs `cpu_aot_loader` errors and can
    SIGILL.  Keying the cache directory on (arch, model name, flags)
    makes a copied/shared cache dir self-invalidate across machines.
    """
    parts = [platform.machine()]
    # Model name + flags alone are NOT enough: two VM hosts can report
    # identical strings while XLA derives different tuning features
    # (e.g. +prefer-no-gather from the downfall-mitigation microcode),
    # which still trips cpu_aot_loader mismatches.  Include the full
    # microarch identity of cpu0.
    keys = ("model name", "flags", "Features", "cpu family", "model\t",
            "stepping", "microcode")
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not line.strip():
                    break  # end of cpu0 block
                if line.startswith(keys):
                    parts.append(line.strip())
    except OSError:
        parts.append(platform.processor() or "unknown")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def enable_compilation_cache() -> None:
    import jax

    cache_dir = os.path.join(
        os.environ.get(
            "PIXELBOX_TPU_CACHE_DIR",
            os.path.join(
                os.path.expanduser("~"), ".cache", "pixelbox_tpu", "jax_cache"
            ),
        ),
        machine_fingerprint(),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization; never fail startup over it
