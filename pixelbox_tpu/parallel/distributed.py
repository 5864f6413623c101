"""Multi-host initialization.

The reference has no distributed communication layer (crossbeam channels
in-process are its entirety — SURVEY.md §5); the TPU build's multi-host
story is ``jax.distributed``: call :func:`init_distributed` once per host
process, then every ``parallel`` API (meshes span all hosts' devices;
collectives ride ICI within a slice and DCN across hosts automatically).
"""

from __future__ import annotations

import os
from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op if single-process or already up).

    Arguments default to the standard JAX env vars / TPU metadata, so on
    Cloud TPU pods a bare ``init_distributed()`` works.
    """
    import jax

    if getattr(init_distributed, "_done", False):
        return
    try:
        kwargs = {}
        if coordinator_address:
            kwargs["coordinator_address"] = coordinator_address
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        if kwargs or os.environ.get("JAX_COORDINATOR_ADDRESS"):
            jax.distributed.initialize(**kwargs)
        init_distributed._done = True
    except Exception as e:  # single-host / already initialized
        if "already initialized" in str(e).lower():
            init_distributed._done = True
        # otherwise: stay single-host silently; meshes still work locally
