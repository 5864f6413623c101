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
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if not kwargs and not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        init_distributed._done = True  # plain single-host: nothing to do
        return
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:
        if "already initialized" in str(e).lower():
            init_distributed._done = True
            return
        # Multi-host WAS requested (explicit args or env) and failed —
        # degrading to single-host silently would serve wrong/partial
        # indexes on a misconfigured pod.  Fail loudly instead.
        raise RuntimeError(
            "jax.distributed.initialize failed for the requested multi-host "
            f"configuration {kwargs or 'from JAX_COORDINATOR_ADDRESS env'}: {e}"
        ) from e
    init_distributed._done = True
