"""Multi-chip execution: meshes, sharded scans, data-parallel embedding.

The reference is single-process with CPU-thread ingest parallelism only
(SURVEY.md §2 parallelism inventory); the TPU build scales through
``jax.sharding.Mesh``:

- **scan**: index rows sharded across chips (row-parallel "TP" of the scan
  matrix); per-chip top-k; all-gather of k·n_chips candidates over ICI +
  deterministic merge (``sharded_scan``);
- **ingest**: embedder batch dim sharded (DP) via NamedSharding;
- multi-host: same code — DCN between hosts is handled by jax.distributed.
"""

from pixelbox_tpu.parallel.mesh import make_mesh
from pixelbox_tpu.parallel.sharded_scan import (
    shard_semantic_index,
    sharded_cosine_scan_topk,
)

__all__ = ["make_mesh", "shard_semantic_index", "sharded_cosine_scan_topk"]
