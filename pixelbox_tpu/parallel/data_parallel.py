"""Data-parallel ingest embedding: batch dim sharded over the mesh.

The reference's only data parallelism is 4 CPU decode threads
(src/engine.rs:22); the TPU-native ingest shards the EMBED batch across
chips: inputs land with ``NamedSharding(P('data'))``, parameters replicate,
and XLA partitions the forward automatically — per-chip batch slices,
no collectives until the gather of the small latents.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def shard_batch(batch: np.ndarray, mesh: Mesh, axis: str = "data") -> jnp.ndarray:
    """Place a host batch sharded over the mesh's batch axis (padding to a
    multiple of the axis size; caller trims outputs to the true length)."""
    n = batch.shape[0]
    n_shards = mesh.shape[axis]
    n_pad = -(-n // n_shards) * n_shards
    if n_pad != n:
        pad = np.zeros((n_pad - n,) + batch.shape[1:], dtype=batch.dtype)
        batch = np.concatenate([batch, pad], axis=0)
    sharding = NamedSharding(mesh, P(axis, *([None] * (batch.ndim - 1))))
    return jax.device_put(batch, sharding)


def embed_batch_sharded(
    embedder,
    batch: np.ndarray,
    mesh: Mesh,
    axis: str = "data",
) -> np.ndarray:
    """Embed a host batch data-parallel over the mesh → host f32 [n, dim]."""
    n = batch.shape[0]
    device_batch = shard_batch(np.ascontiguousarray(batch), mesh, axis)
    latents = embedder.embed_preprocessed(device_batch)
    return np.asarray(latents)[:n]
