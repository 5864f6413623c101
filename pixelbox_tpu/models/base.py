"""Embedder interface.

Contract (mirroring the reference's ``mlhash`` contract,
src/image_hashes/efficientnet.rs:31-42, batched): images in → tanh-bounded
f32 latents out → quantized u8 via ``ops.quantize.quantize_embedding``.
"""

from __future__ import annotations

import abc

import jax.numpy as jnp
import numpy as np

from pixelbox_tpu.ops.preprocess import preprocess_host
from pixelbox_tpu.ops.quantize import quantize_embedding


class Embedder(abc.ABC):
    """Batched image embedder producing fixed-width f32 latents."""

    #: latent width (the reference ships 8, src/image_hashes/efficientnet.rs:8;
    #: hash width is a free parameter of the engine, README.md:51-59)
    dim: int
    #: expected square input resolution (224 for the reference embedder)
    input_size: int = 224

    @abc.abstractmethod
    def embed_preprocessed(self, batch: jnp.ndarray) -> jnp.ndarray:
        """f32 [B, S, S, 3] in [0,1] → f32 [B, dim] latents."""

    def embed_images(self, images) -> np.ndarray:
        """List of HxWx3 u8 arrays (any sizes) → f32 [B, dim].

        Convenience path: host preprocess per image then one device batch.
        The ingest pipeline uses the fully-batched device preprocess instead.
        """
        batch = np.stack([preprocess_host(im, self.input_size) for im in images])
        return np.asarray(self.embed_preprocessed(jnp.asarray(batch)))

    def mlhash(self, image: np.ndarray) -> np.ndarray:
        """One image → quantized u8 hash (the reference's ``mlhash`` shape)."""
        latent = self.embed_images([np.asarray(image)])[0]
        return np.asarray(quantize_embedding(jnp.asarray(latent)))

    def mlhash_batch(self, images) -> np.ndarray:
        latents = self.embed_images(images)
        return np.asarray(quantize_embedding(jnp.asarray(latents)))
