"""BLIP text→image retrieval towers in Flax.

The reference ships BLIP assets — models/blip-config.json (a
BlipForConditionalGeneration config: ViT vision encoder hidden 1024 / 24
layers / image 384 / patch 16, BERT-style text model hidden 768 / 12
layers) and models/blip-tokenizer.json (WordPiece) — referenced by no code
(SURVEY.md C15); they were staged for the roadmap item "search on image
contents in plaintext" (reference README.md:35).  This module wires that
capability: contrastive (ITC) retrieval towers producing L2-normalized
latents in the shared ``image_text_hidden_size`` (256) space, quantized
with the same u8 scheme as every other hash and scanned by the same MXU
kernels.

TPU-first: both towers are batched jitted Flax modules; attention shapes
are static (text padded to max_len with masks); image tower consumes NHWC
batches from the standard preprocess pipeline at 384×384.

Weights: random-init by default (no checkpoints ship with the reference
either — .gitignore:6); ``params_from_hf_state_dict`` imports a HF
``BlipForImageTextRetrieval``-family torch state_dict when one is
available offline.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pixelbox_tpu.models.registry import register_embedder
from pixelbox_tpu.models.wordpiece import WordPieceTokenizer


@dataclass(frozen=True)
class BlipVisionConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 384
    patch_size: int = 16
    layer_norm_eps: float = 1e-5


@dataclass(frozen=True)
class BlipTextConfig:
    vocab_size: int = 30524
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12


@dataclass(frozen=True)
class BlipConfig:
    vision: BlipVisionConfig = BlipVisionConfig()
    text: BlipTextConfig = BlipTextConfig()
    projection_dim: int = 256  # image_text_hidden_size in blip-config.json

    @classmethod
    def tiny(cls) -> "BlipConfig":
        """Small config for tests/CI."""
        return cls(
            vision=BlipVisionConfig(
                hidden_size=64, num_layers=2, num_heads=4,
                intermediate_size=128, image_size=64, patch_size=16,
            ),
            text=BlipTextConfig(
                vocab_size=2048, hidden_size=64, num_layers=2, num_heads=4,
                intermediate_size=128, max_position_embeddings=64,
            ),
            projection_dim=32,
        )

    @classmethod
    def from_json(cls, path: str) -> "BlipConfig":
        """Parse a HF blip config json (e.g. the reference's asset file)."""
        import json

        with open(path) as f:
            cfg = json.load(f)
        v = cfg["vision_config"]
        t = cfg["text_config"]
        return cls(
            vision=BlipVisionConfig(
                hidden_size=v["hidden_size"],
                num_layers=v["num_hidden_layers"],
                num_heads=v["num_attention_heads"],
                intermediate_size=v["intermediate_size"],
                image_size=v["image_size"],
                patch_size=v["patch_size"],
                layer_norm_eps=v.get("layer_norm_eps", 1e-5),
            ),
            text=BlipTextConfig(
                vocab_size=t["vocab_size"],
                hidden_size=t["hidden_size"],
                num_layers=t["num_hidden_layers"],
                num_heads=t["num_attention_heads"],
                intermediate_size=t["intermediate_size"],
                max_position_embeddings=t["max_position_embeddings"],
                layer_norm_eps=t.get("layer_norm_eps", 1e-12),
            ),
            projection_dim=cfg.get("image_text_hidden_size", 256),
        )


class SelfAttention(nn.Module):
    hidden: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        hd = self.hidden // self.heads
        q = nn.Dense(self.hidden, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.hidden, dtype=self.dtype, name="k")(x)
        v = nn.Dense(self.hidden, dtype=self.dtype, name="v")(x)
        b, s, _ = x.shape
        q = q.reshape(b, s, self.heads, hd)
        k = k.reshape(b, s, self.heads, hd)
        v = v.reshape(b, s, self.heads, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.float32(hd)
        ).astype(self.dtype)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :] > 0, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, self.hidden)
        return nn.Dense(self.hidden, dtype=self.dtype, name="out")(out)


class TransformerLayer(nn.Module):
    """Pre-LN (ViT style) or post-LN (BERT style) encoder layer."""

    hidden: int
    heads: int
    intermediate: int
    eps: float
    pre_ln: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        attn = SelfAttention(self.hidden, self.heads, self.dtype, name="attn")
        mlp_in = nn.Dense(self.intermediate, dtype=self.dtype, name="mlp_in")
        mlp_out = nn.Dense(self.hidden, dtype=self.dtype, name="mlp_out")
        ln1 = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="ln1")
        ln2 = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="ln2")
        if self.pre_ln:
            x = x + attn(ln1(x), mask)
            x = x + mlp_out(nn.gelu(mlp_in(ln2(x))))
        else:
            x = ln1(x + attn(x, mask))
            x = ln2(x + mlp_out(nn.gelu(mlp_in(x))))
        return x


class BlipVisionTower(nn.Module):
    cfg: BlipVisionConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        c = self.cfg
        b = images.shape[0]
        x = nn.Conv(
            c.hidden_size,
            (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(images)
        x = x.reshape(b, -1, c.hidden_size)
        n_patches = x.shape[1]
        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, c.hidden_size)
        ).astype(self.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c.hidden_size)), x], 1)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, n_patches + 1, c.hidden_size),
        ).astype(self.dtype)
        x = x + pos
        for i in range(c.num_layers):
            x = TransformerLayer(
                c.hidden_size, c.num_heads, c.intermediate_size,
                c.layer_norm_eps, pre_ln=True, dtype=self.dtype,
                name=f"layer{i}",
            )(x)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="post_ln")(x)
        return x[:, 0]  # CLS


class BlipTextTower(nn.Module):
    cfg: BlipTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ids, mask):
        c = self.cfg
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype, name="tok_embed")(ids)
        pos_ids = jnp.arange(ids.shape[1])[None, :]
        pos = nn.Embed(
            c.max_position_embeddings, c.hidden_size, dtype=self.dtype, name="pos_embed"
        )(pos_ids)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="embed_ln")(
            tok + pos
        )
        for i in range(c.num_layers):
            x = TransformerLayer(
                c.hidden_size, c.num_heads, c.intermediate_size,
                c.layer_norm_eps, pre_ln=False, dtype=self.dtype,
                name=f"layer{i}",
            )(x, mask)
        return x[:, 0]  # CLS


class BlipRetrievalModule(nn.Module):
    """Both towers + ITC projections into the shared latent space."""

    cfg: BlipConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.vision = BlipVisionTower(self.cfg.vision, self.dtype)
        self.text = BlipTextTower(self.cfg.text, self.dtype)
        self.vision_proj = nn.Dense(self.cfg.projection_dim, dtype=jnp.float32)
        self.text_proj = nn.Dense(self.cfg.projection_dim, dtype=jnp.float32)

    def embed_images(self, images):
        z = self.vision_proj(self.vision(images).astype(jnp.float32))
        return z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8)

    def embed_texts(self, ids, mask):
        z = self.text_proj(self.text(ids, mask).astype(jnp.float32))
        return z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8)

    def __call__(self, images, ids, mask):
        return self.embed_images(images), self.embed_texts(ids, mask)


class BlipSearcher:
    """Text→image search head: embeds images for the index and texts for
    queries, quantized to u8 for the standard cosine scan.

    L2-normalized latents land in [-1, 1], so the reference's tanh-range
    u8 quantization (ops.quantize) applies unchanged.
    """

    def __init__(
        self,
        cfg: Optional[BlipConfig] = None,
        tokenizer: Optional[WordPieceTokenizer] = None,
        params: Optional[dict] = None,
        seed: int = 0,
        max_text_len: int = 64,
        dtype: Any = jnp.float32,
    ):
        self.cfg = cfg or BlipConfig()
        self.tokenizer = tokenizer or WordPieceTokenizer.toy()
        self.max_text_len = max_text_len
        self.module = BlipRetrievalModule(self.cfg, dtype)
        #: True when the towers run on random init — `text:` results are
        #: noise until the caller trains (training/blip_train.py) or
        #: imports weights (params_from_hf_state_dict).  The engine warns
        #: loudly when serving on a random-init searcher.
        self.random_init = params is None
        if params is None:
            rng = jax.random.PRNGKey(seed)
            s = self.cfg.vision.image_size
            params = self.module.init(
                rng,
                jnp.zeros((1, s, s, 3), jnp.float32),
                jnp.zeros((1, max_text_len), jnp.int32),
                jnp.ones((1, max_text_len), jnp.int32),
            )
        self.variables = params
        self._embed_images = jax.jit(
            lambda v, x: self.module.apply(v, x, method="embed_images")
        )
        self._embed_texts = jax.jit(
            lambda v, ids, m: self.module.apply(v, ids, m, method="embed_texts")
        )

    @property
    def dim(self) -> int:
        return self.cfg.projection_dim

    @property
    def input_size(self) -> int:
        return self.cfg.vision.image_size

    def embed_image_batch(self, batch: jnp.ndarray) -> jnp.ndarray:
        """f32 [B, S, S, 3] in [0,1] → normalized f32 [B, proj]."""
        return self._embed_images(self.variables, batch)

    def embed_text_batch(self, texts) -> jnp.ndarray:
        ids, mask = self.tokenizer.encode_batch(texts, self.max_text_len)
        return self._embed_texts(self.variables, jnp.asarray(ids), jnp.asarray(mask))

    def image_hashes(self, images) -> np.ndarray:
        """HxWx3 u8 list → u8 [B, proj] quantized latents."""
        from pixelbox_tpu.ops.preprocess import preprocess_host
        from pixelbox_tpu.ops.quantize import quantize_embedding

        batch = np.stack(
            [preprocess_host(np.asarray(im), self.input_size) for im in images]
        )
        z = self.embed_image_batch(jnp.asarray(batch))
        return np.asarray(quantize_embedding(z))

    def text_hashes(self, texts) -> np.ndarray:
        from pixelbox_tpu.ops.quantize import quantize_embedding

        z = self.embed_text_batch(list(texts))
        return np.asarray(quantize_embedding(z))


@register_embedder("blip")
class BlipImageEmbedder:
    """Embedder-protocol adapter so the ingest pipeline can populate a
    BLIP image index like any other semantic store."""

    def __init__(self, searcher: Optional[BlipSearcher] = None, **kwargs):
        self.searcher = searcher or BlipSearcher(**kwargs)
        self.dim = self.searcher.dim
        self.input_size = self.searcher.input_size

    def embed_preprocessed(self, batch):
        return self.searcher.embed_image_batch(batch)

    def embed_images(self, images):
        return np.asarray(self.searcher.embed_image_batch(
            jnp.asarray(np.stack([
                __import__("pixelbox_tpu.ops.preprocess", fromlist=["preprocess_host"])
                .preprocess_host(np.asarray(im), self.input_size)
                for im in images
            ]))
        ))

    def mlhash(self, image):
        return self.searcher.image_hashes([image])[0]

    def mlhash_batch(self, images):
        return self.searcher.image_hashes(list(images))


# --------------------------------------------------------------------- #
# HF weight import


def params_from_hf_state_dict(state_dict, cfg: BlipConfig):
    """Map a HF torch Blip retrieval/ITC state_dict onto our modules.

    Handles the standard prefixes: vision_model.*, text_encoder.*,
    vision_proj.*, text_proj.*.  Unknown keys are ignored; missing keys
    keep their random init (caller should verify coverage).
    """
    sd = {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in state_dict.items()
    }
    params: dict = {}

    def put(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(value)

    def dense(src, dst):
        if f"{src}.weight" in sd:
            put(dst + ("kernel",), np.transpose(sd[f"{src}.weight"]))
        if f"{src}.bias" in sd:
            put(dst + ("bias",), sd[f"{src}.bias"])

    def ln(src, dst):
        if f"{src}.weight" in sd:
            put(dst + ("scale",), sd[f"{src}.weight"])
            put(dst + ("bias",), sd[f"{src}.bias"])

    # Vision tower.
    v = "vision_model"
    if f"{v}.embeddings.patch_embedding.weight" in sd:
        put(
            ("vision", "patch_embed", "kernel"),
            np.transpose(sd[f"{v}.embeddings.patch_embedding.weight"], (2, 3, 1, 0)),
        )
        put(("vision", "patch_embed", "bias"), sd[f"{v}.embeddings.patch_embedding.bias"])
        put(("vision", "cls_token"), sd[f"{v}.embeddings.class_embedding"].reshape(1, 1, -1))
        put(("vision", "pos_embed"), sd[f"{v}.embeddings.position_embedding"])
    for i in range(cfg.vision.num_layers):
        src = f"{v}.encoder.layers.{i}"
        dst = ("vision", f"layer{i}")
        # HF blip vision packs qkv: self_attn.qkv.weight [3h, h]
        if f"{src}.self_attn.qkv.weight" in sd:
            qkv_w = sd[f"{src}.self_attn.qkv.weight"]
            qkv_b = sd[f"{src}.self_attn.qkv.bias"]
            h = cfg.vision.hidden_size
            for j, nmn in enumerate(("q", "k", "v")):
                put(dst + ("attn", nmn, "kernel"), np.transpose(qkv_w[j * h : (j + 1) * h]))
                put(dst + ("attn", nmn, "bias"), qkv_b[j * h : (j + 1) * h])
        dense(f"{src}.self_attn.projection", dst + ("attn", "out"))
        ln(f"{src}.layer_norm1", dst + ("ln1",))
        ln(f"{src}.layer_norm2", dst + ("ln2",))
        dense(f"{src}.mlp.fc1", dst + ("mlp_in",))
        dense(f"{src}.mlp.fc2", dst + ("mlp_out",))
    ln(f"{v}.post_layernorm", ("vision", "post_ln"))

    # Text tower (BERT layout).
    t = "text_encoder"
    if f"{t}.embeddings.word_embeddings.weight" in sd:
        put(("text", "tok_embed", "embedding"), sd[f"{t}.embeddings.word_embeddings.weight"])
        put(("text", "pos_embed", "embedding"), sd[f"{t}.embeddings.position_embeddings.weight"])
        ln(f"{t}.embeddings.LayerNorm", ("text", "embed_ln"))
    for i in range(cfg.text.num_layers):
        src = f"{t}.encoder.layer.{i}"
        dst = ("text", f"layer{i}")
        dense(f"{src}.attention.self.query", dst + ("attn", "q"))
        dense(f"{src}.attention.self.key", dst + ("attn", "k"))
        dense(f"{src}.attention.self.value", dst + ("attn", "v"))
        dense(f"{src}.attention.output.dense", dst + ("attn", "out"))
        ln(f"{src}.attention.output.LayerNorm", dst + ("ln1",))
        dense(f"{src}.intermediate.dense", dst + ("mlp_in",))
        dense(f"{src}.output.dense", dst + ("mlp_out",))
        ln(f"{src}.output.LayerNorm", dst + ("ln2",))

    dense("vision_proj", ("vision_proj",))
    dense("text_proj", ("text_proj",))
    return {"params": params}
