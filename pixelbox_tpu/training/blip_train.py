"""Image-text contrastive (ITC) training for the BLIP retrieval towers.

The reference stages BLIP assets for "search on image contents in
plaintext" (reference README.md:35, models/blip-config.json) but ships no
training for them; this completes the story: standard in-batch ITC
(CLIP-style InfoNCE) over (image, caption) pairs with a learnable
temperature (logit_scale_init 2.6592 comes straight from the asset's
config), dp-sharded like the embedder trainer.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from pixelbox_tpu.models.blip import BlipConfig, BlipRetrievalModule
from pixelbox_tpu.models.wordpiece import WordPieceTokenizer


@dataclass(frozen=True)
class BlipTrainConfig:
    cfg: BlipConfig
    max_text_len: int = 32
    batch_size: int = 16
    lr: float = 1e-4
    logit_scale_init: float = 2.6592  # blip-config.json logit_scale_init_value


def itc_loss(z_img, z_txt, logit_scale):
    """Symmetric InfoNCE over in-batch pairs (diagonal = positives)."""
    logits = logit_scale * z_img @ z_txt.T  # [B, B]
    labels = jnp.arange(logits.shape[0])
    li = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    lt = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    return 0.5 * (li + lt)


def init_blip_train_state(tc: BlipTrainConfig, mesh: Mesh, seed: int = 0):
    module = BlipRetrievalModule(tc.cfg)
    s = tc.cfg.vision.image_size
    variables = module.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, s, s, 3), jnp.float32),
        jnp.zeros((1, tc.max_text_len), jnp.int32),
        jnp.ones((1, tc.max_text_len), jnp.int32),
    )
    params = dict(variables["params"])
    params["logit_scale"] = jnp.asarray(np.exp(0.0) * tc.logit_scale_init, jnp.float32)
    params = jax.device_put(params, NamedSharding(mesh, P()))
    tx = optax.adam(tc.lr)
    opt_state = tx.init(params)
    return module, params, opt_state, tx


def make_blip_train_step(module, tx, mesh: Mesh):
    data_sharding = NamedSharding(mesh, P("data"))

    def loss_fn(params, images, ids, mask):
        variables = {"params": {k: v for k, v in params.items() if k != "logit_scale"}}
        z_img = module.apply(variables, images, method="embed_images")
        z_txt = module.apply(variables, ids, mask, method="embed_texts")
        return itc_loss(z_img, z_txt, params["logit_scale"])

    @jax.jit
    def step(params, opt_state, images, ids, mask):
        images = jax.lax.with_sharding_constraint(images, data_sharding)
        loss, grads = jax.value_and_grad(loss_fn)(params, images, ids, mask)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def train_blip(
    pairs: List[Tuple[np.ndarray, str]],
    tc: BlipTrainConfig,
    mesh: Mesh,
    tokenizer: Optional[WordPieceTokenizer] = None,
    steps: int = 10,
    seed: int = 0,
):
    """Train on (rgb_image, caption) pairs; returns (variables, losses)."""
    from pixelbox_tpu.ops.preprocess import preprocess_host

    tok = tokenizer or WordPieceTokenizer.toy(
        words=sorted({w for _, c in pairs for w in c.lower().split()})
    )
    module, params, opt_state, tx = init_blip_train_state(tc, mesh, seed)
    step = make_blip_train_step(module, tx, mesh)
    rng = np.random.default_rng(seed)
    s = tc.cfg.vision.image_size

    losses = []
    for _ in range(steps):
        sel = rng.integers(0, len(pairs), tc.batch_size)
        images = np.stack([preprocess_host(pairs[i][0], s) for i in sel])
        ids, mask = tok.encode_batch([pairs[i][1] for i in sel], tc.max_text_len)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(images), jnp.asarray(ids),
            jnp.asarray(mask),
        )
        losses.append(float(loss))
    variables = {
        "params": {k: v for k, v in params.items() if k != "logit_scale"}
    }
    return variables, losses
