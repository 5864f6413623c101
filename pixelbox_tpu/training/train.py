"""Self-supervised contrastive training of the embedder.

JAX/optax port of the reference's offline trainer (resources/train.py):
pairs of corrupted views — same image twice → label +1, different images →
label −1 (train.py:75-87) — CosineEmbeddingLoss + Adam lr 1e-4
(train.py:118-122), per-epoch checkpoints (train.py:161-163).

TPU-native: the train step is jitted over a dp×tp ``Mesh`` — batch sharded
over 'data', the embedding head's Linear sharded over 'model' — with
gradients meaned across 'data' by XLA-inserted collectives.  Corruptions
(random rotation/jitter/crop, train.py:101-115) run on host in the data
loader; the step consumes ready image pairs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from pixelbox_tpu.models.efficientnet import EfficientNetEmbedderModule


@dataclass(frozen=True)
class TrainConfig:
    latent_dim: int = 8       # train.py:178
    input_size: int = 224     # train.py:181-182
    batch_size: int = 32      # train.py:186
    lr: float = 1e-4          # train.py:185
    margin: float = 0.0       # torch CosineEmbeddingLoss default
    dtype: Any = jnp.float32


def cosine_embedding_loss(
    left: jnp.ndarray, right: jnp.ndarray, labels: jnp.ndarray, margin: float = 0.0
) -> jnp.ndarray:
    """torch.nn.CosineEmbeddingLoss (train.py:118), mean reduction."""
    eps = 1e-8
    cos = jnp.sum(left * right, axis=-1) / (
        jnp.maximum(jnp.linalg.norm(left, axis=-1), eps)
        * jnp.maximum(jnp.linalg.norm(right, axis=-1), eps)
    )
    pos = 1.0 - cos
    neg = jnp.maximum(0.0, cos - margin)
    return jnp.mean(jnp.where(labels > 0, pos, neg))


class TrainState:
    """Minimal train state pytree (params+stats+opt state)."""

    def __init__(self, variables, opt_state, step):
        self.variables = variables
        self.opt_state = opt_state
        self.step = step

    def tree_flatten(self):
        return (self.variables, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def _make_optimizer(cfg: TrainConfig):
    return optax.adam(cfg.lr)


def _param_sharding(variables, mesh: Mesh):
    """Replicate everything except the head Linear, sharded over 'model'."""

    def spec_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "linear" in keys and keys[-1] == "kernel":
            return NamedSharding(mesh, P(None, "model"))
        if "linear" in keys and keys[-1] == "bias":
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, variables)


def init_train_state(cfg: TrainConfig, mesh: Mesh, seed: int = 0) -> TrainState:
    module = EfficientNetEmbedderModule(latent_dim=cfg.latent_dim, dtype=cfg.dtype)
    dummy = jnp.zeros((1, cfg.input_size, cfg.input_size, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(seed), dummy)
    shardings = _param_sharding(variables, mesh)
    variables = jax.tree.map(
        lambda x, s: jax.device_put(x, s), variables, shardings
    )
    tx = _make_optimizer(cfg)
    opt_state = tx.init(variables["params"])
    return TrainState(variables, opt_state, jnp.zeros((), jnp.int32))


def make_sharded_train_step(cfg: TrainConfig, mesh: Mesh):
    """One jitted contrastive step; batch dp-sharded, head tp-sharded."""
    module = EfficientNetEmbedderModule(latent_dim=cfg.latent_dim, dtype=cfg.dtype)
    tx = _make_optimizer(cfg)
    data_sharding = NamedSharding(mesh, P("data"))

    def loss_fn(params, batch_stats, left, right, labels):
        variables = {"params": params, "batch_stats": batch_stats}
        zl = module.apply(variables, left)
        zr = module.apply(variables, right)
        return cosine_embedding_loss(zl, zr, labels, cfg.margin)

    @jax.jit
    def step(state: TrainState, left, right, labels):
        left = jax.lax.with_sharding_constraint(left, data_sharding)
        right = jax.lax.with_sharding_constraint(right, data_sharding)
        params = state.variables["params"]
        batch_stats = state.variables.get("batch_stats", {})
        loss, grads = jax.value_and_grad(loss_fn)(
            params, batch_stats, left, right, labels
        )
        updates, opt_state = tx.update(grads, state.opt_state, params)
        params = optax.apply_updates(params, updates)
        new_vars = dict(state.variables)
        new_vars["params"] = params
        return TrainState(new_vars, opt_state, state.step + 1), loss

    return step


# --------------------------------------------------------------------- #
# Host-side data pipeline (corruptions, train.py:101-115)


def gaussian_blur_np(img: np.ndarray, sigma: float, ksize: int = 5) -> np.ndarray:
    """Separable Gaussian blur (torchvision GaussianBlur(kernel_size=5),
    train.py:113): reflect padding, float32."""
    half = ksize // 2
    xs = np.arange(-half, half + 1, dtype=np.float32)
    k = np.exp(-(xs ** 2) / (2.0 * sigma * sigma))
    k /= k.sum()
    x = np.asarray(img, dtype=np.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[:, :, None]
    pad = np.pad(x, ((half, half), (0, 0), (0, 0)), mode="reflect")
    x = sum(k[i] * pad[i : i + x.shape[0]] for i in range(ksize))
    pad = np.pad(x, ((0, 0), (half, half), (0, 0)), mode="reflect")
    x = sum(k[i] * pad[:, i : i + x.shape[1]] for i in range(ksize))
    return x[:, :, 0] if squeeze else x


def corrupt_image(rgb: np.ndarray, size: int, rng: np.random.Generator) -> np.ndarray:
    """The reference's corruption stack, item for item
    (resources/train.py:101-115): RandomRotation(±25°, bilinear), random
    ColorJitter, random upscale 1.2–1.4×, RandomResizedCrop(size), rare
    grayscale / invert, GaussianBlur(kernel 5).  Returns f32 in [0, 1].
    """
    from PIL import Image

    from pixelbox_tpu.ops.resample import resize_np, to_u8

    img = np.asarray(rgb, dtype=np.uint8)
    # Real rotation ±25° (train.py:104), bilinear like torchvision's
    # RandomRotation; PIL fills the revealed corners with black like
    # torchvision's default fill=0.
    angle = float(rng.uniform(-25.0, 25.0))
    img = np.asarray(
        Image.fromarray(img).rotate(angle, resample=Image.BILINEAR)
    )
    # Color jitter: brightness/contrast/saturation.
    img = img.astype(np.float32)
    b = rng.uniform(0.8, 1.2)
    c = rng.uniform(0.8, 1.2)
    img = np.clip((img - 128.0) * c + 128.0 * b, 0, 255)
    sat = rng.uniform(0.8, 1.2)
    grey = img @ np.array([0.299, 0.587, 0.114], np.float32)
    img = np.clip(grey[:, :, None] + sat * (img - grey[:, :, None]), 0, 255)
    # Random resize 1.2–1.4× (train.py:107-109) before the crop.
    h, w = img.shape[:2]
    up = rng.uniform(1.2, 1.4)
    img = resize_np(img, max(1, int(w * up)), max(1, int(h * up)), "triangle")
    # Random resized crop to `size` (train.py:110).
    h, w = img.shape[:2]
    scale = rng.uniform(0.6, 1.0)
    ch, cw = max(8, int(h * scale)), max(8, int(w * scale))
    y0 = rng.integers(0, h - ch + 1)
    x0 = rng.integers(0, w - cw + 1)
    img = img[y0 : y0 + ch, x0 : x0 + cw]
    if rng.uniform() < 0.01:
        g = img @ np.array([0.299, 0.587, 0.114], np.float32)
        img = np.stack([g, g, g], axis=-1)
    if rng.uniform() < 0.001:
        img = 255.0 - img
    # Gaussian blur, kernel 5, torchvision's sigma range (train.py:113).
    if rng.uniform() < 0.5:
        img = gaussian_blur_np(img, sigma=float(rng.uniform(0.1, 2.0)))
    img = to_u8(np.clip(resize_np(img, size, size, "triangle"), 0, 255))
    return img.astype(np.float32) / np.float32(255.0)


def make_pair_batch(
    images: list, cfg: TrainConfig, rng: np.random.Generator
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Contrastive pair batch (train.py:75-87): same image twice → +1,
    random other image → −1."""
    lefts, rights, labels = [], [], []
    n = len(images)
    for _ in range(cfg.batch_size):
        i = rng.integers(0, n)
        lefts.append(corrupt_image(images[i], cfg.input_size, rng))
        if rng.uniform() < 0.5:
            j = rng.integers(0, n)
            rights.append(corrupt_image(images[j], cfg.input_size, rng))
            labels.append(1.0 if i == j else -1.0)
        else:
            rights.append(corrupt_image(images[i], cfg.input_size, rng))
            labels.append(1.0)
    return (
        np.stack(lefts).astype(np.float32),
        np.stack(rights).astype(np.float32),
        np.asarray(labels, np.float32),
    )


def train_loop(
    image_paths: list,
    cfg: TrainConfig,
    mesh: Mesh,
    epochs: int = 10,
    steps_per_epoch: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    seed: int = 0,
    resume_from: Optional[str] = None,
):
    """Minimal end-to-end trainer over a folder of images (train.py:94-164).

    Writes per-epoch param checkpoints (.npz) plus a full resumable
    orbax state under ``checkpoint_dir/state`` and an
    ``experiment_log_<stamp>.json`` (config + per-epoch losses — the
    reference's experiment_log_*.txt, train.py:192-198).
    ``resume_from`` restores a previous ``state`` directory (params AND
    optimizer moments) before training.
    """
    import json
    import os
    import time

    from pixelbox_tpu.ingest.decode import decode_image_file
    from pixelbox_tpu.models.efficientnet import save_params

    images = []
    for p in image_paths:
        d = decode_image_file(p)
        if d is not None:
            images.append(d.rgb)
    if not images:
        raise ValueError("no decodable training images")

    rng = np.random.default_rng(seed)
    if resume_from:
        state = restore_train_state(resume_from, cfg, mesh, seed)
    else:
        state = init_train_state(cfg, mesh, seed)
    step = make_sharded_train_step(cfg, mesh)
    spe = steps_per_epoch or max(1, len(images) // cfg.batch_size)

    # Optional wandb telemetry, import-guarded exactly like the
    # reference's trainer (resources/train.py:16-22,125-129,156-157):
    # when wandb is importable the run config and per-epoch losses are
    # logged; when absent training proceeds silently on JSON logs alone.
    wandb_run = None
    try:
        import wandb  # noqa: PLC0415

        wandb_run = wandb.init(
            project="pixelbox_tpu",
            config={
                "latent_dim": cfg.latent_dim,
                "input_size": cfg.input_size,
                "batch_size": cfg.batch_size,
                "lr": cfg.lr,
                "margin": cfg.margin,
                "epochs": epochs,
                "steps_per_epoch": spe,
                "num_images": len(images),
                "seed": seed,
            },
        )
    except Exception:  # ImportError or offline init failure — optional
        wandb_run = None

    losses = []
    for epoch in range(epochs):
        total = 0.0
        for _ in range(spe):
            left, right, labels = make_pair_batch(images, cfg, rng)
            state, loss = step(
                state, jnp.asarray(left), jnp.asarray(right), jnp.asarray(labels)
            )
            total += float(loss)
        losses.append(total)
        print(f"Epoch [{epoch}/{epochs}] loss: {total}")
        if wandb_run is not None:
            try:
                wandb_run.log({"epoch": epoch, "loss": total})
            except Exception:
                pass
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)
            save_params(
                state.variables, os.path.join(checkpoint_dir, f"checkpoint_{epoch}.npz")
            )
            save_train_state(state, os.path.join(checkpoint_dir, "state"))
    if checkpoint_dir:
        stamp = time.strftime("%Y%m%d%H%M%S")
        with open(
            os.path.join(checkpoint_dir, f"experiment_log_{stamp}.json"), "w"
        ) as f:
            json.dump(
                {
                    "config": {
                        "latent_dim": cfg.latent_dim,
                        "input_size": cfg.input_size,
                        "batch_size": cfg.batch_size,
                        "lr": cfg.lr,
                        "margin": cfg.margin,
                        "epochs": epochs,
                        "steps_per_epoch": spe,
                        "num_images": len(images),
                        "seed": seed,
                    },
                    "losses": losses,
                },
                f,
                indent=1,
            )
    if wandb_run is not None:
        try:
            wandb_run.finish()
        except Exception:
            pass
    return state, losses


def save_train_state(state: TrainState, path: str) -> None:
    """Full resumable checkpoint (params + batch stats + OPTIMIZER state
    + step) via orbax — the per-epoch .npz files keep only params, so
    resuming from them loses Adam moments; this doesn't."""
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore_train_state(path: str, cfg: TrainConfig, mesh: Mesh,
                        seed: int = 0) -> TrainState:
    """Restore a :func:`save_train_state` checkpoint onto ``mesh`` (the
    template from init supplies structure/dtypes; every leaf is placed
    with the template's NamedSharding, or mesh-replicated for leaves the
    optimizer created unsharded — mixing committed single-device and
    mesh-committed arrays in one jit is an error)."""
    import os

    import orbax.checkpoint as ocp

    template = init_train_state(cfg, mesh, seed)
    path = os.path.abspath(path)
    np_template = jax.tree.map(lambda x: np.asarray(x), template)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, np_template)

    def place(t, r):
        s = getattr(t, "sharding", None)
        if not isinstance(s, NamedSharding):
            s = NamedSharding(mesh, P())
        return jax.device_put(jnp.asarray(r), s)

    return jax.tree.map(place, template, restored)


def finalize(state_or_variables, out_dir: str, cfg: Optional[TrainConfig] = None):
    """Produce the versioned deployable artifact (train.py:167-174's
    ``finalize``): ``model.npz`` (our native Flax bundle),
    ``image_similarity.onnx`` (opset 11, dynamic batch — the exact file
    src/image_hashes/efficientnet.rs:5-14 consumes), and
    ``model.json`` metadata.  Returns the bundle directory."""
    import json
    import os
    import time

    from pixelbox_tpu.models.efficientnet import save_params
    from pixelbox_tpu.models.onnx_io import export_onnx
    from pixelbox_tpu.version import __version__

    variables = getattr(state_or_variables, "variables", state_or_variables)
    # Gather any sharded leaves to host before serializing.
    variables = jax.tree.map(lambda x: np.asarray(x), variables)
    cfg = cfg or TrainConfig(
        latent_dim=int(variables["params"]["linear"]["bias"].shape[0])
    )
    os.makedirs(out_dir, exist_ok=True)
    save_params(variables, os.path.join(out_dir, "model.npz"))
    export_onnx(
        variables,
        os.path.join(out_dir, "image_similarity.onnx"),
        input_size=cfg.input_size,
    )
    with open(os.path.join(out_dir, "model.json"), "w") as f:
        json.dump(
            {
                "format": "pixelbox-tpu-model",
                "version": __version__,
                "created": time.strftime("%Y-%m-%dT%H:%M:%S"),
                "latent_dim": cfg.latent_dim,
                "input_size": cfg.input_size,
                "files": ["model.npz", "image_similarity.onnx"],
            },
            f,
            indent=1,
        )
    return out_dir
