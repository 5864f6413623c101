"""EfficientNet-B0 embedder in Flax — the reference's flagship model.

Replicates the architecture the reference trains and serves:
``torchvision.efficientnet_b0().features`` + AdaptiveAvgPool2d + Flatten +
Linear(1280→latent) + Tanh (reference resources/train.py:30-46), executed
at 224×224 (src/image_hashes/efficientnet.rs:6-8; the README's 128×128
claim is stale per SURVEY.md §1).

TPU-first details: NHWC layout, batched jitted forward, optional bfloat16
compute with f32 head (tanh output must quantize identically), weights
importable from a torchvision/torch state_dict via
:func:`params_from_torch_state_dict` (BN folded at load is unnecessary —
XLA fuses inference BN into the conv).

Blocks (torchvision B0): stem conv3x3 s2 →
MBConv[t,c,n,s,k]: (1,16,1,1,3) (6,24,2,2,3) (6,40,2,2,5) (6,80,3,2,3)
(6,112,3,1,5) (6,192,4,2,5) (6,320,1,1,3) → head conv1x1 1280.
Squeeze-excitation reduces to max(1, block_input_channels//4).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pixelbox_tpu.models.base import Embedder
from pixelbox_tpu.models.registry import register_embedder

# (expand_ratio, out_channels, num_blocks, stride, kernel)
B0_CONFIG: Sequence[Tuple[int, int, int, int, int]] = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)
STEM_CHANNELS = 32
HEAD_CHANNELS = 1280
BN_EPS = 1e-3  # torchvision BatchNorm2d eps for EfficientNet


class ConvBNAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.act:
            x = nn.silu(x)
        return x


class SqueezeExcite(nn.Module):
    squeeze_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze_channels, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    in_channels: int
    out_channels: int
    expand_ratio: int
    stride: int
    kernel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        expanded = self.in_channels * self.expand_ratio
        if self.expand_ratio != 1:
            x = ConvBNAct(
                expanded, kernel=1, dtype=self.dtype, name="expand"
            )(x)
        x = ConvBNAct(
            expanded,
            kernel=self.kernel,
            stride=self.stride,
            groups=expanded,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        x = SqueezeExcite(
            max(1, self.in_channels // 4), dtype=self.dtype, name="se"
        )(x)
        x = ConvBNAct(
            self.out_channels, kernel=1, act=False, dtype=self.dtype, name="project"
        )(x)
        if self.stride == 1 and self.in_channels == self.out_channels:
            # Stochastic depth is identity at inference.
            x = x + inp
        return x


class EfficientNetB0Features(nn.Module):
    """The `features` tower (train.py:31-36)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBNAct(
            STEM_CHANNELS, kernel=3, stride=2, dtype=self.dtype, name="stem"
        )(x)
        in_ch = STEM_CHANNELS
        for stage_idx, (t, c, n, s, k) in enumerate(B0_CONFIG):
            for block_idx in range(n):
                stride = s if block_idx == 0 else 1
                x = MBConv(
                    in_channels=in_ch,
                    out_channels=c,
                    expand_ratio=t,
                    stride=stride,
                    kernel=k,
                    dtype=self.dtype,
                    name=f"stage{stage_idx}_block{block_idx}",
                )(x)
                in_ch = c
        x = ConvBNAct(HEAD_CHANNELS, kernel=1, dtype=self.dtype, name="head")(x)
        return x


class EfficientNetEmbedderModule(nn.Module):
    """features → global avg pool → Linear(1280, latent) → tanh
    (train.py:37-46)."""

    latent_dim: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = EfficientNetB0Features(dtype=self.dtype, name="features")(x)
        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1) + Flatten
        # Head in f32 so tanh→quantize is bit-stable regardless of dtype.
        x = x.astype(jnp.float32)
        x = nn.Dense(self.latent_dim, dtype=jnp.float32, name="linear")(x)
        return jnp.tanh(x)


@register_embedder("efficientnet")
class EfficientNetEmbedder(Embedder):
    """Batched EfficientNet-B0 embedder.

    The reference's latent is 8 (efficientnet.rs:8, train.py:178); the
    benchmark configuration uses 128 — both are just ``dim`` here.
    """

    def __init__(
        self,
        dim: int = 8,
        input_size: int = 224,
        params: Optional[dict] = None,
        seed: int = 0,
        dtype: Any = jnp.float32,
        checkpoint_path: Optional[str] = None,
    ):
        self.dim = int(dim)
        self.input_size = int(input_size)
        self.module = EfficientNetEmbedderModule(latent_dim=self.dim, dtype=dtype)
        if params is None and checkpoint_path:
            if checkpoint_path.endswith(".onnx"):
                # The reference's deployable artifact (efficientnet.rs:5-14).
                from pixelbox_tpu.models.onnx_io import params_from_onnx

                params = params_from_onnx(checkpoint_path, latent_dim=self.dim)
            else:
                params = load_params(checkpoint_path)
        if params is None:
            dummy = jnp.zeros((1, self.input_size, self.input_size, 3), jnp.float32)
            variables = self.module.init(jax.random.PRNGKey(seed), dummy)
            params = variables
        self.variables = params
        self._fwd = jax.jit(
            lambda v, x: self.module.apply(v, x)
        )

    def embed_preprocessed(self, batch: jnp.ndarray) -> jnp.ndarray:
        return self._fwd(self.variables, batch)


# --------------------------------------------------------------------- #
# Checkpoint I/O + torch import


def save_params(variables, path: str) -> None:
    """Save Flax variables to .npz (flattened key paths)."""
    import flax

    flat = flax.traverse_util.flatten_dict(variables, sep="/")
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in flat.items()})


def load_params(path: str):
    import flax

    with np.load(path) as z:
        flat = {k: jnp.asarray(z[k]) for k in z.files}
    return flax.traverse_util.unflatten_dict(flat, sep="/")


def params_from_torch_state_dict(state_dict, latent_dim: int = 8):
    """Convert a torch state_dict of the reference's model (train.py:30-46:
    Sequential[features, pool, flatten, linear, tanh]) into Flax variables.

    Accepts either the plain ``torchvision efficientnet_b0().features``
    prefix layout (``0.*`` … ``8.*`` under ``features.`` or ``0.``) as
    produced by the reference's Sequential wrapper.
    """
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}
    # Normalize prefix: reference Sequential puts features at "0.".
    if any(k.startswith("features.") for k in sd):
        feat = {k[len("features."):]: v for k, v in sd.items() if k.startswith("features.")}
    else:
        feat = {k[2:]: v for k, v in sd.items() if k.startswith("0.")}

    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(value)

    def conv_w(v):  # torch OIHW → flax HWIO
        return np.transpose(v, (2, 3, 1, 0))

    def dw_conv_w(v):  # torch depthwise (C,1,H,W) → flax HWIO with groups
        return np.transpose(v, (2, 3, 1, 0))

    def import_convbn(src_prefix, dst_path, depthwise=False):
        w = feat[f"{src_prefix}.0.weight"]
        put(params, dst_path + ("conv", "kernel"), dw_conv_w(w) if depthwise else conv_w(w))
        put(params, dst_path + ("bn", "scale"), feat[f"{src_prefix}.1.weight"])
        put(params, dst_path + ("bn", "bias"), feat[f"{src_prefix}.1.bias"])
        put(batch_stats, dst_path + ("bn", "mean"), feat[f"{src_prefix}.1.running_mean"])
        put(batch_stats, dst_path + ("bn", "var"), feat[f"{src_prefix}.1.running_var"])

    # Stem: features[0]
    import_convbn("0", ("features", "stem"))

    # Stages: features[1..7], each a list of MBConv blocks.
    for stage_idx, (t, c, n, s, k) in enumerate(B0_CONFIG):
        for block_idx in range(n):
            tv = f"{stage_idx + 1}.{block_idx}.block"
            dst = ("features", f"stage{stage_idx}_block{block_idx}")
            layer = 0
            if t != 1:
                import_convbn(f"{tv}.{layer}", dst + ("expand",))
                layer += 1
            import_convbn(f"{tv}.{layer}", dst + ("depthwise",), depthwise=True)
            layer += 1
            # SE block: .fc1/.fc2 convs
            put(params, dst + ("se", "fc1", "kernel"), conv_w(feat[f"{tv}.{layer}.fc1.weight"]))
            put(params, dst + ("se", "fc1", "bias"), feat[f"{tv}.{layer}.fc1.bias"])
            put(params, dst + ("se", "fc2", "kernel"), conv_w(feat[f"{tv}.{layer}.fc2.weight"]))
            put(params, dst + ("se", "fc2", "bias"), feat[f"{tv}.{layer}.fc2.bias"])
            layer += 1
            import_convbn(f"{tv}.{layer}", dst + ("project",))

    # Head: features[8]
    import_convbn("8", ("features", "head"))

    # Linear head: reference Sequential index 3 ("3.weight"/"3.bias").
    if "3.weight" in sd:
        put(params, ("linear", "kernel"), np.transpose(sd["3.weight"]))
        put(params, ("linear", "bias"), sd["3.bias"])
    else:
        # No trained head in a bare torchvision checkpoint — random init.
        rng = np.random.default_rng(0)
        put(
            params,
            ("linear", "kernel"),
            rng.normal(0, 0.02, (HEAD_CHANNELS, latent_dim)).astype(np.float32),
        )
        put(params, ("linear", "bias"), np.zeros(latent_dim, np.float32))

    return {"params": params, "batch_stats": batch_stats}
