"""EfficientNet torch-state_dict import: structural parity.

torchvision isn't installed here, so the test synthesizes a state_dict
with torchvision's exact key layout and shapes and checks the converter
produces a variables pytree identical in structure/shapes to our module's
init — i.e. a real checkpoint would drop in cleanly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixelbox_tpu.models.efficientnet import (
    B0_CONFIG,
    STEM_CHANNELS,
    HEAD_CHANNELS,
    EfficientNetEmbedderModule,
    params_from_torch_state_dict,
)


def synth_torchvision_state_dict(latent=8, seed=0):
    """Keys/shapes exactly as `efficientnet_b0().features` under the
    reference's Sequential wrapper (train.py:37-43): features at '0.',
    linear head at '3.'."""
    rng = np.random.default_rng(seed)
    sd = {}
    s = 0.05  # small magnitudes so 20 random layers don't overflow f32

    def convbn(prefix, cin, cout, k, groups=1):
        sd[f"{prefix}.0.weight"] = (
            s * rng.normal(size=(cout, cin // groups, k, k))
        ).astype(np.float32)
        sd[f"{prefix}.1.weight"] = np.ones(cout, np.float32)
        sd[f"{prefix}.1.bias"] = np.zeros(cout, np.float32)
        sd[f"{prefix}.1.running_mean"] = np.zeros(cout, np.float32)
        sd[f"{prefix}.1.running_var"] = np.ones(cout, np.float32)

    convbn("0.0", 3, STEM_CHANNELS, 3)
    in_ch = STEM_CHANNELS
    for stage_idx, (t, c, n, s, k) in enumerate(B0_CONFIG):
        for block_idx in range(n):
            pre = f"0.{stage_idx + 1}.{block_idx}.block"
            layer = 0
            expanded = in_ch * t
            if t != 1:
                convbn(f"{pre}.{layer}", in_ch, expanded, 1)
                layer += 1
            convbn(f"{pre}.{layer}", expanded, expanded, k, groups=expanded)
            layer += 1
            sq = max(1, in_ch // 4)
            sd[f"{pre}.{layer}.fc1.weight"] = (
                s * rng.normal(size=(sq, expanded, 1, 1))
            ).astype(np.float32)
            sd[f"{pre}.{layer}.fc1.bias"] = rng.normal(size=(sq,)).astype(np.float32)
            sd[f"{pre}.{layer}.fc2.weight"] = (
                s * rng.normal(size=(expanded, sq, 1, 1))
            ).astype(np.float32)
            sd[f"{pre}.{layer}.fc2.bias"] = rng.normal(size=(expanded,)).astype(
                np.float32
            )
            layer += 1
            convbn(f"{pre}.{layer}", expanded, c, 1)
            in_ch = c
    convbn("0.8", in_ch, HEAD_CHANNELS, 1)
    sd["3.weight"] = (s * rng.normal(size=(latent, HEAD_CHANNELS))).astype(np.float32)
    sd["3.bias"] = rng.normal(size=(latent,)).astype(np.float32)
    return sd


def tree_shapes(tree):
    return jax.tree_util.tree_map(lambda x: tuple(x.shape), tree)


def test_import_structure_matches_init():
    sd = synth_torchvision_state_dict(latent=8)
    imported = params_from_torch_state_dict(sd, latent_dim=8)

    module = EfficientNetEmbedderModule(latent_dim=8)
    ref = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    assert tree_shapes(imported["params"]) == tree_shapes(ref["params"])
    assert tree_shapes(imported["batch_stats"]) == tree_shapes(ref["batch_stats"])


def test_imported_params_run_forward():
    sd = synth_torchvision_state_dict(latent=8)
    variables = params_from_torch_state_dict(sd, latent_dim=8)
    module = EfficientNetEmbedderModule(latent_dim=8)
    out = module.apply(variables, jnp.zeros((2, 64, 64, 3)))
    assert out.shape == (2, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_linear_head_weights_transposed_correctly():
    sd = synth_torchvision_state_dict(latent=8)
    variables = params_from_torch_state_dict(sd, latent_dim=8)
    np.testing.assert_allclose(
        np.asarray(variables["params"]["linear"]["kernel"]),
        np.transpose(sd["3.weight"]),
    )
