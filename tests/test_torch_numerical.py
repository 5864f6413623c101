"""Numerical parity: Flax EfficientNet vs an independent torch forward.

Builds the torch side functionally (F.conv2d/F.batch_norm per the
torchvision B0 spec) from the SAME synthetic state_dict the importer
consumes, and checks outputs agree — catches kernel transposes, padding
conventions, BN parameterization, SE wiring, and residual placement.
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from pixelbox_tpu.models.efficientnet import (
    B0_CONFIG,
    EfficientNetEmbedderModule,
    params_from_torch_state_dict,
)

from test_torch_import import synth_torchvision_state_dict

BN_EPS = 1e-3


def torch_forward(sd, x_nchw):
    import torch.nn.functional as F

    t = lambda k: torch.from_numpy(np.asarray(sd[k]))

    def convbn(x, p, stride=1, groups=1, act=True):
        w = t(f"{p}.0.weight")
        x = F.conv2d(x, w, None, stride=stride, padding=w.shape[-1] // 2,
                     groups=groups)
        x = F.batch_norm(
            x, t(f"{p}.1.running_mean"), t(f"{p}.1.running_var"),
            t(f"{p}.1.weight"), t(f"{p}.1.bias"), training=False, eps=BN_EPS,
        )
        return F.silu(x) if act else x

    x = convbn(x_nchw, "0.0", stride=2)
    in_ch = x.shape[1]
    for stage_idx, (texp, c, n, s, k) in enumerate(B0_CONFIG):
        for block_idx in range(n):
            stride = s if block_idx == 0 else 1
            pre = f"0.{stage_idx + 1}.{block_idx}.block"
            inp = x
            layer = 0
            expanded = in_ch * texp
            if texp != 1:
                x = convbn(x, f"{pre}.{layer}")
                layer += 1
            x = convbn(x, f"{pre}.{layer}", stride=stride, groups=expanded)
            layer += 1
            se = x.mean((2, 3), keepdim=True)
            se = F.silu(F.conv2d(se, t(f"{pre}.{layer}.fc1.weight"),
                                 t(f"{pre}.{layer}.fc1.bias")))
            se = torch.sigmoid(F.conv2d(se, t(f"{pre}.{layer}.fc2.weight"),
                                        t(f"{pre}.{layer}.fc2.bias")))
            x = x * se
            layer += 1
            x = convbn(x, f"{pre}.{layer}", act=False)
            if stride == 1 and in_ch == c:
                x = x + inp
            in_ch = c
    x = convbn(x, "0.8")
    x = x.mean((2, 3))
    x = F.linear(x, t("3.weight"), t("3.bias"))
    return torch.tanh(x)


def test_flax_matches_torch_forward():
    sd = synth_torchvision_state_dict(latent=8, seed=1)
    variables = params_from_torch_state_dict(sd, latent_dim=8)
    module = EfficientNetEmbedderModule(latent_dim=8)

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, size=(2, 64, 64, 3)).astype(np.float32)

    flax_out = np.asarray(module.apply(variables, jnp.asarray(img)))
    with torch.no_grad():
        torch_out = torch_forward(
            sd, torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
        ).numpy()

    np.testing.assert_allclose(flax_out, torch_out, rtol=1e-4, atol=1e-5)
