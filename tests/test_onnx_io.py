"""ONNX import/export (the reference's deployable artifact path).

VERDICT round-1 'Done' criteria: train 1 step → export → import →
bit-identical embeddings; plus loading a synthetic ONNX matching
efficientnet.rs:5-14's contract."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixelbox_tpu.models.efficientnet import (
    EfficientNetEmbedder,
    EfficientNetEmbedderModule,
    params_from_torch_state_dict,
)
from pixelbox_tpu.models.onnx_io import (
    export_onnx,
    params_from_onnx,
    read_onnx,
)

from test_torch_import import synth_torchvision_state_dict


@pytest.fixture(scope="module")
def variables():
    return params_from_torch_state_dict(
        synth_torchvision_state_dict(latent=8, seed=3), latent_dim=8
    )


@pytest.fixture(scope="module")
def onnx_path(variables, tmp_path_factory):
    p = tmp_path_factory.mktemp("onnx") / "image_similarity.onnx"
    export_onnx(variables, str(p), input_size=64)
    return str(p)


def test_exported_contract(onnx_path):
    """Opset 11, the op set tract's loader handles, named input/output —
    the efficientnet.rs:5-14 / train.py:167-174 contract."""
    model = read_onnx(onnx_path)
    assert model["opset"] == 11
    assert model["producer"] == "pixelbox-tpu"
    ops = set(model["op_types"])
    assert {"Conv", "BatchNormalization", "Sigmoid", "Mul",
            "GlobalAveragePool", "Flatten", "Gemm", "Tanh"} <= ops
    assert not ops - {"Conv", "BatchNormalization", "Sigmoid", "Mul",
                      "GlobalAveragePool", "Flatten", "Gemm", "Tanh", "Add"}
    # Initializers carry the torch Sequential state_dict names.
    inits = model["initializers"]
    assert "0.0.0.weight" in inits      # stem conv
    assert "3.weight" in inits          # linear head
    assert inits["3.weight"].shape == (8, 1280)


def test_roundtrip_bit_identical(variables, onnx_path):
    imported = params_from_onnx(onnx_path, latent_dim=8)

    flat_a = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(imported)[0]
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
    for (ka, va), (_, vb) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(vb), err_msg=str(ka)
        )

    # Embeddings bit-identical (same params, same program).
    module = EfficientNetEmbedderModule(latent_dim=8)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    )
    za = np.asarray(module.apply(variables, x))
    zb = np.asarray(module.apply(imported, x))
    np.testing.assert_array_equal(za, zb)


def test_embedder_loads_onnx_checkpoint(onnx_path):
    emb = EfficientNetEmbedder(dim=8, input_size=64, checkpoint_path=onnx_path)
    z = emb.embed_preprocessed(jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert z.shape == (1, 8)
    assert np.all(np.isfinite(np.asarray(z)))


def test_head_found_by_shape_when_renamed(variables, tmp_path):
    """Exporters sometimes mangle initializer names (e.g. onnx::Gemm_123);
    the head must still be identified by its [latent, 1280] shape."""
    import re

    src = tmp_path / "m.onnx"
    export_onnx(variables, str(src), input_size=64)
    data = src.read_bytes()
    # Rename the Gemm initializers (same byte lengths keep offsets valid).
    data = data.replace(b"\x08" + b"3.weight", b"\x08" + b"gemm_w_z", 1)
    data = data.replace(b"\x06" + b"3.bias", b"\x06" + b"gemm_b", 1)
    dst = tmp_path / "renamed.onnx"
    dst.write_bytes(data)
    imported = params_from_onnx(str(dst))
    np.testing.assert_array_equal(
        np.asarray(imported["params"]["linear"]["kernel"]),
        np.asarray(variables["params"]["linear"]["kernel"]),
    )


def test_train_step_then_finalize_roundtrip(tmp_path):
    """train 1 step → finalize → import ONNX → bit-identical embeddings."""
    from PIL import Image

    from pixelbox_tpu.parallel.mesh import make_mesh
    from pixelbox_tpu.training.train import TrainConfig, finalize, train_loop

    from fixtures import textured_image

    d = tmp_path / "imgs"
    d.mkdir()
    for s in range(3):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            d / f"t{s}.png"
        )
    cfg = TrainConfig(latent_dim=4, input_size=32, batch_size=4)
    mesh = make_mesh(4, axis_names=("data", "model"), shape=(2, 2))
    state, losses = train_loop(
        [str(d / f"t{s}.png") for s in range(3)], cfg, mesh,
        epochs=1, steps_per_epoch=1, checkpoint_dir=str(tmp_path / "ckpt"),
    )
    out = finalize(state, str(tmp_path / "bundle"), cfg)

    import json
    import os

    meta = json.load(open(os.path.join(out, "model.json")))
    assert meta["format"] == "pixelbox-tpu-model"
    assert meta["latent_dim"] == 4
    logs = [f for f in os.listdir(tmp_path / "ckpt")
            if f.startswith("experiment_log_")]
    assert len(logs) == 1
    log = json.load(open(tmp_path / "ckpt" / logs[0]))
    assert log["config"]["latent_dim"] == 4 and len(log["losses"]) == 1

    imported = params_from_onnx(
        os.path.join(out, "image_similarity.onnx"), latent_dim=4
    )
    module = EfficientNetEmbedderModule(latent_dim=4)
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    )
    want = np.asarray(module.apply(
        jax.tree.map(np.asarray, state.variables), x
    ))
    got = np.asarray(module.apply(imported, x))
    np.testing.assert_array_equal(want, got)
