"""Arbitrary-ONNX execution: the JAX graph interpreter + onnx embedder.

The reference's contract is "drop in your own trained ONNX and the app
runs it" (README.md:51-59; tract executes any graph,
src/image_hashes/efficientnet.rs:10-14).  These tests build NON-B0 models
— via our own writer primitives and via a real torch.onnx export — and
run them end-to-end.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pixelbox_tpu.models.onnx_io import (
    _attr,
    _field_bytes,
    _field_varint,
    _node,
    _tensor,
    _value_info,
    read_onnx,
)
from pixelbox_tpu.models.onnx_graph import OnnxGraphModel


def _write_model(path, nodes, inits, inputs, outputs):
    graph = b"".join(_field_bytes(1, n) for n in nodes)
    graph += _field_bytes(2, b"test_graph")
    graph += b"".join(_field_bytes(5, t) for t in inits)
    for name, shape in inputs:
        graph += _field_bytes(11, _value_info(name, shape))
    for name, shape in outputs:
        graph += _field_bytes(12, _value_info(name, shape))
    model = _field_varint(1, 6)
    model += _field_bytes(2, b"pixelbox-test")
    model += _field_bytes(7, graph)
    model += _field_bytes(8, _field_varint(2, 11))
    with open(path, "wb") as f:
        f.write(model)


def _build_tiny_cnn(path, rng, latent=16):
    """3-conv net that is NOT EfficientNet-shaped: Conv-Relu-MaxPool ->
    Conv-BN-Relu -> Conv -> GlobalAveragePool -> Flatten -> Gemm -> Tanh."""
    w1 = rng.standard_normal((8, 3, 3, 3)).astype(np.float32) * 0.2
    b1 = rng.standard_normal(8).astype(np.float32) * 0.1
    w2 = rng.standard_normal((12, 8, 3, 3)).astype(np.float32) * 0.2
    bn_scale = rng.uniform(0.5, 1.5, 12).astype(np.float32)
    bn_bias = rng.standard_normal(12).astype(np.float32) * 0.1
    bn_mean = rng.standard_normal(12).astype(np.float32) * 0.1
    bn_var = rng.uniform(0.5, 2.0, 12).astype(np.float32)
    w3 = rng.standard_normal((16, 12, 1, 1)).astype(np.float32) * 0.3
    wg = rng.standard_normal((latent, 16)).astype(np.float32) * 0.3
    bg = rng.standard_normal(latent).astype(np.float32) * 0.1

    nodes = [
        _node("Conv", ["input", "w1", "b1"], ["c1"], [
            _attr("strides", ints=[2, 2]), _attr("pads", ints=[1, 1, 1, 1]),
            _attr("kernel_shape", ints=[3, 3]),
        ]),
        _node("Relu", ["c1"], ["r1"]),
        _node("MaxPool", ["r1"], ["p1"], [
            _attr("kernel_shape", ints=[2, 2]), _attr("strides", ints=[2, 2]),
        ]),
        _node("Conv", ["p1", "w2"], ["c2"], [
            _attr("pads", ints=[1, 1, 1, 1]), _attr("kernel_shape", ints=[3, 3]),
        ]),
        _node("BatchNormalization",
              ["c2", "bns", "bnb", "bnm", "bnv"], ["bn2"],
              [_attr("epsilon", f=1e-5)]),
        _node("Relu", ["bn2"], ["r2"]),
        _node("Conv", ["r2", "w3"], ["c3"], [
            _attr("kernel_shape", ints=[1, 1]),
        ]),
        _node("GlobalAveragePool", ["c3"], ["g"]),
        _node("Flatten", ["g"], ["f"], [_attr("axis", i=1)]),
        _node("Gemm", ["f", "wg", "bg"], ["gm"], [_attr("transB", i=1)]),
        _node("Tanh", ["gm"], ["output"]),
    ]
    inits = [
        _tensor("w1", w1), _tensor("b1", b1), _tensor("w2", w2),
        _tensor("bns", bn_scale), _tensor("bnb", bn_bias),
        _tensor("bnm", bn_mean), _tensor("bnv", bn_var),
        _tensor("w3", w3), _tensor("wg", wg), _tensor("bg", bg),
    ]
    _write_model(
        path, nodes, inits,
        [("input", ["batch", 3, 32, 32])], [("output", ["batch", latent])],
    )
    weights = dict(w1=w1, b1=b1, w2=w2, bns=bn_scale, bnb=bn_bias,
                   bnm=bn_mean, bnv=bn_var, w3=w3, wg=wg, bg=bg)
    return weights


def _reference_forward(x, w):
    """Manual numpy/jnp forward of the tiny CNN (independent of the
    interpreter's op implementations where possible)."""
    import jax

    def conv(x, k, b=None, stride=1, pad=0):
        out = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(k), (stride, stride),
            ((pad, pad), (pad, pad)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        if b is not None:
            out = out + jnp.asarray(b)[None, :, None, None]
        return out

    h = conv(x, w["w1"], w["b1"], stride=2, pad=1)
    h = jnp.maximum(h, 0)
    h = jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
        ((0, 0), (0, 0), (0, 0), (0, 0)),
    )
    h = conv(h, w["w2"], pad=1)
    inv = 1.0 / np.sqrt(w["bnv"] + 1e-5)
    h = (h - w["bnm"][None, :, None, None]) * (
        (w["bns"] * inv)[None, :, None, None]
    ) + w["bnb"][None, :, None, None]
    h = jnp.maximum(h, 0)
    h = conv(h, w["w3"])
    h = jnp.mean(h, axis=(2, 3))
    h = h @ w["wg"].T + w["bg"]
    return np.tanh(np.asarray(h))


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    rng = np.random.default_rng(5)
    path = str(tmp_path_factory.mktemp("onnx") / "tiny.onnx")
    weights = _build_tiny_cnn(path, rng)
    return path, weights


def test_reader_full_graph(tiny_model):
    path, _ = tiny_model
    m = read_onnx(path)
    assert [n["op"] for n in m["nodes"]][:3] == ["Conv", "Relu", "MaxPool"]
    assert m["inputs"] == ["input"]
    assert m["outputs"] == ["output"]
    assert m["nodes"][0]["attrs"]["strides"] == [2, 2]


def test_interpreter_matches_reference(tiny_model):
    path, weights = tiny_model
    model = OnnxGraphModel(path)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, size=(2, 3, 32, 32)).astype(np.float32)
    got = np.asarray(model(jnp.asarray(x)))
    exp = _reference_forward(x, weights)
    np.testing.assert_allclose(got, exp, rtol=2e-5, atol=2e-5)
    assert model.latent_dim == 16


def test_unsupported_op_is_loud(tmp_path):
    nodes = [_node("NonexistentOp", ["input"], ["output"])]
    path = str(tmp_path / "bad.onnx")
    _write_model(path, nodes, [], [("input", [1, 4])], [("output", [1, 4])])
    with pytest.raises(ValueError, match="NonexistentOp"):
        OnnxGraphModel(path)


def test_onnx_embedder_non_b0(tiny_model):
    """A NON-B0 user model embeds through the generic embedder."""
    from pixelbox_tpu.models import get_embedder

    path, _ = tiny_model
    emb = get_embedder("onnx", model=path, input_size=32)
    assert emb.backend == "jax-interpreter"
    assert emb.dim == 16
    batch = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (3, 32, 32, 3)), jnp.float32
    )
    z = np.asarray(emb.embed_preprocessed(batch))
    assert z.shape == (3, 16)
    assert np.abs(z).max() <= 1.0  # tanh-bounded


def test_onnx_embedder_b0_fast_path(tmp_path):
    """An image_similarity.onnx-shaped export takes the Flax fast path."""
    from pixelbox_tpu.models import get_embedder
    from pixelbox_tpu.models.efficientnet import EfficientNetEmbedder
    from pixelbox_tpu.models.onnx_io import export_onnx

    native = EfficientNetEmbedder(dim=8, input_size=64, seed=3)
    path = str(tmp_path / "image_similarity.onnx")
    export_onnx(native.variables, path, input_size=64)
    emb = get_embedder("onnx", model=path, input_size=64)
    assert emb.backend == "flax-b0"
    assert emb.dim == 8


def test_engine_end_to_end_with_user_onnx(tiny_model, tmp_path):
    """Engine(embedder='onnx', model=...) indexes and self-matches — the
    reference's user-moddable contract (README.md:51-59) end-to-end."""
    from PIL import Image

    from fixtures import textured_image
    from pixelbox_tpu.engine import Engine

    path, _ = tiny_model
    photos = tmp_path / "photos"
    photos.mkdir()
    for i in range(3):
        Image.fromarray(textured_image(seed=i, size=(48, 48))).save(
            photos / f"im{i}.png"
        )
    eng = Engine.new(
        str(tmp_path / "lib.db"),
        embedder="onnx",
        embedder_kwargs={"model": path, "input_size": 32},
    )
    eng.add_tracked_folder(str(photos))
    eng.start_indexing(num_workers=2)
    eng.wait_for_indexing()
    assert eng.get_num_indexed_images() == 3
    eng.query_by_image_hash_from_file(str(photos / "im1.png"))
    results = eng.get_query_results()
    assert results and results[0].path.endswith("im1.png")
    assert results[0].distance_from_query < 1e-5
    eng.close()


def test_torch_export_cross_check(tmp_path):
    """A REAL torch.onnx export (different producer, dynamic shapes,
    Shape/Gather machinery) runs and matches torch's own forward."""
    torch = pytest.importorskip("torch")

    class Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = torch.nn.Conv2d(3, 6, 5, stride=2, padding=2)
            self.c2 = torch.nn.Conv2d(6, 10, 3, padding=1, bias=False)
            self.bn = torch.nn.BatchNorm2d(10)
            self.fc = torch.nn.Linear(10, 12)

        def forward(self, x):
            h = torch.relu(self.c1(x))
            h = torch.nn.functional.avg_pool2d(h, 2)
            h = torch.relu(self.bn(self.c2(h)))
            h = h.mean(dim=(2, 3))
            return torch.tanh(self.fc(h))

    net = Net().eval()
    path = str(tmp_path / "torch_net.onnx")
    x = torch.randn(2, 3, 32, 32)
    try:
        try:
            torch.onnx.export(
                net, (x,), path, opset_version=11,
                input_names=["input"], output_names=["output"],
                dynamic_axes={"input": {0: "batch"}, "output": {0: "batch"}},
                dynamo=False,
            )
        except TypeError:
            torch.onnx.export(
                net, (x,), path, opset_version=11,
                input_names=["input"], output_names=["output"],
                dynamic_axes={"input": {0: "batch"}, "output": {0: "batch"}},
            )
    except Exception as e:  # torch's exporter needs the onnx package
        pytest.skip(f"torch.onnx.export unavailable here: {e}")
    with torch.no_grad():
        exp = net(x).numpy()
    model = OnnxGraphModel(path)
    got = np.asarray(model(jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, exp, rtol=3e-5, atol=3e-5)


def test_negative_axis_attributes(tmp_path):
    """Protobuf encodes negative int64 attributes as huge varints; the
    reader must sign-fold them (Softmax axis=-1 appears in every
    transformer export — round-3 review finding)."""
    rng = np.random.default_rng(3)
    w = rng.standard_normal((6, 5)).astype(np.float32)
    nodes = [
        _node("MatMul", ["input", "w"], ["m"]),
        _node("Softmax", ["m"], ["sm"], [_attr("axis", i=-1)]),
        _node("ReduceMean", ["sm"], ["output"],
              [_attr("axes", ints=[-1]), _attr("keepdims", i=0)]),
    ]
    path = str(tmp_path / "negaxis.onnx")
    _write_model(path, nodes, [_tensor("w", w)],
                 [("input", [2, 6])], [("output", [2])])
    m = read_onnx(path)
    assert m["nodes"][1]["attrs"]["axis"] == -1
    assert m["nodes"][2]["attrs"]["axes"] == [-1]
    model = OnnxGraphModel(path)
    x = rng.standard_normal((2, 6)).astype(np.float32)
    got = np.asarray(model(jnp.asarray(x)))
    import scipy.special

    exp = scipy.special.softmax(x @ w, axis=-1).mean(axis=-1)
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)
