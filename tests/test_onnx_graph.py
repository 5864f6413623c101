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




# --- ViT / attention graphs (the nomic-style op profile) ---------------
#
# The reference's alternative embedder feeds a real ViT export
# (nomic_embed_vision_v1_5_int8.onnx, a 197×768 token-grid output) to
# tract (src/image_hashes/nomic.rs:7-19).  A user bringing such a model
# here needs the interpreter to run the transformer op profile: batched
# 4-D attention MatMuls, Softmax(axis=-1), Transpose/Reshape head
# splitting, the opset-11 LayerNorm decomposition, and GELU-via-Erf.
# torch.onnx.export needs the `onnx` pip package (absent in this image),
# so the graph is built with the repo's own writer primitives and
# cross-checked against a hand numpy implementation.

def _build_vit_block(path, rng, size=32, patch=8, hidden=8, heads=2):
    """Patch-embed Conv + pos-add + one encoder block → [B, T, H]."""
    T = (size // patch) ** 2
    dh = hidden // heads
    p = {
        "Wp": rng.standard_normal((hidden, 3, patch, patch)).astype(np.float32) * 0.2,
        "bp": rng.standard_normal(hidden).astype(np.float32) * 0.1,
        "pos": rng.standard_normal((1, T, hidden)).astype(np.float32) * 0.3,
        "g1": rng.uniform(0.5, 1.5, hidden).astype(np.float32),
        "c1": rng.standard_normal(hidden).astype(np.float32) * 0.1,
        "Wq": rng.standard_normal((hidden, hidden)).astype(np.float32) * 0.3,
        "Wk": rng.standard_normal((hidden, hidden)).astype(np.float32) * 0.3,
        "Wv": rng.standard_normal((hidden, hidden)).astype(np.float32) * 0.3,
        "Wo": rng.standard_normal((hidden, hidden)).astype(np.float32) * 0.3,
        "bo": rng.standard_normal(hidden).astype(np.float32) * 0.1,
        "g2": rng.uniform(0.5, 1.5, hidden).astype(np.float32),
        "c2": rng.standard_normal(hidden).astype(np.float32) * 0.1,
        "W1": rng.standard_normal((hidden, 2 * hidden)).astype(np.float32) * 0.3,
        "b1": rng.standard_normal(2 * hidden).astype(np.float32) * 0.1,
        "W2": rng.standard_normal((2 * hidden, hidden)).astype(np.float32) * 0.3,
        "b2": rng.standard_normal(hidden).astype(np.float32) * 0.1,
    }
    consts = {
        "eps": np.float32(1e-5), "sqrt2": np.float32(np.sqrt(2.0)),
        "one": np.float32(1.0), "half": np.float32(0.5),
        "scale": np.float32(1.0 / np.sqrt(dh)),
        "shape_qkv": np.array([0, T, heads, dh], dtype=np.int64),
        "shape_merge": np.array([0, T, hidden], dtype=np.int64),
        "shape_tok": np.array([0, hidden, T], dtype=np.int64),
    }

    def ln(nodes, x, g, c, out):
        nodes += [
            _node("ReduceMean", [x], [f"{out}_mu"],
                  [_attr("axes", ints=[-1]), _attr("keepdims", i=1)]),
            _node("Sub", [x, f"{out}_mu"], [f"{out}_xc"]),
            _node("Mul", [f"{out}_xc", f"{out}_xc"], [f"{out}_x2"]),
            _node("ReduceMean", [f"{out}_x2"], [f"{out}_var"],
                  [_attr("axes", ints=[-1]), _attr("keepdims", i=1)]),
            _node("Add", [f"{out}_var", "eps"], [f"{out}_ve"]),
            _node("Sqrt", [f"{out}_ve"], [f"{out}_sd"]),
            _node("Div", [f"{out}_xc", f"{out}_sd"], [f"{out}_xn"]),
            _node("Mul", [f"{out}_xn", g], [f"{out}_xs"]),
            _node("Add", [f"{out}_xs", c], [out]),
        ]

    def head_split(nodes, x, out):
        nodes += [
            _node("Reshape", [x, "shape_qkv"], [f"{out}_4d"]),
            _node("Transpose", [f"{out}_4d"], [out],
                  [_attr("perm", ints=[0, 2, 1, 3])]),
        ]

    nodes = [
        _node("Conv", ["input", "Wp", "bp"], ["pe"],
              [_attr("strides", ints=[patch, patch]),
               _attr("kernel_shape", ints=[patch, patch])]),
        _node("Reshape", ["pe", "shape_tok"], ["pr"]),
        _node("Transpose", ["pr"], ["tok"], [_attr("perm", ints=[0, 2, 1])]),
        _node("Add", ["tok", "pos"], ["h0"]),
    ]
    ln(nodes, "h0", "g1", "c1", "n1")
    nodes += [
        _node("MatMul", ["n1", "Wq"], ["q"]),
        _node("MatMul", ["n1", "Wk"], ["kk"]),
        _node("MatMul", ["n1", "Wv"], ["v"]),
    ]
    head_split(nodes, "q", "qh")
    head_split(nodes, "kk", "kh")
    head_split(nodes, "v", "vh")
    nodes += [
        _node("Transpose", ["kh"], ["khT"], [_attr("perm", ints=[0, 1, 3, 2])]),
        _node("MatMul", ["qh", "khT"], ["scores"]),
        _node("Mul", ["scores", "scale"], ["sc"]),
        _node("Softmax", ["sc"], ["aw"], [_attr("axis", i=-1)]),
        _node("MatMul", ["aw", "vh"], ["ctx"]),
        _node("Transpose", ["ctx"], ["ctxT"], [_attr("perm", ints=[0, 2, 1, 3])]),
        _node("Reshape", ["ctxT", "shape_merge"], ["ctx2"]),
        _node("MatMul", ["ctx2", "Wo"], ["ao0"]),
        _node("Add", ["ao0", "bo"], ["ao"]),
        _node("Add", ["h0", "ao"], ["h1"]),
    ]
    ln(nodes, "h1", "g2", "c2", "n2")
    nodes += [
        _node("MatMul", ["n2", "W1"], ["m0"]),
        _node("Add", ["m0", "b1"], ["m1"]),
        # GELU(x) = 0.5·x·(1 + erf(x/√2)) — the opset-11 decomposition.
        _node("Div", ["m1", "sqrt2"], ["ge0"]),
        _node("Erf", ["ge0"], ["ge1"]),
        _node("Add", ["ge1", "one"], ["ge2"]),
        _node("Mul", ["m1", "ge2"], ["ge3"]),
        _node("Mul", ["ge3", "half"], ["gelu"]),
        _node("MatMul", ["gelu", "W2"], ["mm0"]),
        _node("Add", ["mm0", "b2"], ["mm1"]),
        _node("Add", ["h1", "mm1"], ["output"]),
    ]
    inits = [_tensor(k, v) for k, v in {**p, **consts}.items()]
    _write_model(path, nodes, inits, [("input", [1, 3, size, size])],
                 [("output", [1, T, hidden])])
    return p, T, heads, dh


def _vit_reference_np(p, x_nchw, patch, heads, dh):
    """Hand numpy forward of the same block (the oracle)."""
    def lnorm(x, g, c):
        mu = x.mean(-1, keepdims=True)
        xc = x - mu
        sd = np.sqrt((xc * xc).mean(-1, keepdims=True) + np.float32(1e-5))
        return (xc / sd) * g + c

    B, _, S, _ = x_nchw.shape
    hidden = p["Wp"].shape[0]
    n = S // patch
    # Conv stride=patch == per-patch projection.
    pe = np.zeros((B, hidden, n, n), dtype=np.float32)
    for i in range(n):
        for j in range(n):
            blk = x_nchw[:, :, i*patch:(i+1)*patch, j*patch:(j+1)*patch]
            pe[:, :, i, j] = np.einsum("bchw,ochw->bo", blk, p["Wp"]) + p["bp"]
    tok = pe.reshape(B, hidden, n * n).transpose(0, 2, 1)
    h0 = tok + p["pos"]
    n1 = lnorm(h0, p["g1"], p["c1"])
    T = n * n

    def split(z):
        return z.reshape(B, T, heads, dh).transpose(0, 2, 1, 3)

    q, k, v = split(n1 @ p["Wq"]), split(n1 @ p["Wk"]), split(n1 @ p["Wv"])
    sc = (q @ k.transpose(0, 1, 3, 2)) * np.float32(1.0 / np.sqrt(dh))
    sc = sc - sc.max(-1, keepdims=True)
    aw = np.exp(sc); aw /= aw.sum(-1, keepdims=True)
    ctx = (aw @ v).transpose(0, 2, 1, 3).reshape(B, T, hidden)
    h1 = h0 + (ctx @ p["Wo"] + p["bo"])
    n2 = lnorm(h1, p["g2"], p["c2"])
    m1 = n2 @ p["W1"] + p["b1"]
    from scipy.special import erf
    gelu = 0.5 * m1 * (1.0 + erf(m1 / np.sqrt(2.0)))
    return h1 + (gelu @ p["W2"] + p["b2"])


def test_vit_attention_block_matches_numpy(tmp_path):
    """The full transformer op profile — 4-D attention MatMuls, head
    split/merge reshapes, Softmax(-1), LayerNorm decomposition, Erf-GELU
    — through the interpreter, vs a hand numpy oracle."""
    pytest.importorskip("scipy")
    rng = np.random.default_rng(42)
    path = str(tmp_path / "vit_block.onnx")
    p, T, heads, dh = _build_vit_block(path, rng)
    model = OnnxGraphModel(path)
    x = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    got = np.asarray(model(jnp.asarray(x)))
    exp = _vit_reference_np(p, x, patch=8, heads=heads, dh=dh)
    assert got.shape == (2, T, p["Wp"].shape[0])  # token grid, not flat
    np.testing.assert_allclose(got, exp, rtol=2e-4, atol=2e-5)


def test_nomic_embedder_runs_user_vit_onnx(tmp_path):
    """NomicEmbedder(checkpoint_path=<user ViT .onnx>) embeds end-to-end:
    the [B, T, H] token grid mean-pools to the model's OWN hidden width
    (discovered by shape tracing — not assumed to be nomic's 768) and
    projects to the configured hash width, deterministically."""
    pytest.importorskip("scipy")
    from pixelbox_tpu.models.nomic import NomicEmbedder

    rng = np.random.default_rng(7)
    path = str(tmp_path / "user_vit.onnx")
    p, T, heads, dh = _build_vit_block(path, rng)

    emb = NomicEmbedder(dim=16, input_size=32, checkpoint_path=path)
    batch = rng.uniform(0, 1, (3, 32, 32, 3)).astype(np.float32)
    z = np.asarray(emb.embed_preprocessed(jnp.asarray(batch)))
    assert z.shape == (3, 16)
    assert np.all(np.isfinite(z)) and np.all(np.abs(z) <= 1.0)
    # Deterministic across instances (fixed seeded projection).
    emb2 = NomicEmbedder(dim=16, input_size=32, checkpoint_path=path)
    z2 = np.asarray(emb2.embed_preprocessed(jnp.asarray(batch)))
    np.testing.assert_array_equal(z, z2)
    # Token pooling really averaged the HIDDEN axis' tokens: the numpy
    # oracle's pooled tokens, pushed through tanh(· @ proj), must differ
    # from z by float noise only.  Recover proj via the embedder's own
    # seeded construction.
    import jax as _jax
    tokens = _vit_reference_np(p, batch.transpose(0, 3, 1, 2),
                               patch=8, heads=heads, dh=dh)
    pooled = tokens.mean(axis=1)
    proj = np.asarray(
        _jax.random.normal(_jax.random.PRNGKey(0), (pooled.shape[-1], 16))
    ) / np.sqrt(np.float32(pooled.shape[-1]))
    np.testing.assert_allclose(
        z, np.tanh(pooled @ proj), rtol=2e-4, atol=2e-5
    )


def test_fused_layernorm_and_gelu_ops(tmp_path):
    """Opset-17+/20+ fused ops (LayerNormalization, Gelu incl. the tanh
    approximation) — what modern transformer exporters emit instead of
    the decompositions the ViT test above covers."""
    pytest.importorskip("scipy")
    from scipy.special import erf

    rng = np.random.default_rng(9)
    H = 12
    g = rng.uniform(0.5, 1.5, H).astype(np.float32)
    b = rng.standard_normal(H).astype(np.float32) * 0.1
    nodes = [
        _node("LayerNormalization", ["input", "g", "b"], ["ln"],
              [_attr("axis", i=-1), _attr("epsilon", f=1e-5)]),
        _node("Gelu", ["ln"], ["ge"]),
        _node("Gelu", ["ge"], ["output"], [_attr("approximate", s="tanh")]),
    ]
    path = str(tmp_path / "fused.onnx")
    _write_model(path, nodes, [_tensor("g", g), _tensor("b", b)],
                 [("input", [3, 7, H])], [("output", [3, 7, H])])
    m = read_onnx(path)
    assert m["nodes"][2]["attrs"]["approximate"] == "tanh"
    model = OnnxGraphModel(path)
    x = rng.standard_normal((3, 7, H)).astype(np.float32)
    got = np.asarray(model(jnp.asarray(x)))

    mu = x.mean(-1, keepdims=True)
    xc = x - mu
    ln = xc / np.sqrt((xc * xc).mean(-1, keepdims=True) + 1e-5) * g + b
    ge = 0.5 * ln * (1.0 + erf(ln / np.sqrt(2.0)))
    c = np.sqrt(2.0 / np.pi)
    exp = 0.5 * ge * (1.0 + np.tanh(c * (ge + 0.044715 * ge**3)))
    np.testing.assert_allclose(got, exp, rtol=2e-5, atol=2e-6)


def test_layernorm_no_bias_and_2d_axis(tmp_path):
    """LayerNormalization without the optional bias, normalizing the
    trailing TWO axes (axis=1 on a 3-D input)."""
    rng = np.random.default_rng(10)
    T, H = 4, 6
    g = rng.uniform(0.5, 1.5, (T, H)).astype(np.float32)
    nodes = [
        _node("LayerNormalization", ["input", "g"], ["output"],
              [_attr("axis", i=1)]),
    ]
    path = str(tmp_path / "ln2d.onnx")
    _write_model(path, nodes, [_tensor("g", g)],
                 [("input", [2, T, H])], [("output", [2, T, H])])
    model = OnnxGraphModel(path)
    x = rng.standard_normal((2, T, H)).astype(np.float32)
    got = np.asarray(model(jnp.asarray(x)))
    mu = x.mean(axis=(1, 2), keepdims=True)
    xc = x - mu
    exp = xc / np.sqrt((xc * xc).mean(axis=(1, 2), keepdims=True) + 1e-5) * g
    np.testing.assert_allclose(got, exp, rtol=2e-5, atol=2e-6)


def test_qlinear_matmul(tmp_path):
    """QOperator-format int8 MatMul (tract runs the nomic int8 export;
    QOperator is the other quantized flavor besides QDQ)."""
    rng = np.random.default_rng(12)
    a = rng.integers(0, 256, (3, 6), dtype=np.uint8)
    b = rng.integers(-128, 128, (6, 5), dtype=np.int8)
    a_s, b_s, y_s = np.float32(0.02), np.float32(0.05), np.float32(0.1)
    a_zp, b_zp, y_zp = np.uint8(128), np.int8(0), np.uint8(120)
    nodes = [
        _node(
            "QLinearMatMul",
            ["input", "a_s", "a_zp", "b", "b_s", "b_zp", "y_s", "y_zp"],
            ["output"],
        ),
    ]
    inits = [
        _tensor("a_s", a_s), _tensor("a_zp", a_zp), _tensor("b", b),
        _tensor("b_s", b_s), _tensor("b_zp", b_zp),
        _tensor("y_s", y_s), _tensor("y_zp", y_zp),
    ]
    path = str(tmp_path / "qmm.onnx")
    _write_model(path, nodes, inits, [("input", [3, 6])], [("output", [3, 5])])
    model = OnnxGraphModel(path)
    got = np.asarray(model(jnp.asarray(a)))
    acc = (a.astype(np.int32) - 128) @ b.astype(np.int32)
    exp = np.clip(
        np.round(acc * (float(a_s) * float(b_s) / float(y_s))) + 120, 0, 255
    ).astype(np.uint8)
    np.testing.assert_array_equal(got, exp)
    assert got.dtype == np.uint8


def test_qlinear_conv_per_channel(tmp_path):
    """QOperator int8 Conv with per-output-channel weight scales and an
    int32 bias folded into the accumulator."""
    rng = np.random.default_rng(13)
    x = rng.integers(0, 256, (1, 3, 6, 6), dtype=np.uint8)
    w = rng.integers(-128, 128, (4, 3, 3, 3), dtype=np.int8)
    bias = rng.integers(-1000, 1000, 4, dtype=np.int32)
    x_s, y_s = np.float32(0.03), np.float32(0.2)
    w_s = rng.uniform(0.01, 0.05, 4).astype(np.float32)
    x_zp, w_zp, y_zp = np.uint8(100), np.int8(0), np.uint8(128)
    nodes = [
        _node(
            "QLinearConv",
            ["input", "x_s", "x_zp", "w", "w_s", "w_zp", "y_s", "y_zp", "bias"],
            ["output"],
            [_attr("strides", ints=[1, 1]), _attr("kernel_shape", ints=[3, 3]),
             _attr("pads", ints=[1, 1, 1, 1])],
        ),
    ]
    inits = [
        _tensor("x_s", x_s), _tensor("x_zp", x_zp), _tensor("w", w),
        _tensor("w_s", w_s), _tensor("w_zp", w_zp),
        _tensor("y_s", y_s), _tensor("y_zp", y_zp), _tensor("bias", bias),
    ]
    path = str(tmp_path / "qconv.onnx")
    _write_model(path, nodes, inits, [("input", [1, 3, 6, 6])],
                 [("output", [1, 4, 6, 6])])
    model = OnnxGraphModel(path)
    got = np.asarray(model(jnp.asarray(x)))

    # Numpy oracle: integer conv on zero-centered values + bias, then
    # per-channel requantize.
    xi = x.astype(np.int32) - 100
    pad = np.pad(xi, ((0, 0), (0, 0), (1, 1), (1, 1)))
    acc = np.zeros((1, 4, 6, 6), dtype=np.int64)
    for o in range(4):
        for i in range(6):
            for j in range(6):
                patch = pad[0, :, i : i + 3, j : j + 3]
                acc[0, o, i, j] = np.sum(
                    patch.astype(np.int64) * w[o].astype(np.int64)
                )
    acc += bias[None, :, None, None]
    scale = (float(x_s) * w_s / float(y_s))[None, :, None, None]
    exp = np.clip(np.round(acc * scale) + 128, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, exp)
    assert got.dtype == np.uint8


def test_mobilenet_activations_and_variadic(tmp_path):
    """HardSwish/HardSigmoid (MobileNetV3 exports), PRelu, and variadic
    Mean — vs numpy formulas."""
    rng = np.random.default_rng(14)
    slope = np.float32(0.1) * np.ones(1, dtype=np.float32)
    nodes = [
        _node("HardSwish", ["input"], ["hs"]),
        _node("HardSigmoid", ["input"], ["hg"]),
        _node("PRelu", ["input", "slope"], ["pr"]),
        _node("Mean", ["hs", "hg", "pr"], ["output"]),
    ]
    path = str(tmp_path / "acts.onnx")
    _write_model(path, nodes, [_tensor("slope", slope)],
                 [("input", [2, 5])], [("output", [2, 5])])
    model = OnnxGraphModel(path)
    x = rng.standard_normal((2, 5)).astype(np.float32) * 3
    got = np.asarray(model(jnp.asarray(x)))
    hs = x * np.clip(x / 6.0 + 0.5, 0, 1)
    hg = np.clip(0.2 * x + 0.5, 0, 1)
    pr = np.where(x >= 0, x, 0.1 * x)
    np.testing.assert_allclose(got, (hs + hg + pr) / 3.0, rtol=1e-5, atol=1e-6)


def test_resize_nearest_and_linear(tmp_path):
    """Resize 2× upsampling: nearest == exact pixel duplication; linear
    matches torch's bilinear (align_corners=False == ONNX half_pixel)."""
    rng = np.random.default_rng(15)
    x = rng.standard_normal((1, 2, 4, 4)).astype(np.float32)
    scales = np.array([1.0, 1.0, 2.0, 2.0], dtype=np.float32)
    for mode, check in (("nearest", None), ("linear", None)):
        nodes = [
            _node("Resize", ["input", "", "scales"], ["output"],
                  [_attr("mode", s=mode)]),
        ]
        path = str(tmp_path / f"resize_{mode}.onnx")
        _write_model(path, nodes, [_tensor("scales", scales)],
                     [("input", [1, 2, 4, 4])], [("output", [1, 2, 8, 8])])
        got = np.asarray(OnnxGraphModel(path)(jnp.asarray(x)))
        assert got.shape == (1, 2, 8, 8)
        if mode == "nearest":
            exp = x.repeat(2, axis=2).repeat(2, axis=3)
            np.testing.assert_allclose(got, exp, rtol=1e-6)
        else:
            torch = pytest.importorskip("torch")
            exp = torch.nn.functional.interpolate(
                torch.from_numpy(x), scale_factor=2, mode="bilinear",
                align_corners=False,
            ).numpy()
            np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)
