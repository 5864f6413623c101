"""Arbitrary user ONNX graphs executed in JAX — the reference's advertised
extension point, generalized.

The reference is a "user-moddable image similarity engine": drop ANY
trained ONNX model into ``models/image_similarity.onnx`` and tract runs
whatever graph it finds (/root/reference/README.md:15,51-59,
src/image_hashes/efficientnet.rs:10-14 — tract executes arbitrary graphs,
not a fixed architecture).  ``onnx_io.params_from_onnx`` only re-maps
B0-shaped initializers onto our Flax module; THIS module interprets the
graph itself, so a user model with a different backbone runs end-to-end.

Supported ops (the opset-11 CNN subset plus the transformer/quantization
basics a ViT or dynamically-quantized export needs): Conv, Gemm, MatMul,
BatchNormalization, Relu, LeakyRelu, Sigmoid, Tanh, Erf, Softmax, Clip,
Add, Sub, Mul, Div, Pow, Sqrt, Neg, Exp, MaxPool, AveragePool,
GlobalAveragePool, Flatten, Reshape, Transpose, Concat, Split, Slice,
Squeeze, Unsqueeze, Gather, Shape, Cast, Constant, ConstantOfShape,
Identity, Dropout (inference no-op), ReduceMean, ReduceSum, Expand,
Pad (constant), DequantizeLinear, QuantizeLinear, MatMulInteger,
ConvInteger, DynamicQuantizeLinear.

Execution model: nodes run in file order (ONNX graphs are topologically
sorted by spec).  Shape-machinery values (int64 shape tensors flowing
through Shape/Gather/Concat/...) are computed with NUMPY at trace time so
Reshape/Slice targets stay static — exactly what XLA needs; everything
float is traced JAX and jit-compiles to one fused program.  All compute
maps to MXU-friendly primitives: Conv → lax.conv_general_dilated,
MatMul/Gemm → jnp.dot/dot_general.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from pixelbox_tpu.models.onnx_io import read_onnx

_STATIC = (np.ndarray, np.generic, int, float, list, tuple)


def _is_static(v) -> bool:
    return isinstance(v, _STATIC)


def _np(v):
    return np.asarray(v)


def _pads4(attrs, default=0):
    """ONNX pads [x1_begin, x2_begin, x1_end, x2_end] → ((t, b), (l, r))."""
    pads = attrs.get("pads")
    if pads is None:
        p = default
        return ((p, p), (p, p))
    t, l, b, r = (list(pads) + [0] * 4)[:4]
    return ((t, b), (l, r))


def _auto_pad(attrs, x_hw, k_hw, strides):
    ap = attrs.get("auto_pad")
    if not ap or ap == "NOTSET":
        return _pads4(attrs)
    if ap == "VALID":
        return ((0, 0), (0, 0))
    # SAME_UPPER / SAME_LOWER
    out = []
    for i in range(2):
        o = -(-x_hw[i] // strides[i])
        total = max(0, (o - 1) * strides[i] + k_hw[i] - x_hw[i])
        lo, hi = total // 2, total - total // 2
        out.append((hi, lo) if ap == "SAME_LOWER" else (lo, hi))
    return tuple(out)


class OnnxGraphModel:
    """Parse once, then call as a jittable function on the graph input.

    ``model(x)`` takes the single graph input (NCHW f32 for image models)
    and returns the single graph output (or a tuple when the graph
    declares several).
    """

    def __init__(self, path: str):
        m = read_onnx(path)
        self.nodes: List[dict] = m["nodes"]
        self.initializers: Dict[str, np.ndarray] = m["initializers"]
        self.input_names = m["inputs"] or ["input"]
        self.output_names = m["outputs"]
        self.opset = m["opset"]
        if not self.output_names:
            # Fall back: the last node's first output.
            self.output_names = [self.nodes[-1]["outputs"][0]]
        unsupported = sorted(
            {n["op"] for n in self.nodes} - set(_OPS.keys())
        )
        if unsupported:
            raise ValueError(
                f"{path}: unsupported ONNX ops {unsupported} "
                f"(supported: {sorted(_OPS)})"
            )

    @property
    def latent_dim(self):
        """Best-effort output width from the last Gemm/MatMul initializer."""
        for node in reversed(self.nodes):
            if node["op"] in ("Gemm", "MatMul"):
                for name in node["inputs"][1:2]:
                    w = self.initializers.get(name)
                    if w is not None and w.ndim == 2:
                        if node["op"] == "Gemm" and node["attrs"].get("transB"):
                            return int(w.shape[0])
                        return int(w.shape[1])
        return None

    def __call__(self, *args):
        env: Dict[str, object] = {"": None}
        env.update(self.initializers)
        for name, arr in zip(self.input_names, args):
            env[name] = arr
        for node in self.nodes:
            fn = _OPS[node["op"]]
            ins = [env[i] for i in node["inputs"]]
            outs = fn(node, ins)
            if not isinstance(outs, tuple):
                outs = (outs,)
            for name, val in zip(node["outputs"], outs):
                if name:
                    env[name] = val
        result = tuple(env[n] for n in self.output_names)
        return result[0] if len(result) == 1 else result


# --------------------------------------------------------------------- #
# Op implementations.  Each takes (node, inputs) and returns output(s).


def _ew(fn):
    return lambda node, ins: fn(*ins)


def _conv(node, ins):
    x, w = ins[0], ins[1]
    b = ins[2] if len(ins) > 2 else None
    a = node["attrs"]
    strides = [int(s) for s in a.get("strides", [1, 1])]
    dil = [int(d) for d in a.get("dilations", [1, 1])]
    groups = int(a.get("group", 1) or 1)
    k_hw = np.asarray(w).shape[2:4]
    pads = _auto_pad(a, x.shape[2:4], k_hw, strides)
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x, jnp.float32),
        jnp.asarray(w, jnp.float32),
        window_strides=strides,
        padding=pads,
        rhs_dilation=dil,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
    )
    if b is not None:
        out = out + jnp.asarray(b, jnp.float32)[None, :, None, None]
    return out


def _conv_integer(node, ins):
    x, w = ins[0], ins[1]
    xzp = _np(ins[2]).astype(np.int32) if len(ins) > 2 else 0
    wzp = _np(ins[3]).astype(np.int32) if len(ins) > 3 else 0
    a = node["attrs"]
    strides = [int(s) for s in a.get("strides", [1, 1])]
    groups = int(a.get("group", 1) or 1)
    k_hw = np.asarray(w).shape[2:4]
    pads = _auto_pad(a, x.shape[2:4], k_hw, strides)
    xi = jnp.asarray(x, jnp.int32) - xzp
    wi = jnp.asarray(w, jnp.int32) - wzp
    return jax.lax.conv_general_dilated(
        xi, wi, window_strides=strides, padding=pads,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )


def _bn(node, ins):
    x, scale, bias, mean, var = ins[:5]
    eps = float(node["attrs"].get("epsilon", 1e-5) or 1e-5)
    c = x.shape[1]
    shape = (1, c) + (1,) * (x.ndim - 2)
    inv = jax.lax.rsqrt(jnp.asarray(var, jnp.float32) + eps)
    return (
        (jnp.asarray(x, jnp.float32) - jnp.asarray(mean, jnp.float32).reshape(shape))
        * (jnp.asarray(scale, jnp.float32) * inv).reshape(shape)
        + jnp.asarray(bias, jnp.float32).reshape(shape)
    )


def _gemm(node, ins):
    a_in, b_in = ins[0], ins[1]
    attrs = node["attrs"]
    alpha = float(attrs.get("alpha", 1.0) or 1.0)
    beta = float(attrs.get("beta", 1.0) or 1.0)
    a = jnp.asarray(a_in, jnp.float32)
    b = jnp.asarray(b_in, jnp.float32)
    if attrs.get("transA"):
        a = a.T
    if attrs.get("transB"):
        b = b.T
    out = alpha * jnp.dot(a, b, preferred_element_type=jnp.float32)
    if len(ins) > 2 and ins[2] is not None:
        out = out + beta * jnp.asarray(ins[2], jnp.float32)
    return out


def _matmul(node, ins):
    return jnp.matmul(
        jnp.asarray(ins[0], jnp.float32), jnp.asarray(ins[1], jnp.float32)
    )


def _matmul_integer(node, ins):
    a = jnp.asarray(ins[0], jnp.int32)
    b = jnp.asarray(ins[1], jnp.int32)
    if len(ins) > 2 and ins[2] is not None:
        a = a - _np(ins[2]).astype(np.int32)
    if len(ins) > 3 and ins[3] is not None:
        b = b - _np(ins[3]).astype(np.int32)
    return jnp.matmul(a, b, preferred_element_type=jnp.int32)


def _requantize(acc_i32, scale, y_zp, channel_axis=None, ndim=None):
    """int32 accumulator → quantized output: round(acc·scale) + zp,
    clipped to the zero-point's dtype range (QLinear* epilogue)."""
    zp = _np(y_zp)
    scale = np.asarray(scale, dtype=np.float32)
    if channel_axis is not None and scale.ndim == 1 and scale.size > 1:
        shape = [1] * ndim
        shape[channel_axis] = scale.size
        scale = scale.reshape(shape)
    lo, hi = (-128, 127) if zp.dtype == np.int8 else (0, 255)
    y = jnp.clip(
        jnp.round(jnp.asarray(acc_i32, jnp.float32) * scale)
        + zp.astype(np.int32),
        lo, hi,
    )
    return y.astype(jnp.int8 if zp.dtype == np.int8 else jnp.uint8)


def _qlinear_matmul(node, ins):
    """QOperator-format quantized MatMul (the other int8 export flavor
    besides QDQ): y = q((a−azp)·(b−bzp) · a_s·b_s/y_s, yzp)."""
    a, a_s, a_zp, b, b_s, b_zp, y_s, y_zp = ins[:8]
    acc = _matmul_integer(node, [a, b, a_zp, b_zp])
    scale = (
        _np(a_s).astype(np.float32)
        * _np(b_s).astype(np.float32)
        / _np(y_s).astype(np.float32)
    )
    # Per-column b scales broadcast over the last axis naturally.
    return _requantize(acc, scale, y_zp)


def _qlinear_conv(node, ins):
    """QOperator-format quantized Conv; per-output-channel weight scales
    supported; optional int32 bias adds into the accumulator."""
    x, x_s, x_zp, w, w_s, w_zp, y_s, y_zp = ins[:8]
    acc = _conv_integer(node, [x, w, x_zp, w_zp])
    if len(ins) > 8 and ins[8] is not None:
        bias = jnp.asarray(ins[8], jnp.int32)
        acc = acc + bias[None, :, None, None]
    scale = (
        _np(x_s).astype(np.float32)
        * _np(w_s).astype(np.float32)
        / _np(y_s).astype(np.float32)
    )
    return _requantize(acc, scale, y_zp, channel_axis=1, ndim=4)


def _pool(node, ins, kind):
    x = jnp.asarray(ins[0], jnp.float32)
    a = node["attrs"]
    k = [int(v) for v in a["kernel_shape"]]
    strides = [int(s) for s in a.get("strides", k)]
    pads = _auto_pad(a, x.shape[2:4], k, strides)
    window = (1, 1) + tuple(k)
    strd = (1, 1) + tuple(strides)
    padc = ((0, 0), (0, 0)) + pads
    if kind == "max":
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, window, strd, padc
        )
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strd, padc)
    if int(a.get("count_include_pad", 0) or 0):
        return s / float(np.prod(k))
    ones = jnp.ones(x.shape[2:4], x.dtype)[None, None]
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strd, padc)
    return s / cnt


def _reshape(node, ins):
    x = ins[0]
    shape = [int(v) for v in _np(ins[1]).reshape(-1)]
    # 0 = copy input dim (opset semantics); -1 inferred by jnp.
    shape = [
        x.shape[i] if v == 0 else v for i, v in enumerate(shape)
    ]
    return jnp.reshape(x, shape) if not _is_static(x) else _np(x).reshape(shape)


def _transpose(node, ins):
    perm = node["attrs"].get("perm")
    x = ins[0]
    if perm is None:
        perm = list(range(np.ndim(x)))[::-1]
    return jnp.transpose(x, [int(p) for p in perm])


def _concat(node, ins):
    axis = int(node["attrs"].get("axis", 0) or 0)
    if all(_is_static(v) for v in ins):
        return np.concatenate([_np(v) for v in ins], axis=axis)
    return jnp.concatenate([jnp.asarray(v) for v in ins], axis=axis)


def _split(node, ins):
    x = ins[0]
    axis = int(node["attrs"].get("axis", 0) or 0)
    if len(ins) > 1 and ins[1] is not None:
        sizes = [int(v) for v in _np(ins[1]).reshape(-1)]
    else:
        sizes = node["attrs"].get("split")
        if sizes is None:
            n_out = len(node["outputs"])
            step = x.shape[axis] // n_out
            sizes = [step] * n_out
    idx = np.cumsum(sizes)[:-1]
    return tuple(jnp.split(jnp.asarray(x), idx, axis=axis))


def _slice(node, ins):
    x = ins[0]
    a = node["attrs"]
    if len(ins) > 1:  # opset 10+: starts/ends/axes/steps as inputs
        starts = [int(v) for v in _np(ins[1]).reshape(-1)]
        ends = [int(v) for v in _np(ins[2]).reshape(-1)]
        axes = (
            [int(v) for v in _np(ins[3]).reshape(-1)]
            if len(ins) > 3 and ins[3] is not None
            else list(range(len(starts)))
        )
        steps = (
            [int(v) for v in _np(ins[4]).reshape(-1)]
            if len(ins) > 4 and ins[4] is not None
            else [1] * len(starts)
        )
    else:  # opset 1 attrs
        starts = [int(v) for v in a["starts"]]
        ends = [int(v) for v in a["ends"]]
        axes = [int(v) for v in a.get("axes", range(len(starts)))]
        steps = [1] * len(starts)
    sl = [slice(None)] * np.ndim(x)
    for s, e, ax, st in zip(starts, ends, axes, steps):
        sl[ax] = slice(s, None if e >= 2 ** 31 - 1 else e, st)
    out = x[tuple(sl)]
    return out


def _gather(node, ins):
    x, idx = ins
    axis = int(node["attrs"].get("axis", 0) or 0)
    if _is_static(x) and _is_static(idx):
        return np.take(_np(x), _np(idx).astype(np.int64), axis=axis)
    return jnp.take(jnp.asarray(x), jnp.asarray(_np(idx), jnp.int32), axis=axis)


def _squeeze(node, ins):
    x = ins[0]
    axes = node["attrs"].get("axes")
    if len(ins) > 1 and ins[1] is not None:
        axes = [int(v) for v in _np(ins[1]).reshape(-1)]
    if axes is None:
        return jnp.squeeze(jnp.asarray(x)) if not _is_static(x) else _np(x).squeeze()
    axes = tuple(int(a) for a in axes)
    if _is_static(x):
        return _np(x).squeeze(axes)
    return jnp.squeeze(jnp.asarray(x), axes)


def _unsqueeze(node, ins):
    x = ins[0]
    axes = node["attrs"].get("axes")
    if len(ins) > 1 and ins[1] is not None:
        axes = [int(v) for v in _np(ins[1]).reshape(-1)]
    out = _np(x) if _is_static(x) else x
    for a in sorted(int(v) for v in axes):
        out = (
            np.expand_dims(out, a) if _is_static(out) else jnp.expand_dims(out, a)
        )
    return out


def _cast(node, ins):
    to = int(node["attrs"].get("to", 1) or 1)
    np_dt = {
        1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32, 7: np.int64,
        9: np.bool_, 10: np.float16, 11: np.float64,
    }.get(to, np.float32)
    x = ins[0]
    if _is_static(x):
        return _np(x).astype(np_dt)
    # Traced values stay in the 32-bit universe (JAX x64 is off).
    jdt = {np.float64: jnp.float32, np.int64: jnp.int32}.get(np_dt, np_dt)
    return jnp.asarray(x).astype(jdt)


def _clip(node, ins):
    x = jnp.asarray(ins[0], jnp.float32)
    a = node["attrs"]
    lo = ins[1] if len(ins) > 1 and ins[1] is not None else a.get("min")
    hi = ins[2] if len(ins) > 2 and ins[2] is not None else a.get("max")
    if lo is not None:
        x = jnp.maximum(x, jnp.float32(_np(lo)))
    if hi is not None:
        x = jnp.minimum(x, jnp.float32(_np(hi)))
    return x


def _reduce(node, ins, fn):
    x = jnp.asarray(ins[0], jnp.float32)
    axes = node["attrs"].get("axes")
    if len(ins) > 1 and ins[1] is not None:
        axes = [int(v) for v in _np(ins[1]).reshape(-1)]
    keep = bool(int(node["attrs"].get("keepdims", 1) or 0))
    axes = tuple(int(a) for a in axes) if axes is not None else None
    return fn(x, axis=axes, keepdims=keep)


def _pad(node, ins):
    x = jnp.asarray(ins[0])
    a = node["attrs"]
    if len(ins) > 1 and ins[1] is not None:
        pads = [int(v) for v in _np(ins[1]).reshape(-1)]
    else:
        pads = [int(v) for v in a["pads"]]
    value = float(_np(ins[2])) if len(ins) > 2 and ins[2] is not None else float(
        a.get("value", 0.0) or 0.0
    )
    n = x.ndim
    cfg = [(pads[i], pads[i + n]) for i in range(n)]
    return jnp.pad(x, cfg, constant_values=value)


def _dequantize_linear(node, ins):
    x = ins[0]
    scale = _np(ins[1]).astype(np.float32)
    zp = _np(ins[2]).astype(np.int32) if len(ins) > 2 and ins[2] is not None else 0
    axis = int(node["attrs"].get("axis", 1) or 1)
    xv = _np(x).astype(np.int32) if _is_static(x) else jnp.asarray(x, jnp.int32)
    if scale.ndim == 1 and scale.size > 1:
        shape = [1] * np.ndim(xv)
        shape[axis] = scale.size
        scale = scale.reshape(shape)
        zp = np.asarray(zp).reshape(shape) if np.ndim(zp) else zp
    out = (xv - zp) * scale
    return out if not _is_static(x) else np.asarray(out)


def _quantize_linear(node, ins):
    x = jnp.asarray(ins[0], jnp.float32)
    scale = _np(ins[1]).astype(np.float32)
    zp = _np(ins[2]) if len(ins) > 2 and ins[2] is not None else np.uint8(0)
    lo, hi = (-128, 127) if zp.dtype == np.int8 else (0, 255)
    q = jnp.clip(jnp.round(x / scale) + zp.astype(np.int32), lo, hi)
    return q.astype(jnp.int8 if zp.dtype == np.int8 else jnp.uint8)


def _dynamic_quantize_linear(node, ins):
    x = jnp.asarray(ins[0], jnp.float32)
    mn = jnp.minimum(jnp.min(x), 0.0)
    mx = jnp.maximum(jnp.max(x), 0.0)
    scale = (mx - mn) / 255.0
    zp = jnp.clip(jnp.round(-mn / scale), 0, 255).astype(jnp.uint8)
    q = jnp.clip(jnp.round(x / scale) + zp.astype(jnp.int32), 0, 255).astype(
        jnp.uint8
    )
    return q, scale, zp


def _shape(node, ins):
    return np.asarray(np.shape(ins[0]), dtype=np.int64)


def _constant(node, ins):
    a = node["attrs"]
    for key in ("value", "value_float", "value_int", "value_floats", "value_ints"):
        if a.get(key) is not None:
            v = a[key]
            return _np(v)
    raise ValueError("Constant node with no value attribute")


def _expand(node, ins):
    x = ins[0]
    shape = [int(v) for v in _np(ins[1]).reshape(-1)]
    # ONNX Expand broadcasts; dims of 1 in shape keep the input dim.
    tgt = list(np.broadcast_shapes(np.shape(x), tuple(shape)))
    return jnp.broadcast_to(jnp.asarray(x), tgt)


def _where(node, ins):
    c, a, b = ins
    return jnp.where(jnp.asarray(c), jnp.asarray(a), jnp.asarray(b))


def _variadic(op, xs):
    out = jnp.asarray(xs[0], jnp.float32)
    for x in xs[1:]:
        out = op(out, jnp.asarray(x, jnp.float32))
    return out


def _resize(node, ins):
    """Resize (opset 11+ signature: X, roi, scales, sizes) — nearest and
    (bi)linear, the modes image models' upsampling decoders use.  ROI is
    ignored (only used by crop-and-resize transform modes)."""
    x = jnp.asarray(ins[0], jnp.float32)
    scales = (
        _np(ins[2]).reshape(-1).astype(np.float64)
        if len(ins) > 2 and ins[2] is not None and np.size(_np(ins[2]))
        else None
    )
    sizes = (
        [int(v) for v in _np(ins[3]).reshape(-1)]
        if len(ins) > 3 and ins[3] is not None and np.size(_np(ins[3]))
        else None
    )
    if sizes is None:
        if scales is None:
            raise ValueError("Resize needs scales or sizes")
        sizes = [
            int(np.floor(s * d)) for s, d in zip(scales, x.shape)
        ]
    mode = node["attrs"].get("mode") or "nearest"
    if isinstance(mode, bytes):
        mode = mode.decode()
    method = {"nearest": "nearest", "linear": "linear", "cubic": "cubic"}[
        str(mode)
    ]
    return jax.image.resize(x, tuple(sizes), method=method)


def _layer_norm(node, ins):
    """Fused LayerNormalization (opset ≥17 — modern ViT/transformer
    exports emit this instead of the ReduceMean/Sub/… decomposition)."""
    x = jnp.asarray(ins[0], jnp.float32)
    scale = jnp.asarray(ins[1], jnp.float32)
    bias = (
        jnp.asarray(ins[2], jnp.float32)
        if len(ins) > 2 and ins[2] is not None
        else None
    )
    axis = int(node["attrs"].get("axis", -1) if node["attrs"].get("axis") is not None else -1)
    eps = float(node["attrs"].get("epsilon") or 1e-5)
    if axis < 0:
        axis += x.ndim
    axes = tuple(range(axis, x.ndim))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=axes, keepdims=True)
    y = xc * jax.lax.rsqrt(var + jnp.float32(eps)) * scale
    if bias is not None:
        y = y + bias
    return y


def _gelu(node, ins):
    """Fused Gelu (opset ≥20).  approximate="tanh" selects the tanh
    approximation; default is the exact erf form."""
    x = jnp.asarray(ins[0], jnp.float32)
    approx = node["attrs"].get("approximate")
    if isinstance(approx, bytes):
        approx = approx.decode()
    return jax.nn.gelu(x, approximate=(approx == "tanh"))


_OPS = {
    "Conv": _conv,
    "ConvInteger": _conv_integer,
    "BatchNormalization": _bn,
    "Gemm": _gemm,
    "MatMul": _matmul,
    "MatMulInteger": _matmul_integer,
    "Relu": _ew(lambda x: jnp.maximum(jnp.asarray(x, jnp.float32), 0.0)),
    "LeakyRelu": lambda node, ins: jnp.where(
        jnp.asarray(ins[0], jnp.float32) >= 0,
        jnp.asarray(ins[0], jnp.float32),
        float(node["attrs"].get("alpha", 0.01) or 0.01)
        * jnp.asarray(ins[0], jnp.float32),
    ),
    "Sigmoid": _ew(lambda x: jax.nn.sigmoid(jnp.asarray(x, jnp.float32))),
    "Tanh": _ew(lambda x: jnp.tanh(jnp.asarray(x, jnp.float32))),
    "Erf": _ew(lambda x: jax.lax.erf(jnp.asarray(x, jnp.float32))),
    "Softmax": lambda node, ins: jax.nn.softmax(
        jnp.asarray(ins[0], jnp.float32),
        axis=int(node["attrs"].get("axis", -1) if node["attrs"].get("axis") is not None else -1),
    ),
    "Clip": _clip,
    "Add": _ew(lambda a, b: (
        np.add(a, b) if (_is_static(a) and _is_static(b)) else jnp.asarray(a) + jnp.asarray(b)
    )),
    "Sub": _ew(lambda a, b: (
        np.subtract(a, b) if (_is_static(a) and _is_static(b)) else jnp.asarray(a) - jnp.asarray(b)
    )),
    "Mul": _ew(lambda a, b: (
        np.multiply(a, b) if (_is_static(a) and _is_static(b)) else jnp.asarray(a) * jnp.asarray(b)
    )),
    "Div": _ew(lambda a, b: (
        np.divide(a, b) if (_is_static(a) and _is_static(b)) else jnp.asarray(a) / jnp.asarray(b)
    )),
    "Pow": _ew(lambda a, b: jnp.power(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))),
    "Sqrt": _ew(lambda x: jnp.sqrt(jnp.asarray(x, jnp.float32))),
    "Neg": _ew(lambda x: -jnp.asarray(x)),
    "Exp": _ew(lambda x: jnp.exp(jnp.asarray(x, jnp.float32))),
    "MaxPool": lambda node, ins: _pool(node, ins, "max"),
    "AveragePool": lambda node, ins: _pool(node, ins, "avg"),
    "GlobalAveragePool": _ew(
        lambda x: jnp.mean(jnp.asarray(x, jnp.float32), axis=(2, 3), keepdims=True)
    ),
    "Flatten": lambda node, ins: jnp.reshape(
        jnp.asarray(ins[0]),
        (int(np.prod(np.shape(ins[0])[: int(node["attrs"].get("axis", 1) or 1)]) or 1), -1),
    ),
    "Reshape": _reshape,
    "Transpose": _transpose,
    "Concat": _concat,
    "Split": _split,
    "Slice": _slice,
    "Squeeze": _squeeze,
    "Unsqueeze": _unsqueeze,
    "Gather": _gather,
    "Shape": _shape,
    "Cast": _cast,
    "Constant": _constant,
    "ConstantOfShape": lambda node, ins: np.full(
        [int(v) for v in _np(ins[0]).reshape(-1)],
        _np(node["attrs"].get("value", np.float32(0.0))).reshape(-1)[0]
        if node["attrs"].get("value") is not None
        else np.float32(0.0),
    ),
    "Identity": _ew(lambda x: x),
    "Dropout": lambda node, ins: ins[0],
    "ReduceMean": lambda node, ins: _reduce(node, ins, jnp.mean),
    "ReduceSum": lambda node, ins: _reduce(node, ins, jnp.sum),
    "Expand": _expand,
    "Where": _where,
    "Pad": _pad,
    "LayerNormalization": _layer_norm,
    "Gelu": _gelu,
    "QLinearMatMul": _qlinear_matmul,
    "QLinearConv": _qlinear_conv,
    "DequantizeLinear": _dequantize_linear,
    "QuantizeLinear": _quantize_linear,
    "DynamicQuantizeLinear": _dynamic_quantize_linear,
    # MobileNet-family activations (torchvision exporters emit these).
    "HardSigmoid": lambda node, ins: jnp.clip(
        float(node["attrs"].get("alpha", 0.2) or 0.2)
        * jnp.asarray(ins[0], jnp.float32)
        + float(node["attrs"].get("beta", 0.5) or 0.5),
        0.0, 1.0,
    ),
    "HardSwish": _ew(
        lambda x: jnp.asarray(x, jnp.float32)
        * jnp.clip(jnp.asarray(x, jnp.float32) / 6.0 + 0.5, 0.0, 1.0)
    ),
    "PRelu": _ew(
        lambda x, slope: jnp.where(
            jnp.asarray(x, jnp.float32) >= 0,
            jnp.asarray(x, jnp.float32),
            jnp.asarray(slope, jnp.float32) * jnp.asarray(x, jnp.float32),
        )
    ),
    "Elu": lambda node, ins: jax.nn.elu(
        jnp.asarray(ins[0], jnp.float32),
        alpha=float(node["attrs"].get("alpha", 1.0) or 1.0),
    ),
    "Softplus": _ew(lambda x: jax.nn.softplus(jnp.asarray(x, jnp.float32))),
    "GlobalMaxPool": _ew(
        lambda x: jnp.max(jnp.asarray(x, jnp.float32), axis=(2, 3), keepdims=True)
    ),
    "ReduceMax": lambda node, ins: _reduce(node, ins, jnp.max),
    "ReduceMin": lambda node, ins: _reduce(node, ins, jnp.min),
    "ArgMax": lambda node, ins: jnp.argmax(
        jnp.asarray(ins[0], jnp.float32),
        axis=int(node["attrs"].get("axis", 0) or 0),
        keepdims=bool(int(node["attrs"].get("keepdims", 1) or 0)),
    ).astype(jnp.int64),
    "Min": _ew(lambda *xs: _variadic(jnp.minimum, xs)),
    "Max": _ew(lambda *xs: _variadic(jnp.maximum, xs)),
    "Sum": _ew(lambda *xs: _variadic(jnp.add, xs)),
    "Mean": _ew(
        lambda *xs: _variadic(jnp.add, xs) / jnp.float32(len(xs))
    ),
    "Abs": _ew(lambda x: jnp.abs(jnp.asarray(x))),
    "Floor": _ew(lambda x: jnp.floor(jnp.asarray(x, jnp.float32))),
    "Ceil": _ew(lambda x: jnp.ceil(jnp.asarray(x, jnp.float32))),
    "Log": _ew(lambda x: jnp.log(jnp.asarray(x, jnp.float32))),
    "Reciprocal": _ew(lambda x: 1.0 / jnp.asarray(x, jnp.float32)),
    "Resize": _resize,
}
