"""ONNX import/export for the deployable embedder artifact.

The reference's serving artifact IS ``models/image_similarity.onnx``:
resources/train.py:167-174 exports the trained model (opset 11, NCHW
1×3×224×224 with a dynamic batch axis) and src/image_hashes/
efficientnet.rs:5-14 lazy-loads it with tract.  This module provides both
directions without any onnx/protobuf dependency (neither is in the
image), speaking the protobuf wire format directly:

- :func:`params_from_onnx` parses an ``image_similarity.onnx``-shaped
  file and maps its initializers onto our Flax EfficientNet variables —
  a real pixelbox user's trained model carries over.
- :func:`export_onnx` emits the same contract from Flax variables: the
  full EfficientNet-B0 graph (Conv/BatchNormalization/Sigmoid/Mul/
  GlobalAveragePool/Flatten/Gemm/Tanh) with initializers named in the
  reference's torch ``Sequential`` state_dict layout ("0.*" features,
  "3.weight"/"3.bias" head — train.py:30-46), so the file round-trips
  through this importer AND matches what a tract/torch consumer expects.

Only the ONNX fields actually used are implemented; the reader tolerates
unknown fields (skips them by wire type), packed and unpacked repeated
ints, and both raw_data and typed data tensors.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

# TensorProto.DataType values (onnx.proto3, public spec).
_DT_FLOAT = 1
_DT_INT64 = 7
_NP_BY_DT = {
    _DT_FLOAT: np.float32,
    2: np.uint8,
    3: np.int8,
    5: np.int16,
    6: np.int32,
    _DT_INT64: np.int64,
    9: np.bool_,
    10: np.float16,
    11: np.float64,
}

# --------------------------------------------------------------------- #
# Protobuf wire primitives


def _enc_varint(v: int) -> bytes:
    out = bytearray()
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_varint(buf: memoryview, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _tag(field: int, wire: int) -> bytes:
    return _enc_varint((field << 3) | wire)


def _field_bytes(field: int, data: bytes) -> bytes:
    return _tag(field, 2) + _enc_varint(len(data)) + data


def _field_varint(field: int, v: int) -> bytes:
    return _tag(field, 0) + _enc_varint(v)


def _field_packed_varints(field: int, vs) -> bytes:
    payload = b"".join(_enc_varint(int(v)) for v in vs)
    return _field_bytes(field, payload)


def _iter_fields(data: bytes):
    """Yield (field_number, wire_type, value) over one message's fields.
    value: int for varint, bytes for length-delimited, raw for fixed."""
    buf = memoryview(data)
    pos = 0
    end = len(buf)
    while pos < end:
        key, pos = _dec_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _dec_varint(buf, pos)
            yield field, wire, v
        elif wire == 2:
            ln, pos = _dec_varint(buf, pos)
            yield field, wire, bytes(buf[pos : pos + ln])
            pos += ln
        elif wire == 5:
            yield field, wire, bytes(buf[pos : pos + 4])
            pos += 4
        elif wire == 1:
            yield field, wire, bytes(buf[pos : pos + 8])
            pos += 8
        else:  # groups (3/4) don't occur in onnx
            raise ValueError(f"unsupported wire type {wire}")


def _s64(v: int) -> int:
    """Protobuf int64 varints are two's-complement on the wire: fold
    values ≥ 2^63 back to their negative meaning (axis=-1 etc.)."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _packed_or_repeated_ints(values: List) -> List[int]:
    out: List[int] = []
    for wire, v in values:
        if wire == 0:
            out.append(_s64(v))
        else:  # packed
            buf = memoryview(v)
            pos = 0
            while pos < len(buf):
                x, pos = _dec_varint(buf, pos)
                out.append(_s64(x))
    return out


# --------------------------------------------------------------------- #
# Reader


def _parse_tensor(data: bytes) -> Tuple[str, np.ndarray]:
    """TensorProto → (name, ndarray)."""
    dims_raw: List = []
    dtype = _DT_FLOAT
    name = ""
    raw = None
    float_data: List[bytes] = []
    int64_raw: List = []
    for field, wire, v in _iter_fields(data):
        if field == 1:
            dims_raw.append((wire, v))
        elif field == 2 and wire == 0:
            dtype = v
        elif field == 8:
            name = v.decode()
        elif field == 9:
            raw = v
        elif field == 4:
            float_data.append((wire, v))
        elif field == 7:
            int64_raw.append((wire, v))
    dims = _packed_or_repeated_ints(dims_raw)
    np_dtype = _NP_BY_DT.get(dtype)
    if np_dtype is None:
        raise ValueError(f"unsupported tensor dtype {dtype} for '{name}'")
    if raw is not None:
        arr = np.frombuffer(raw, dtype=np.dtype(np_dtype).newbyteorder("<"))
    elif float_data:
        vals = []
        for wire, v in float_data:
            if wire == 5:
                vals.append(struct.unpack("<f", v)[0])
            else:  # packed fixed32
                vals.extend(np.frombuffer(v, dtype="<f4"))
        arr = np.asarray(vals, dtype=np.float32)
    elif int64_raw:
        arr = np.asarray(_packed_or_repeated_ints(int64_raw), dtype=np.int64)
    else:
        arr = np.zeros(0, dtype=np_dtype)
    return name, np.asarray(arr, dtype=np_dtype).reshape(dims)


def _parse_attr(data: bytes) -> Tuple[str, object]:
    """AttributeProto → (name, value): int / float / list[int] /
    list[float] / str / ndarray (TENSOR)."""
    name = ""
    i_vals: List = []
    f_vals: List = []
    s_val = None
    t_val = None
    single_i = None
    single_f = None
    for field, wire, v in _iter_fields(data):
        if field == 1:
            name = v.decode()
        elif field == 3 and wire == 0:        # i
            single_i = _s64(v)
        elif field == 2 and wire == 5:        # f
            single_f = struct.unpack("<f", v)[0]
        elif field == 4 and wire == 2:        # s
            s_val = v.decode("utf-8", "replace")
        elif field == 5 and wire == 2:        # t: TensorProto
            _, t_val = _parse_tensor(v)
        elif field == 8:                      # ints (packed or repeated)
            i_vals.append((wire, v))
        elif field == 7:                      # floats
            if wire == 5:
                f_vals.append(struct.unpack("<f", v)[0])
            elif wire == 2:
                f_vals.extend(np.frombuffer(v, dtype="<f4").tolist())
    if t_val is not None:
        return name, t_val
    if i_vals:
        return name, _packed_or_repeated_ints(i_vals)
    if f_vals:
        return name, f_vals
    if s_val is not None:
        return name, s_val
    if single_i is not None:
        return name, single_i
    if single_f is not None:
        return name, single_f
    return name, None


def _parse_node(data: bytes) -> dict:
    """NodeProto → {"op": str, "inputs": [...], "outputs": [...],
    "attrs": {name: value}}."""
    op = ""
    inputs: List[str] = []
    outputs: List[str] = []
    attrs: Dict[str, object] = {}
    for field, wire, v in _iter_fields(data):
        if field == 1 and wire == 2:
            inputs.append(v.decode())
        elif field == 2 and wire == 2:
            outputs.append(v.decode())
        elif field == 4 and wire == 2:
            op = v.decode()
        elif field == 5 and wire == 2:
            n, val = _parse_attr(v)
            attrs[n] = val
    return {"op": op, "inputs": inputs, "outputs": outputs, "attrs": attrs}


def _parse_value_info_name(data: bytes) -> str:
    for field, wire, v in _iter_fields(data):
        if field == 1 and wire == 2:
            return v.decode()
    return ""


def read_onnx(path: str) -> dict:
    """Parse the fields we need from a .onnx file.

    Returns {"initializers": {name: ndarray}, "nodes": [node dicts],
    "inputs": [names], "outputs": [names], "op_types": [str],
    "opset": int, "producer": str}.  ``nodes`` preserve file order
    (ONNX graphs are topologically sorted by spec).
    """
    with open(path, "rb") as f:
        data = f.read()
    graph = None
    opset = None
    producer = ""
    for field, wire, v in _iter_fields(data):  # ModelProto
        if field == 7:
            graph = v
        elif field == 2 and wire == 2:
            producer = v.decode()
        elif field == 8 and wire == 2:  # opset_import: OperatorSetIdProto
            for f2, w2, v2 in _iter_fields(v):
                if f2 == 2 and w2 == 0:
                    opset = v2
    if graph is None:
        raise ValueError(f"{path}: no graph in ONNX model")
    initializers: Dict[str, np.ndarray] = {}
    nodes: List[dict] = []
    g_inputs: List[str] = []
    g_outputs: List[str] = []
    for field, wire, v in _iter_fields(graph):  # GraphProto
        if field == 5:  # initializer
            name, arr = _parse_tensor(v)
            initializers[name] = arr
        elif field == 1:  # node
            nodes.append(_parse_node(v))
        elif field == 11:  # graph input (ValueInfoProto)
            g_inputs.append(_parse_value_info_name(v))
        elif field == 12:  # graph output
            g_outputs.append(_parse_value_info_name(v))
    return {
        "initializers": initializers,
        "nodes": nodes,
        "inputs": [n for n in g_inputs if n not in initializers],
        "outputs": g_outputs,
        "op_types": [n["op"] for n in nodes],
        "opset": opset,
        "producer": producer,
    }


def params_from_onnx(path: str, latent_dim: Optional[int] = None):
    """Load an ``image_similarity.onnx``-shaped model into Flax variables.

    Handles the initializer namings seen in torch exports of the
    reference's Sequential model (state_dict-named: "0.*"/"features.*"
    features + "3.weight" head) and falls back to identifying the Gemm
    head by shape when its name was mangled by the exporter.
    """
    from pixelbox_tpu.models.efficientnet import (
        HEAD_CHANNELS,
        params_from_torch_state_dict,
    )

    model = read_onnx(path)
    inits = dict(model["initializers"])

    # Identify the Gemm head by name or by shape [latent, 1280].
    head_w_name = None
    for cand in ("3.weight", "linear.weight", "classifier.weight"):
        if cand in inits:
            head_w_name = cand
            break
    if head_w_name is None:
        for name, arr in inits.items():
            if arr.ndim == 2 and arr.shape[1] == HEAD_CHANNELS:
                head_w_name = name
                break
    if head_w_name is None:
        raise ValueError(
            f"{path}: no Gemm head initializer of shape [latent, "
            f"{HEAD_CHANNELS}] found"
        )
    head_w = inits.pop(head_w_name)
    if latent_dim is not None and head_w.shape[0] != latent_dim:
        raise ValueError(
            f"{path}: model latent dim {head_w.shape[0]} != requested "
            f"{latent_dim}"
        )
    head_b_name = head_w_name.rsplit(".", 1)[0] + ".bias"
    head_b = inits.pop(
        head_b_name, np.zeros(head_w.shape[0], np.float32)
    )

    sd = {k: v for k, v in inits.items() if v.ndim >= 1}
    sd["3.weight"] = head_w
    sd["3.bias"] = head_b
    return params_from_torch_state_dict(sd, latent_dim=head_w.shape[0])


# --------------------------------------------------------------------- #
# Writer


def _attr(name: str, *, i: Optional[int] = None, f: Optional[float] = None,
          ints: Optional[List[int]] = None, s: Optional[str] = None) -> bytes:
    """AttributeProto with the type field set (checkers require it)."""
    out = _field_bytes(1, name.encode())
    if i is not None:
        out += _field_varint(3, i) + _field_varint(20, 2)       # INT
    elif f is not None:
        out += _tag(2, 5) + struct.pack("<f", f) + _field_varint(20, 1)  # FLOAT
    elif ints is not None:
        out += _field_packed_varints(8, ints) + _field_varint(20, 7)     # INTS
    elif s is not None:
        out += _field_bytes(4, s.encode()) + _field_varint(20, 3)        # STRING
    return out


def _node(op_type: str, inputs: List[str], outputs: List[str],
          attrs: List[bytes] = ()) -> bytes:
    out = b"".join(_field_bytes(1, s.encode()) for s in inputs)
    out += b"".join(_field_bytes(2, s.encode()) for s in outputs)
    out += _field_bytes(4, op_type.encode())
    out += b"".join(_field_bytes(5, a) for a in attrs)
    return out


def _tensor(name: str, arr: np.ndarray) -> bytes:
    arr = np.asarray(arr)
    if arr.dtype == np.float32:
        dt = _DT_FLOAT
    elif arr.dtype == np.int64:
        dt = _DT_INT64
    elif arr.dtype == np.uint8:
        dt = 2
    elif arr.dtype == np.int8:
        dt = 3
    elif arr.dtype == np.int32:
        dt = 6
    else:
        arr = arr.astype(np.float32)
        dt = _DT_FLOAT
    out = _field_packed_varints(1, arr.shape)
    out += _field_varint(2, dt)
    out += _field_bytes(8, name.encode())
    out += _field_bytes(9, np.ascontiguousarray(arr).tobytes())
    return out


def _value_info(name: str, shape: List, elem_type: int = _DT_FLOAT) -> bytes:
    dims = b""
    for d in shape:
        if isinstance(d, str):
            dims += _field_bytes(1, _field_bytes(2, d.encode()))  # dim_param
        else:
            dims += _field_bytes(1, _field_varint(1, int(d)))     # dim_value
    tensor_type = _field_varint(1, elem_type) + _field_bytes(2, dims)
    type_proto = _field_bytes(1, tensor_type)
    return _field_bytes(1, name.encode()) + _field_bytes(2, type_proto)


class _GraphBuilder:
    def __init__(self):
        self.nodes: List[bytes] = []
        self.inits: List[bytes] = []
        self._n = 0

    def fresh(self, hint: str) -> str:
        self._n += 1
        return f"{hint}_{self._n}"

    def init_tensor(self, name: str, arr: np.ndarray) -> str:
        self.inits.append(_tensor(name, arr))
        return name

    def add(self, op: str, inputs: List[str], attrs: List[bytes] = (),
            out: Optional[str] = None) -> str:
        out = out or self.fresh(op.lower())
        self.nodes.append(_node(op, inputs, [out], attrs))
        return out


def export_onnx(
    variables,
    path: str,
    input_size: int = 224,
    producer: str = "pixelbox-tpu",
) -> None:
    """Write the Flax EfficientNet embedder as ``image_similarity.onnx``
    (opset 11, NCHW f32 input "input" [batch,3,S,S], output "output"
    [batch,latent] — the exact contract of resources/train.py:167-174 /
    efficientnet.rs:5-14)."""
    from pixelbox_tpu.models.efficientnet import B0_CONFIG, BN_EPS

    params = variables["params"]
    stats = variables["batch_stats"]
    g = _GraphBuilder()

    def conv_w_name(name: str, kernel_hwio: np.ndarray, depthwise: bool) -> str:
        # flax HWIO → onnx/torch OIHW (depthwise stays (C,1,H,W)).
        w = np.transpose(np.asarray(kernel_hwio), (3, 2, 0, 1))
        return g.init_tensor(name, w.astype(np.float32))

    def convbn(x: str, p: dict, s: dict, src: str, *, stride=1, groups=1,
               act=True) -> str:
        k = np.asarray(p["conv"]["kernel"]).shape[0]
        pad = k // 2
        w = conv_w_name(f"{src}.0.weight", p["conv"]["kernel"], groups > 1)
        x = g.add(
            "Conv", [x, w],
            attrs=[
                _attr("strides", ints=[stride, stride]),
                _attr("pads", ints=[pad, pad, pad, pad]),
                _attr("group", i=groups),
                _attr("kernel_shape", ints=[k, k]),
            ],
        )
        x = g.add(
            "BatchNormalization",
            [
                x,
                g.init_tensor(f"{src}.1.weight", np.asarray(p["bn"]["scale"], np.float32)),
                g.init_tensor(f"{src}.1.bias", np.asarray(p["bn"]["bias"], np.float32)),
                g.init_tensor(f"{src}.1.running_mean", np.asarray(s["bn"]["mean"], np.float32)),
                g.init_tensor(f"{src}.1.running_var", np.asarray(s["bn"]["var"], np.float32)),
            ],
            attrs=[_attr("epsilon", f=BN_EPS)],
        )
        if act:  # SiLU = x * sigmoid(x) (opset 11 has no SiLU op)
            sig = g.add("Sigmoid", [x])
            x = g.add("Mul", [x, sig])
        return x

    def conv1x1_bias(x: str, p: dict, src: str) -> str:
        w = conv_w_name(f"{src}.weight", p["kernel"], False)
        b = g.init_tensor(f"{src}.bias", np.asarray(p["bias"], np.float32))
        return g.add("Conv", [x, w, b], attrs=[_attr("kernel_shape", ints=[1, 1])])

    x = "input"
    feats_p = params["features"]
    feats_s = stats["features"]
    x = convbn(x, feats_p["stem"], feats_s["stem"], "0.0", stride=2)
    in_ch = np.asarray(feats_p["stem"]["conv"]["kernel"]).shape[3]
    for stage_idx, (t, c, n, s_, k) in enumerate(B0_CONFIG):
        for block_idx in range(n):
            name = f"stage{stage_idx}_block{block_idx}"
            src = f"0.{stage_idx + 1}.{block_idx}.block"
            bp, bs = feats_p[name], feats_s[name]
            stride = s_ if block_idx == 0 else 1
            inp = x
            layer = 0
            if t != 1:
                x = convbn(x, bp["expand"], bs["expand"], f"{src}.{layer}")
                layer += 1
            expanded = in_ch * t
            x = convbn(
                x, bp["depthwise"], bs["depthwise"], f"{src}.{layer}",
                stride=stride, groups=expanded,
            )
            layer += 1
            # Squeeze-excitation.
            se = g.add("GlobalAveragePool", [x])
            se = conv1x1_bias(se, bp["se"]["fc1"], f"{src}.{layer}.fc1")
            sig = g.add("Sigmoid", [se])
            se = g.add("Mul", [se, sig])
            se = conv1x1_bias(se, bp["se"]["fc2"], f"{src}.{layer}.fc2")
            se = g.add("Sigmoid", [se])
            x = g.add("Mul", [x, se])
            layer += 1
            x = convbn(x, bp["project"], bs["project"], f"{src}.{layer}", act=False)
            if stride == 1 and in_ch == c:
                x = g.add("Add", [x, inp])
            in_ch = c
    x = convbn(x, feats_p["head"], feats_s["head"], "0.8")
    x = g.add("GlobalAveragePool", [x])
    x = g.add("Flatten", [x], attrs=[_attr("axis", i=1)])
    # Gemm with transB: torch Linear layout [latent, 1280].
    w = g.init_tensor(
        "3.weight", np.transpose(np.asarray(params["linear"]["kernel"], np.float32))
    )
    b = g.init_tensor("3.bias", np.asarray(params["linear"]["bias"], np.float32))
    x = g.add("Gemm", [x, w, b], attrs=[_attr("transB", i=1)])
    g.add("Tanh", [x], out="output")

    latent = int(np.asarray(params["linear"]["bias"]).shape[0])
    graph = b"".join(_field_bytes(1, n) for n in g.nodes)
    graph += _field_bytes(2, b"pixelbox_embedder")
    graph += b"".join(_field_bytes(5, t) for t in g.inits)
    graph += _field_bytes(
        11, _value_info("input", ["batch", 3, input_size, input_size])
    )
    graph += _field_bytes(12, _value_info("output", ["batch", latent]))

    model = _field_varint(1, 6)                     # ir_version 6 (opset 11 era)
    model += _field_bytes(2, producer.encode())     # producer_name
    model += _field_bytes(7, graph)
    model += _field_bytes(8, _field_varint(2, 11))  # opset_import {version: 11}
    with open(path, "wb") as f:
        f.write(model)
