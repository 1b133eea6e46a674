"""Minimal native ONNX executor — runs the DNSMOS models without
onnxruntime.

The reference scores DNSMOS through onnxruntime sessions over four
small CNN .onnx files (DNSMOS/dnsmos_local.py:24-25). onnxruntime is
not installable in this image, so this module implements just enough
of ONNX to execute those graphs natively:

  * a protobuf WIRE-FORMAT parser for the ModelProto subset the models
    use (no onnx/protobuf-codegen dependency — the wire format is
    stable and documented),
  * a numpy executor for the 17 op types they contain (opset 12):
    Conv, MatMul, Add, Mul, Div, Pow, Sqrt, Log, Max, Relu, MaxPool,
    ReduceMax, Transpose, Reshape, Concat, Slice, Unsqueeze.

`InferenceSession` mirrors the two onnxruntime calls the scorer makes
(`run(None, {name: array})`), so eval/dnsmos.py can use either backend
interchangeably. Numerics are float32; Conv takes a torch (oneDNN) CPU
fast path when torch imports (it is >95% of a DNSMOS window's cost —
~3.5x over the numpy accumulated-GEMM form), with the numpy
implementation kept as fallback and parity oracle
(IDCCRN_ONNX_NUMPY=1 forces it).
"""

from __future__ import annotations

import os
import struct
from typing import Dict, List

import numpy as np

# Conv fast path: torch's oneDNN CPU conv is ~3.5x the accumulated-GEMM
# numpy form on the DNSMOS 900x161 maps (0.22 s vs 0.77 s for the
# 128->64 3x3 stage; channels_last another ~25%), and Conv is >95% of a
# scoring window's cost. numpy stays as the always-available fallback
# and the parity oracle (tests/test_dnsmos.py). IDCCRN_ONNX_NUMPY=1
# forces the numpy path.
try:
    if os.environ.get("IDCCRN_ONNX_NUMPY"):
        raise ImportError
    import torch as _torch
    import torch.nn.functional as _F
except ImportError:  # pragma: no cover - torch is baked into this image
    _torch = None

# ---------------------------------------------------------------------------
# protobuf wire-format parsing (ModelProto subset)
# ---------------------------------------------------------------------------


def _read_varint(b: bytes, i: int):
    out = 0
    shift = 0
    while True:
        x = b[i]
        i += 1
        out |= (x & 0x7F) << shift
        if not x & 0x80:
            return out, i
        shift += 7


def _fields(b: bytes):
    """Yield (field_number, wire_type, value) over a message buffer."""
    i = 0
    n = len(b)
    while i < n:
        tag, i = _read_varint(b, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _read_varint(b, i)
        elif wt == 2:
            ln, i = _read_varint(b, i)
            v = b[i : i + ln]
            i += ln
        elif wt == 5:
            v = b[i : i + 4]
            i += 4
        elif wt == 1:
            v = b[i : i + 8]
            i += 8
        else:  # pragma: no cover - groups don't appear in ONNX
            raise ValueError(f"unsupported wire type {wt}")
        yield fn, wt, v


_DTYPES = {1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32,
           7: np.int64, 9: np.bool_, 11: np.float64}


def _parse_tensor(b: bytes) -> tuple:
    """TensorProto -> (name, ndarray)."""
    dims: List[int] = []
    dtype = 1
    raw = None
    floats: List[float] = []
    int64s: List[int] = []
    int32s: List[int] = []
    name = ""
    for fn, wt, v in _fields(b):
        if fn == 1:
            if wt == 0:
                dims.append(v)
            else:  # packed
                i = 0
                while i < len(v):
                    x, i = _read_varint(v, i)
                    dims.append(x)
        elif fn == 2:
            dtype = v
        elif fn == 4:
            if wt == 5:
                floats.append(struct.unpack("<f", v)[0])
            else:
                floats.extend(
                    struct.unpack(f"<{len(v) // 4}f", v))
        elif fn == 5:
            if wt == 0:
                int32s.append(v)
            else:
                i = 0
                while i < len(v):
                    x, i = _read_varint(v, i)
                    int32s.append(x)
        elif fn == 7:
            if wt == 0:
                int64s.append(v)
            else:
                i = 0
                while i < len(v):
                    x, i = _read_varint(v, i)
                    int64s.append(x)
        elif fn == 8:
            name = v.decode()
        elif fn == 9:
            raw = v
    np_dtype = _DTYPES.get(dtype, np.float32)
    if raw is not None:
        arr = np.frombuffer(raw, np_dtype)
    elif floats:
        arr = np.asarray(floats, np_dtype)
    elif int64s:
        # int64 varints are two's-complement encoded in 64 bits
        arr = np.asarray([x - (1 << 64) if x >= (1 << 63) else x
                          for x in int64s], np_dtype)
    elif int32s:
        arr = np.asarray(int32s, np_dtype)
    else:
        arr = np.zeros(0, np_dtype)
    return name, arr.reshape(dims) if dims else arr.reshape(())


def _parse_attr(b: bytes) -> tuple:
    """AttributeProto -> (name, value) for the types the models use."""
    name = ""
    val = None
    ints: List[int] = []
    for fn, wt, v in _fields(b):
        if fn == 1:
            name = v.decode()
        elif fn == 2:  # f
            val = struct.unpack("<f", v)[0]
        elif fn == 3:  # i
            val = v - (1 << 64) if v >= (1 << 63) else v
        elif fn == 4:  # s
            val = v.decode()
        elif fn == 5:  # t
            val = _parse_tensor(v)[1]
        elif fn == 8:  # ints
            if wt == 0:
                ints.append(v)
            else:
                i = 0
                while i < len(v):
                    x, i = _read_varint(v, i)
                    ints.append(x)
    if ints:
        val = [x - (1 << 64) if x >= (1 << 63) else x for x in ints]
    return name, val


class _Node:
    __slots__ = ("op", "inputs", "outputs", "attrs")

    def __init__(self, b: bytes):
        self.inputs: List[str] = []
        self.outputs: List[str] = []
        self.attrs: Dict[str, object] = {}
        self.op = ""
        for fn, wt, v in _fields(b):
            if fn == 1:
                self.inputs.append(v.decode())
            elif fn == 2:
                self.outputs.append(v.decode())
            elif fn == 4:
                self.op = v.decode()
            elif fn == 5:
                k, val = _parse_attr(v)
                self.attrs[k] = val


def _io_name(b: bytes) -> str:
    for fn, wt, v in _fields(b):
        if fn == 1:
            return v.decode()
    return ""


def parse_model(path: str):
    """ONNX file -> (nodes, initializers, input_names, output_names)."""
    data = open(path, "rb").read()
    graph = None
    for fn, wt, v in _fields(data):
        if fn == 7:
            graph = v
    if graph is None:
        raise ValueError(f"no GraphProto in {path}")
    nodes, inits, ins, outs = [], {}, [], []
    for fn, wt, v in _fields(graph):
        if fn == 1:
            nodes.append(_Node(v))
        elif fn == 5:
            name, arr = _parse_tensor(v)
            inits[name] = arr
        elif fn == 11:
            ins.append(_io_name(v))
        elif fn == 12:
            outs.append(_io_name(v))
    ins = [n for n in ins if n not in inits]  # graph inputs minus weights
    return nodes, inits, ins, outs


# ---------------------------------------------------------------------------
# numpy op implementations (NCHW convention, as exported)
# ---------------------------------------------------------------------------


def _conv(x, w, b, attrs):
    """Conv (group=1): NCHW x, OIHW w. torch fast path, numpy fallback."""
    if attrs.get("group", 1) != 1:  # pragma: no cover
        raise NotImplementedError("grouped conv")
    if _torch is not None:
        return _conv_torch(x, w, b, attrs)
    return _conv_numpy(x, w, b, attrs)


def _conv_torch(x, w, b, attrs):
    """oneDNN conv via torch.

    Stays in the default contiguous (NCHW) layout: channels_last makes
    conv2d itself ~25% faster on the DNSMOS maps but the per-call
    layout round trip (`.to(channels_last)` + `.contiguous()`) costs
    more than it saves when every node boundary is a numpy array
    (measured 0.75 s vs 0.45 s per scoring window for the 9 convs)."""
    n_sp = x.ndim - 2
    strides = [int(s) for s in attrs.get("strides", [1] * n_sp)]
    pads = [int(p) for p in attrs.get("pads", [0] * (2 * n_sp))]
    dil = [int(d) for d in attrs.get("dilations", [1] * n_sp)]
    xt = _torch.from_numpy(np.ascontiguousarray(x, np.float32))
    wt = _torch.from_numpy(np.ascontiguousarray(w, np.float32))
    bt = None if b is None else _torch.from_numpy(
        np.ascontiguousarray(b, np.float32))
    begin, end = pads[:n_sp], pads[n_sp:]
    if begin != end:
        # ONNX pads may be asymmetric; torch's padding arg is symmetric.
        # F.pad takes (last-dim begin, last-dim end, ..., first spatial).
        flat = []
        for d in reversed(range(n_sp)):
            flat += [begin[d], end[d]]
        xt = _F.pad(xt, flat)
        begin = [0] * n_sp
    with _torch.no_grad():
        conv = _F.conv1d if n_sp == 1 else _F.conv2d
        out = conv(xt, wt, bt, stride=strides, padding=begin, dilation=dil)
    return out.numpy()


def _conv_numpy(x, w, b, attrs):
    """Reference numpy Conv — fallback and parity oracle for _conv_torch."""
    strides = attrs.get("strides", [1] * (x.ndim - 2))
    pads = attrs.get("pads", [0] * (2 * (x.ndim - 2)))
    dil = attrs.get("dilations", [1] * (x.ndim - 2))
    n_sp = x.ndim - 2
    pad_width = [(0, 0), (0, 0)] + [
        (pads[i], pads[i + n_sp]) for i in range(n_sp)]
    x = np.pad(x, pad_width)
    if n_sp == 1:  # promote 1-D conv to 2-D
        x = x[..., None]
        w = w[..., None]
        strides = list(strides) + [1]
        dil = list(dil) + [1]
    n, c, h, ww = x.shape
    co, ci, kh, kw = w.shape
    sh, sw = strides
    dh, dw = dil
    oh = (h - (kh - 1) * dh - 1) // sh + 1
    ow = (ww - (kw - 1) * dw - 1) // sw + 1
    # kh*kw accumulated GEMMs: each kernel offset contributes
    # W[:, :, i, j] @ shifted-input — BLAS-bound, no im2col blowup
    # (the naive im2col einsum took 84 s on the DNSMOS 900x161 maps).
    out = np.zeros((co, n, oh, ow), np.float32)
    for i in range(kh):
        for j in range(kw):
            patch = x[:, :, i * dh : i * dh + oh * sh : sh,
                      j * dw : j * dw + ow * sw : sw]
            out += np.tensordot(w[:, :, i, j], patch, axes=([1], [1]))
    out = np.transpose(out, (1, 0, 2, 3))
    if b is not None:
        out = out + b[None, :, None, None]
    if n_sp == 1:
        out = out[..., 0]
    return np.ascontiguousarray(out, np.float32)


def _maxpool(x, attrs):
    kh, kw = attrs["kernel_shape"]
    sh, sw = attrs.get("strides", attrs["kernel_shape"])
    pads = attrs.get("pads", [0, 0, 0, 0])
    if _torch is not None and pads == [0, 0, 0, 0]:
        with _torch.no_grad():
            out = _F.max_pool2d(
                _torch.from_numpy(np.ascontiguousarray(x, np.float32)),
                kernel_size=(int(kh), int(kw)), stride=(int(sh), int(sw)))
        return out.numpy()
    x = np.pad(x, [(0, 0), (0, 0), (pads[0], pads[2]), (pads[1], pads[3])],
               constant_values=-np.inf)
    n, c, h, w = x.shape
    oh = (h - kh) // sh + 1
    ow = (w - kw) // sw + 1
    out = np.full((n, c, oh, ow), -np.inf, x.dtype)
    for i in range(kh):
        for j in range(kw):
            out = np.maximum(
                out, x[:, :, i : i + oh * sh : sh, j : j + ow * sw : sw])
    return out


def _slice(x, starts, ends, axes=None, steps=None):
    starts = np.asarray(starts).astype(np.int64)
    ends = np.asarray(ends).astype(np.int64)
    axes = (np.arange(len(starts)) if axes is None
            else np.asarray(axes).astype(np.int64))
    steps = (np.ones(len(starts), np.int64) if steps is None
             else np.asarray(steps).astype(np.int64))
    sl = [slice(None)] * x.ndim
    for s, e, a, st in zip(starts, ends, axes, steps):
        # clamp the INT64_MAX sentinels
        e = min(int(e), np.iinfo(np.int32).max)
        s = max(int(s), -(2**31))
        sl[int(a)] = slice(s, e, int(st))
    return x[tuple(sl)]


class InferenceSession:
    """onnxruntime.InferenceSession lookalike (CPU numpy)."""

    def __init__(self, path: str):
        self.nodes, self.inits, self.input_names, self.output_names = (
            parse_model(path))

    def get_inputs(self):  # minimal API-compat shim
        class _I:  # noqa: N801
            def __init__(self, name):
                self.name = name

        return [_I(n) for n in self.input_names]

    def run(self, output_names, feeds: Dict[str, np.ndarray]):
        env: Dict[str, np.ndarray] = dict(self.inits)
        for k, v in feeds.items():
            env[k] = np.asarray(v, np.float32)
        for nd in self.nodes:
            ins = [env[i] if i else None for i in nd.inputs]
            op = nd.op
            if op == "Conv":
                out = _conv(ins[0], ins[1],
                            ins[2] if len(ins) > 2 else None, nd.attrs)
            elif op == "MatMul":
                out = ins[0] @ ins[1]
            elif op == "Add":
                out = ins[0] + ins[1]
            elif op == "Mul":
                out = ins[0] * ins[1]
            elif op == "Div":
                out = ins[0] / ins[1]
            elif op == "Pow":
                out = np.power(ins[0], ins[1])
            elif op == "Sqrt":
                out = np.sqrt(ins[0])
            elif op == "Log":
                out = np.log(ins[0])
            elif op == "Max":
                out = ins[0]
                for other in ins[1:]:
                    out = np.maximum(out, other)
            elif op == "Relu":
                out = np.maximum(ins[0], 0)
            elif op == "MaxPool":
                out = _maxpool(ins[0], nd.attrs)
            elif op == "ReduceMax":
                axes = tuple(nd.attrs.get("axes", range(ins[0].ndim)))
                keep = bool(nd.attrs.get("keepdims", 1))
                out = np.max(ins[0], axis=axes, keepdims=keep)
            elif op == "Transpose":
                out = np.transpose(ins[0], nd.attrs.get("perm"))
            elif op == "Reshape":
                out = ins[0].reshape([int(d) for d in ins[1]])
            elif op == "Concat":
                out = np.concatenate(ins, axis=nd.attrs.get("axis", 0))
            elif op == "Slice":
                out = _slice(ins[0], ins[1], ins[2],
                             ins[3] if len(ins) > 3 else None,
                             ins[4] if len(ins) > 4 else None)
            elif op == "Unsqueeze":
                axes = nd.attrs.get("axes")
                if axes is None:
                    axes = [int(a) for a in ins[1]]
                out = ins[0]
                for a in sorted(axes):
                    out = np.expand_dims(out, a)
            elif op == "Squeeze":
                axes = nd.attrs.get("axes")
                out = np.squeeze(
                    ins[0], axis=tuple(axes) if axes else None)
            elif op == "Identity":
                out = ins[0]
            elif op == "Sigmoid":
                out = 1.0 / (1.0 + np.exp(-ins[0]))
            else:  # pragma: no cover
                raise NotImplementedError(f"ONNX op {op}")
            for o in nd.outputs:
                env[o] = out
        names = output_names or self.output_names
        return [env[n] for n in names]
