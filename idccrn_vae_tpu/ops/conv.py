"""Complex 2-D convolutions as single block-matrix real convolutions.

The reference implements complex conv as 4 applications of 2 real
Conv2d kernels (``re = conv_re(xr) - conv_im(xi)``, ``im = conv_re(xi)
+ conv_im(xr)``; /root/reference/model/complex_progress.py:24-36 and
:253-279). On TPU we instead build ONE real convolution over the cpack
layout ``(B, F, T, 2*Cin) -> (B, F', T', 2*Cout)`` with the block kernel

    K = [[ Wr,  Wi],
        [-Wi,  Wr]]   (input blocks x output blocks)

so the whole complex product is a single `lax.conv_general_dilated`
that XLA tiles onto the MXU — no 4-pass launch overhead, full lane
utilization.

Causality (complex_progress.py:8-22: symmetric pad then trim the last
time column) is expressed directly as asymmetric explicit padding so no
wasted columns are computed.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

# Parameters are dicts of arrays so they compose into flax param trees:
#   {"wr": (kh, kw, Cin, Cout), "wi": ..., "br": (Cout,), "bi": (Cout,)}


def _fan_in_uniform(key, shape, fan_in, dtype):
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_complex_conv2d(
    key, in_ch: int, out_ch: int, kernel_size: Sequence[int], dtype=jnp.float32
):
    """torch nn.Conv2d-style kaiming-uniform init for both real/imag kernels."""
    kh, kw = kernel_size
    fan_in = in_ch * kh * kw
    ks = jax.random.split(key, 4)
    return {
        "wr": _fan_in_uniform(ks[0], (kh, kw, in_ch, out_ch), fan_in, dtype),
        "wi": _fan_in_uniform(ks[1], (kh, kw, in_ch, out_ch), fan_in, dtype),
        "br": _fan_in_uniform(ks[2], (out_ch,), fan_in, dtype),
        "bi": _fan_in_uniform(ks[3], (out_ch,), fan_in, dtype),
    }


def init_complex_conv_transpose2d(
    key, in_ch: int, out_ch: int, kernel_size: Sequence[int], dtype=jnp.float32
):
    """torch nn.ConvTranspose2d-style init (fan_in = out_ch * kh * kw)."""
    kh, kw = kernel_size
    fan_in = out_ch * kh * kw
    ks = jax.random.split(key, 4)
    return {
        "wr": _fan_in_uniform(ks[0], (kh, kw, in_ch, out_ch), fan_in, dtype),
        "wi": _fan_in_uniform(ks[1], (kh, kw, in_ch, out_ch), fan_in, dtype),
        "br": _fan_in_uniform(ks[2], (out_ch,), fan_in, dtype),
        "bi": _fan_in_uniform(ks[3], (out_ch,), fan_in, dtype),
    }


def _quantized_conv(x, kernel, stride, pad_spec, lhs_dilation=None):
    """int8 MXU convolution with dynamic symmetric quantization.

    Serving-only (round() has no useful gradient). Activations get a
    dynamic abs-max scale PER SAMPLE (axis 0) — per-batch scaling would
    make each utterance's output depend on its batchmates' levels (a
    50x-louder batchmate was measured driving a quiet utterance's conv
    error from 1% to 38%) and on batch size; the inputs are post-BN/
    PReLU feature maps, so within one sample a single scale is well
    conditioned. The block kernel gets per-OUTPUT-channel scales so
    each complex component's weight range is covered independently.
    Accumulation is int32 (max K here is 2Cin*kh*kw = 5120 -> |acc| <=
    127^2*5120 ~ 8.3e7 << 2^31). Dequantized output is bf16 so
    inter-stage HBM traffic matches the bf16 path. Measured on v5e:
    1.63x over bf16 at the regular (encoder) conv shape, parity on the
    lhs-dilated (decoder) shape (INT8_PROBE.json).
    """
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True),
                     1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    kf = kernel.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-12) / 127.0
    kq = jnp.clip(jnp.round(kf / sw), -127, 127).astype(jnp.int8)
    y = lax.conv_general_dilated(
        xq,
        kq,
        window_strides=tuple(stride),
        padding=pad_spec,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * (sx * sw)).astype(jnp.bfloat16)


def _quantize_stage(quant: bool, quant_min_ch: int, params: dict) -> bool:
    """int8 applies only where both channel counts clear quant_min_ch
    (params wr is (kh, kw, Cin, Cout)); edge stages keep bf16."""
    cin, cout = params["wr"].shape[2], params["wr"].shape[3]
    return quant and min(cin, cout) >= quant_min_ch


def _block_kernel(wr: jnp.ndarray, wi: jnp.ndarray) -> jnp.ndarray:
    """Assemble the 2x2 complex block kernel in HWIO.

    wr/wi: (kh, kw, Cin, Cout) -> (kh, kw, 2*Cin, 2*Cout) computing
    out_re = x_re*wr - x_im*wi ; out_im = x_re*wi + x_im*wr.
    """
    top = jnp.concatenate([wr, wi], axis=-1)  # input block: real
    bot = jnp.concatenate([-wi, wr], axis=-1)  # input block: imag
    return jnp.concatenate([top, bot], axis=-2)


def complex_conv2d(
    x: jnp.ndarray,
    params: dict,
    stride: Sequence[int],
    padding: Sequence[int],
    causal: bool = False,
    compute_dtype=None,
    quant: bool = False,
    quant_min_ch: int = 16,
) -> jnp.ndarray:
    """Complex conv over cpack feature maps.

    Args:
      x: (B, F, T, 2*Cin).
      stride/padding: (freq, time) as in the reference net config.
      causal: if True, reproduces causal_complex_conv2d (symmetric time
        pad then drop the last output column) via left-only time padding.
      quant: serving-only int8 MXU path for stages whose channel counts
        clear quant_min_ch (see _quantized_conv).
    Returns:
      (B, F', T', 2*Cout).
    """
    pf, pt = padding
    if causal:
        # Reference pads (pt, pt) then trims the last output column; with
        # time stride 1 that equals asymmetric padding (pt, pt - 1) — the
        # trimmed column is exactly the one produced by the last right pad.
        pad_spec = [(pf, pf), (pt, pt - 1)]
    else:
        pad_spec = [(pf, pf), (pt, pt)]
    kernel = _block_kernel(params["wr"], params["wi"])
    # Reference applies each conv's own bias in all 4 passes, so the
    # effective bias is br - bi (real part) and br + bi (imag part).
    bias = jnp.concatenate(
        [params["br"] - params["bi"], params["br"] + params["bi"]]
    )
    if _quantize_stage(quant, quant_min_ch, params):
        out = _quantized_conv(x, kernel, stride, pad_spec)
        return out + bias.astype(out.dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    # preferred_element_type=f32 with bf16 operands breaks the conv VJP
    # (f32 cotangent vs bf16 kernel); XLA:TPU accumulates bf16 convs in
    # f32 internally regardless, so only request f32 output for f32 in.
    pref = jnp.float32 if x.dtype == jnp.float32 else None
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=tuple(stride),
        padding=pad_spec,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pref,
    )
    # keep reduced-precision activations between stages: casting back to
    # f32 would double the HBM traffic that dominates this pipeline.
    return out + bias.astype(out.dtype)


def complex_conv_transpose2d(
    x: jnp.ndarray,
    params: dict,
    stride: Sequence[int],
    padding: Sequence[int],
    causal: bool = False,
    compute_dtype=None,
    quant: bool = False,
    quant_min_ch: int = 16,
) -> jnp.ndarray:
    """Complex transposed conv (torch ConvTranspose2d semantics) on cpack maps.

    Matches ComplexConvTranspose2d / causal_ComplexConvTranspose2d
    (complex_progress.py:222-279): causal trims the last output time
    column, expressed here as asymmetric padding (no wasted compute).

    A SUB-PIXEL formulation (one dense stride-1 conv emitting both freq
    phases as extra channels, interleaved after) exists behind
    IDCCRN_TCONV=subpixel for the reference geometry; it loses
    end-to-end on v5e despite winning standalone — see _use_subpixel
    for the measured numbers. Default is XLA's lhs-dilated lowering.

    Args:
      x: (B, F, T, 2*Cin); params wr/wi are (kh, kw, Cin, Cout) — torch's
        transposed-conv weight (Cin, Cout, kh, kw) reindexed to HWIO; the
        spatial flip below turns it into the equivalent forward kernel.
    """
    kh, kw = params["wr"].shape[:2]
    pf, pt = padding
    sf, st = stride
    # torch ConvTranspose2d == conv of lhs-dilated input with the
    # spatially-flipped kernel, padding (k - 1 - p) per side.
    wr = jnp.flip(params["wr"], axis=(0, 1))
    wi = jnp.flip(params["wi"], axis=(0, 1))
    kernel = _block_kernel(wr, wi)
    # Same effective-bias combination as complex_conv2d (4-pass biases).
    bias = jnp.concatenate(
        [params["br"] - params["bi"], params["br"] + params["bi"]]
    )
    if causal:
        # symmetric pad then trim last output column -> drop right pad by 1
        pad_t = (kw - 1 - pt, kw - 1 - pt - 1)
    else:
        pad_t = (kw - 1 - pt, kw - 1 - pt)
    if _quantize_stage(quant, quant_min_ch, params):
        out = _quantized_conv(x, kernel, (1, 1),
                              [(kh - 1 - pf, kh - 1 - pf), pad_t],
                              lhs_dilation=(sf, st))
        return out + bias.astype(out.dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    pref = jnp.float32 if x.dtype == jnp.float32 else None  # see above

    if (kh, sf, st, pf) == (5, 2, 1, 2) and _use_subpixel(x.shape[1]):
        return _subpixel_tconv_f2(x, kernel, bias, pad_t, pref)

    pad_f = (kh - 1 - pf, kh - 1 - pf)
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=[pad_f, pad_t],
        lhs_dilation=(sf, st),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pref,
    )
    return out + bias.astype(out.dtype)


def _use_subpixel(f_in: int) -> bool:
    """Formulation switch for the transposed conv, A/B-instrumented via
    IDCCRN_TCONV = 'dilated' (default) | 'subpixel', plus
    IDCCRN_SUBPIXEL_MAXF=<f> to enable it only below a freq size.

    MEASURED NEGATIVE RESULT (v5e, end-to-end bench.py at B=32 bf16 —
    don't redo): the sub-pixel form wins 3.8x in a STANDALONE
    per-stage harness (tools/profile_decoder.py: 141 -> 38 ms over the
    decoder) but LOSES end-to-end: RTFx 1366 (dilated) vs 1021
    (subpixel), 1299 (subpixel only f_in=5), 1175 (f_in<=17). The
    standalone harness pins the conv input to an argument layout that
    penalizes XLA's dilated lowering; inside the full program the
    dilated conv fuses/layouts well, and the phase-interleave transpose
    breaks producer-consumer fusion. Defaults to dilated everywhere."""
    import os

    mode = os.environ.get("IDCCRN_TCONV", "dilated")
    if mode == "subpixel":
        return True
    return f_in <= int(os.environ.get("IDCCRN_SUBPIXEL_MAXF", "0"))


def _subpixel_tconv_f2(x, kernel, bias, pad_t, pref):
    """kh=5/sf=2/pf=2 transposed conv as one dense stride-1 conv.

    In dilated coordinates (pad (2,2), flipped kernel K), output freq
    row 2r = K[0]x[r-1] + K[2]x[r] + K[4]x[r+1] and row 2r+1 =
    K[1]x[r] + K[3]x[r+1]: both phases are 3-tap stride-1 convs over
    the UNdilated input, so emit them as doubled output channels and
    interleave. Output rows: 2*F_in - 1 (the trailing phase-1 row is
    torch's implicit-pad trim).
    """
    zero = jnp.zeros_like(kernel[0])
    ph0 = jnp.stack([kernel[0], kernel[2], kernel[4]], axis=0)
    ph1 = jnp.stack([zero, kernel[1], kernel[3]], axis=0)
    k3 = jnp.concatenate([ph0, ph1], axis=-1)  # (3, kw, 2Ci, 2*2Co)
    y = lax.conv_general_dilated(
        x,
        k3,
        window_strides=(1, 1),
        padding=[(1, 1), pad_t],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pref,
    )
    b, f, t, c2 = y.shape
    co = c2 // 2
    y = y.reshape(b, f, t, 2, co)
    y = jnp.transpose(y, (0, 1, 3, 2, 4)).reshape(b, 2 * f, t, co)
    return y[:, : 2 * f - 1] + bias.astype(y.dtype)
