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
) -> jnp.ndarray:
    """Complex conv over cpack feature maps.

    Args:
      x: (B, F, T, 2*Cin).
      stride/padding: (freq, time) as in the reference net config.
      causal: if True, reproduces causal_complex_conv2d (symmetric time
        pad then drop the last output column) via left-only time padding.
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
) -> jnp.ndarray:
    """Complex transposed conv (torch ConvTranspose2d semantics) on cpack maps.

    Matches ComplexConvTranspose2d / causal_ComplexConvTranspose2d
    (complex_progress.py:222-279): causal trims the last output time
    column, expressed here as asymmetric padding (no wasted compute).

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
    pad_f = (kh - 1 - pf, kh - 1 - pf)
    if causal:
        # symmetric pad then trim last output column -> drop right pad by 1
        pad_t = (kw - 1 - pt, kw - 1 - pt - 1)
    else:
        pad_t = (kw - 1 - pt, kw - 1 - pt)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    pref = jnp.float32 if x.dtype == jnp.float32 else None  # see above
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
