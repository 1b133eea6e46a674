#!/usr/bin/env python
"""Probe: does int8 MXU compute beat bf16 on v5e for THIS model's ops?

v5e peak is 394 TOPS int8 vs 197 TFLOP/s bf16 (2x). Whether XLA:TPU
actually lowers int8 dot/conv to the int8 MXU path (vs emulating in
int32/f32) decides if a quantized serving mode is worth building.
This probe times, on-device (fori_loop-chained windows, scalar-fetch
barriers per CLAUDE.md):

  1. square dot_general: bf16 vs int8(+int32 accum), 2048^2 and 4096^2
  2. a decoder-stage-shaped conv (cpack layout, kernel (5,2), stride
     (2,1) transposed form as lhs-dilation): bf16 vs int8

Decision rule: build the quantized path only if int8 >= 1.5x bf16 on
the CONV probe (the model is conv-bound; dot wins alone don't pay).
Writes INT8_PROBE.json at the repo root.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def bench_loop(step, x0, iters):
    """step: x -> x (same shape/dtype). Returns seconds/iter."""
    @jax.jit
    def window(x, n):
        out = lax.fori_loop(0, n, lambda i, a: step(a), x)
        return jnp.sum(out.astype(jnp.float32).ravel()[:1])

    float(window(x0, 2))  # compile + warm, scalar fetch barrier
    t0 = time.perf_counter()
    float(window(x0, iters))
    return (time.perf_counter() - t0) / iters


def dot_probe(m, dtype, iters=50):
    if dtype == "bf16":
        a = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((m, m)) * 0.1, jnp.bfloat16)

        def step(x):
            return lax.dot(x, a)
        x0 = jnp.ones((m, m), jnp.bfloat16)
        flops = 2.0 * m ** 3
    else:
        a = jnp.asarray(np.random.default_rng(0)
                        .integers(-4, 5, (m, m)), jnp.int8)

        def step(x):
            y = lax.dot_general(x, a, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            # renormalize back to int8 so the loop carry stays int8
            return (y >> 7).astype(jnp.int8)
        x0 = jnp.ones((m, m), jnp.int8)
        flops = 2.0 * m ** 3
    t = bench_loop(step, x0, iters)
    return {"ms": round(t * 1e3, 3),
            "tops": round(flops / t / 1e12, 1)}


def conv_probe(dtype, iters=30):
    """Mid-decoder-shaped conv in cpack layout: input (B=80, 2C=256,
    F=33, T=481), kernel (5,2) over (F,T), 256->256 channels."""
    B, C, F, T = 80, 256, 33, 481
    kf, kt = 5, 2
    if dtype == "bf16":
        k = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((C, C, kf, kt)) * 0.05,
                        jnp.bfloat16)

        def step(x):
            return lax.conv_general_dilated(
                x, k, (1, 1), [(2, 2), (1, 0)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x0 = jnp.ones((B, C, F, T), jnp.bfloat16)
    else:
        k = jnp.asarray(np.random.default_rng(0)
                        .integers(-4, 5, (C, C, kf, kt)), jnp.int8)

        def step(x):
            y = lax.conv_general_dilated(
                x, k, (1, 1), [(2, 2), (1, 0)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.int32)
            return (y >> 7).astype(jnp.int8)
        x0 = jnp.ones((B, C, F, T), jnp.int8)
    flops = 2.0 * B * C * C * kf * kt * F * T  # same-size output approx
    t = bench_loop(step, x0, iters)
    return {"ms": round(t * 1e3, 3),
            "tops": round(flops / t / 1e12, 1)}


def bench_fixed(fn, x0, iters):
    """Time fn(x) when fn changes shape (no carry chaining): the loop
    carries a scalar that perturbs the input each iteration so XLA
    cannot hoist fn out of the loop. Returns seconds/iter."""
    @jax.jit
    def window(x, n):
        def body(i, acc):
            y = fn(x * (1 + acc * 1e-20).astype(x.dtype))
            # consume EVERY output element: reducing to one element lets
            # XLA slice the conv to a sliver (first attempt measured an
            # impossible 851 TOPS on the bf16 tconv)
            return acc + jnp.sum(y.astype(jnp.float32))
        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(window(x0, 2))
    t0 = time.perf_counter()
    float(window(x0, iters))
    return (time.perf_counter() - t0) / iters


def tconv_probe(dtype, iters=30):
    """The DECODER's actual op: lhs-dilated (transposed) conv. bf16's
    XLA lowering provably skips the inserted zeros (PROFILE_DECODER's
    dense-FLOP MFU > 1); this measures whether the int8 lowering does
    too — the end-to-end int8 bench regressed (1858x vs 2006x bf16,
    2026-08-18) while the regular-conv probe won 1.63x, and the
    decoder's dilated convs are the FLOPs majority."""
    B, Ci, Co, F, T = 80, 256, 256, 17, 481
    kf, kt = 5, 2
    pad = [(kf - 1 - 2, kf - 1 - 2), (kt - 1, kt - 1 - 1)]
    rng = np.random.default_rng(0)
    if dtype == "bf16":
        k = jnp.asarray(rng.standard_normal((kf, kt, Ci, Co)) * 0.05,
                        jnp.bfloat16)

        def op(x):
            return lax.conv_general_dilated(
                x, k, (1, 1), pad, lhs_dilation=(2, 1),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x0 = jnp.asarray(rng.standard_normal((B, F, T, Ci)) * 0.1,
                         jnp.bfloat16)
    else:
        k = jnp.asarray(rng.integers(-4, 5, (kf, kt, Ci, Co)), jnp.int8)

        def op(x):
            return lax.conv_general_dilated(
                x, k, (1, 1), pad, lhs_dilation=(2, 1),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
        x0 = jnp.asarray(rng.integers(-4, 5, (B, F, T, Ci)), jnp.int8)
    # useful (zero-skipping) FLOPs == the pre-dilation dense count
    flops = 2.0 * B * Ci * Co * kf * kt * F * T
    t = bench_fixed(op, x0, iters)
    return {"ms": round(t * 1e3, 3), "useful_tops": round(flops / t / 1e12, 1)}


def quant_overhead_probe(iters=30):
    """The non-conv cost _quantized_conv adds per stage: absmax reduce
    + round/clip/cast on the activation, and the dequant elementwise on
    the output — measured WITHOUT the conv."""
    B, Ci, F, T = 80, 256, 17, 481
    x0 = jnp.asarray(np.random.default_rng(0)
                     .standard_normal((B, F, T, Ci)) * 0.1, jnp.bfloat16)

    def op(x):
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        return (xq.astype(jnp.float32) * sx).astype(jnp.bfloat16)

    t = bench_fixed(op, x0, iters)
    return {"ms": round(t * 1e3, 3)}


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    out = {"device": str(jax.devices()[0])}
    for m in (2048, 4096):
        for dt in ("bf16", "int8"):
            key = f"dot_{m}_{dt}"
            try:
                out[key] = dot_probe(m, dt)
            except Exception as e:  # noqa: BLE001
                out[key] = {"error": str(e)[:200]}
            print(key, out[key], flush=True)
    for dt in ("bf16", "int8"):
        key = f"conv_dec_{dt}"
        try:
            out[key] = conv_probe(dt)
        except Exception as e:  # noqa: BLE001
            out[key] = {"error": str(e)[:200]}
        print(key, out[key], flush=True)
    for dt in ("bf16", "int8"):
        key = f"tconv_dec_{dt}"
        try:
            out[key] = tconv_probe(dt)
        except Exception as e:  # noqa: BLE001
            out[key] = {"error": str(e)[:200]}
        print(key, out[key], flush=True)
    try:
        out["quant_overhead"] = quant_overhead_probe()
    except Exception as e:  # noqa: BLE001
        out["quant_overhead"] = {"error": str(e)[:200]}
    print("quant_overhead", out["quant_overhead"], flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "INT8_PROBE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
