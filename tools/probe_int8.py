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
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "INT8_PROBE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
