#!/usr/bin/env python
"""Decoder deep-dive (VERDICT r1 next-#5): per-stage timings, analytic
FLOPs -> MFU, and formulation experiments for the transposed conv.

Serving shapes (bench.py): B=32, causal, zdim=128, ns=1, bf16, T=481.

Experiments per decoder stage:
  A. current: lax.conv_general_dilated with lhs_dilation (NHWC/HWIO)
  B. NCHW/OIHW dimension numbers (layout hypothesis)
  C. sub-pixel: ONE stride-1 conv producing both freq phases as extra
     output channels + depth-to-space interleave — avoids computing on
     the inserted zeros IF XLA materializes them (MAC ratio 3/5 for
     kernel 5 stride 2)

Timing: each candidate runs as its own jitted loop of ITERS chained
applications on device (output fed back via a slice-refresh so nothing
is elided), scalar fetch at the end. Prints a table + writes
PROFILE_DECODER.json.
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

from idccrn_vae_tpu.models.config import DccrnConfig, decoder_plan, freq_sizes  # noqa: E402
from idccrn_vae_tpu.ops.conv import _block_kernel, init_complex_conv_transpose2d  # noqa: E402

B, T = 32, 481
ITERS = 50
PEAK_BF16 = 197e12  # v5e MXU peak


def _time_fn(fn, *args):
    fn = jax.jit(fn)
    out = fn(*args)
    # scalar fetch, NOT block_until_ready: the tunnel's barrier can
    # return early and leak warm-up compute into the timed window
    _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    dt = time.perf_counter() - t0
    return dt / ITERS


def _loop(body):
    def fn(x, kernel, seed):
        def step(i, x):
            y = body(x, kernel)
            # full-reduction feedback: mean(y) needs EVERY output
            # element, so XLA cannot dead-code-eliminate any of the conv
            return x * 0.999 + seed * jnp.mean(y)
        return lax.fori_loop(0, ITERS, step, x)
    return fn


def current_tconv(x, kernel):
    return lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1),
        padding=[(2, 2), (1, 0)], lhs_dilation=(2, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def nchw_tconv(x, kernel):
    # x arrives NCHW, kernel OIHW
    return lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1),
        padding=[(2, 2), (1, 0)], lhs_dilation=(2, 1),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def subpixel_tconv(x, kernels):
    """Both freq phases from ONE stride-1 conv + interleave.

    For lhs_dilation 2, pad (2,2), kernel 5: output row 2r uses input
    rows r-1,r,r+1 with taps (4,2,0); row 2r+1 uses r,r+1 with taps
    (3,1). Build a (3,kw,Ci,2*Co) kernel: phase-0 taps at positions
    0,1,2 and phase-1 taps at 1,2 (position 0 zero)."""
    k3 = kernels  # (3, kw, 2Ci, 2*2Co) pre-assembled
    y = lax.conv_general_dilated(
        x, k3, window_strides=(1, 1), padding=[(1, 1), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b, f, t, c2 = y.shape
    co = c2 // 2
    y = y.reshape(b, f, t, 2, co)          # phases
    y = jnp.transpose(y, (0, 1, 3, 2, 4)).reshape(b, 2 * f, t, co)
    return y


def make_subpixel_kernel(kernel):
    """(5, kw, Ci, Co) dilated-conv kernel -> (3, kw, Ci, 2*Co)."""
    kh, kw, ci, co = kernel.shape
    assert kh == 5
    # In dilated coords, output row 2r sums K[0]x[r-1]+K[2]x[r]+K[4]x[r+1]
    # and row 2r+1 sums K[1]x[r]+K[3]x[r+1] (K = the already-flipped
    # kernel current_tconv consumes).
    ph0 = jnp.stack([kernel[0], kernel[2], kernel[4]], axis=0)
    ph1 = jnp.stack([jnp.zeros_like(kernel[0]), kernel[1], kernel[3]],
                    axis=0)
    return jnp.concatenate([ph0, ph1], axis=-1)  # (3, kw, Ci, 2Co)


def main():
    cfg = DccrnConfig(causal=True, zdim=128)
    plan = decoder_plan(cfg)
    fs = [5] + list(reversed(freq_sizes(cfg)[:-1])) + [257]
    results = []
    key = jax.random.PRNGKey(0)
    for i, (cin, cout) in enumerate(plan):
        f_in, f_out = fs[i], fs[i + 1]
        params = init_complex_conv_transpose2d(key, cin, cout, (5, 2),
                                               jnp.bfloat16)
        wr = jnp.flip(params["wr"], axis=(0, 1))
        wi = jnp.flip(params["wi"], axis=(0, 1))
        kernel = _block_kernel(wr, wi)           # (5,2,2Ci,2Co)
        x = jax.random.normal(jax.random.PRNGKey(i), (B, f_in, T, 2 * cin),
                              jnp.bfloat16)

        # correctness of the subpixel rewrite vs current (f32 check)
        k32 = kernel.astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        ref = current_tconv(x32, k32)
        sub = subpixel_tconv(x32, make_subpixel_kernel(k32))
        err = float(jnp.max(jnp.abs(ref - sub[:, : ref.shape[1]])))
        assert err < 1e-3, (i, err)

        t_cur = _time_fn(_loop(current_tconv), x, kernel, jnp.bfloat16(1e-6))
        x_nchw = jnp.transpose(x, (0, 3, 1, 2))
        k_oihw = jnp.transpose(kernel, (3, 2, 0, 1))
        t_nchw = _time_fn(_loop(nchw_tconv), x_nchw, k_oihw,
                          jnp.bfloat16(1e-6))
        k_sub = make_subpixel_kernel(kernel)
        t_sub = _time_fn(_loop(subpixel_tconv), x, k_sub, jnp.bfloat16(1e-6))

        # analytic MACs (dense-dilated counts the zero taps, useful
        # counts only real taps: 5 -> 2.5 avg per output row)
        dense_macs = B * f_out * T * (2 * cin) * (2 * cout) * 5 * 2
        useful_macs = dense_macs / 2
        rec = {
            "stage": i, "cin": cin, "cout": cout, "f_in": f_in,
            "f_out": f_out,
            "ms_current": round(t_cur * 1e3, 3),
            "ms_nchw": round(t_nchw * 1e3, 3),
            "ms_subpixel": round(t_sub * 1e3, 3),
            "gflop_dense": round(2 * dense_macs / 1e9, 1),
            "mfu_current_dense": round(2 * dense_macs / t_cur / PEAK_BF16, 3),
            "mfu_current_useful": round(
                2 * useful_macs / t_cur / PEAK_BF16, 3),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    with open("PROFILE_DECODER.json", "w") as f:
        json.dump({"B": B, "T": T, "iters": ITERS,
                   "peak_bf16_tflops": PEAK_BF16 / 1e12,
                   "results": results}, f, indent=1)
    tot = {k: round(sum(r[k] for r in results), 2)
           for k in ("ms_current", "ms_nchw", "ms_subpixel")}
    print("totals:", json.dumps(tot))


if __name__ == "__main__":
    main()
