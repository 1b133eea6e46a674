#!/usr/bin/env python
"""On-device streaming chunk_step benchmark -> STREAM_BENCH.json
(VERDICT r2 missing #5 / next-round #5).

cli/stream_enhance.py measures wall-clock through the ~1 s/12 MB axon
tunnel, which says nothing about on-chip latency. This script measures
the jitted chunk_step where it matters: a `lax.fori_loop` chains the
StreamState through N steps ON DEVICE (one dispatch, no host round
trips), a scalar fetch proves completion (block_until_ready through
the tunnel can return early — CLAUDE.md), and per-chunk time =
wall / N. Reports the realtime margin chunk_duration / step_time per
configuration at reference geometry (zdim=128, reference channels,
causal), the deployment path bf16 plus an f32 point.

The LSTM probe (on unless --skip-lstm-probe) times the bare LSTM at
chunk-sized T. It was
used in round 3 to give the then-opt-in Pallas kernel its one honest
shot at the B=1 latency niche (VERDICT r2 weak #4); the kernel lost
(105-120 us stateless vs the scan's 103-108 us stateful, committed in
STREAM_BENCH.json) and was deleted, so the probe now times the scan
backend only.

Usage: python tools/stream_bench_tpu.py [--iters 300] [--out STREAM_BENCH.json]
(run alone: host/tunnel contention inflates numbers 3-10x)
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

FS = 16000


def bench_chunk_step(cfg, batch, chunk_frames, iters, seed=0):
    from idccrn_vae_tpu.eval.streaming import StreamingEnhancer
    from idccrn_vae_tpu.models.nsvae import NsvaeEncoder
    from idccrn_vae_tpu.models.vae import VaeDecoder

    enc_vars = NsvaeEncoder(cfg).init(jax.random.PRNGKey(seed))
    dec_vars = VaeDecoder(cfg).init(jax.random.PRNGKey(seed + 1))
    streamer = StreamingEnhancer(cfg, cfg, enc_vars, dec_vars,
                                 chunk_frames=chunk_frames)
    m = streamer.chunk_samples
    step = streamer._chunk_step

    @jax.jit
    def loop(ev, dv, state, chunk):
        def body(_i, carry):
            st, acc = carry
            out, st = step(ev, dv, st, chunk)
            return st, acc + out[0, 0]

        _st, acc = jax.lax.fori_loop(0, iters, body,
                                     (state, jnp.float32(0)))
        return acc

    ev = jax.device_put(enc_vars)
    dv = jax.device_put(dec_vars)
    st = jax.device_put(streamer.init_state(batch))
    chunk = jax.device_put(jnp.asarray(
        0.1 * np.random.default_rng(0).standard_normal((batch, m)),
        jnp.float32))
    float(loop(ev, dv, st, chunk))          # compile + warm, scalar fetch
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = loop(ev, dv, st, chunk)
        float(acc)                          # completion barrier
        walls.append(time.perf_counter() - t0)
    per_chunk_ms = min(walls) / iters * 1e3
    chunk_ms = m / FS * 1e3
    return {
        "batch": batch, "chunk_frames": chunk_frames,
        "chunk_ms": round(chunk_ms, 3),
        "per_chunk_ms": round(per_chunk_ms, 4),
        "realtime_margin": round(chunk_ms / per_chunk_ms, 1),
        "streams_realtime": round(batch * chunk_ms / per_chunk_ms, 1),
        "walls_s": [round(w, 3) for w in walls],
        "compute": cfg.compute,
    }


def bench_lstm(backend, T, iters, stateful, compute="bf16"):
    """Standalone 2-layer 1280->128 complex LSTM at B=1 (the streaming
    bottleneck geometry)."""
    from idccrn_vae_tpu.ops.lstm import complex_lstm, init_complex_lstm

    params = init_complex_lstm(jax.random.PRNGKey(0), 1280, 128, 2)
    cdt = jnp.bfloat16 if compute == "bf16" else jnp.float32
    x = jax.device_put(jnp.asarray(
        0.1 * np.random.default_rng(0).standard_normal((1, T, 2 * 1280)),
        jnp.float32))

    if stateful:

        @jax.jit
        def loop(p, x):
            def body(_i, carry):
                st, acc = carry
                out, st = complex_lstm(x, p, compute_dtype=cdt,
                                       backend=backend, state=st,
                                       return_state=True)
                return st, acc + out[0, 0, 0]

            out, st0 = complex_lstm(x, p, compute_dtype=cdt,
                                    backend=backend, return_state=True)
            st, acc = jax.lax.fori_loop(0, iters, body,
                                        (st0, out[0, 0, 0]))
            return acc
        # the warm-up call above makes the jitted program run iters+1
        # lstm calls; divide by the true call count so per-call numbers
        # aren't inflated (the us-level margins here decide backends)
        calls = iters + 1
    else:

        @jax.jit
        def loop(p, x):
            def body(_i, carry):
                xc, acc = carry
                out = complex_lstm(xc, p, compute_dtype=cdt,
                                   backend=backend)
                # chain iterations through the input so XLA cannot hoist
                return xc + 0 * out[:, :1, :1], acc + out[0, 0, 0]

            _xc, acc = jax.lax.fori_loop(0, iters, body,
                                         (x, jnp.float32(0)))
            return acc
        calls = iters

    p = jax.device_put(params)
    float(loop(p, x))
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(p, x))
        walls.append(time.perf_counter() - t0)
    return round(min(walls) / calls * 1e6, 1)  # us per call


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--out", default=os.path.join(REPO, "STREAM_BENCH.json"))
    ap.add_argument("--skip-lstm-probe", action="store_true")
    args = ap.parse_args()

    from idccrn_vae_tpu.models.config import DccrnConfig

    report = {"device": str(jax.devices()[0]),
              "geometry": "reference (zdim=128, channels 32..256, causal)",
              "configs": [], "lstm_probe_us": {}}

    base = DccrnConfig(causal=True, latent_num=1, num_samples=1,
                       compute="bf16")
    for batch, cf in ((1, 1), (1, 5), (1, 10), (8, 10)):
        r = bench_chunk_step(base, batch, cf, args.iters)
        print(json.dumps(r), flush=True)
        report["configs"].append(r)
    r = bench_chunk_step(
        DccrnConfig(causal=True, latent_num=1, num_samples=1,
                    compute="f32"), 1, 10, args.iters)
    print(json.dumps(r), flush=True)
    report["configs"].append(r)

    if not args.skip_lstm_probe:
        for T in (1, 10):
            # (the Pallas kernel branch was removed with the kernel in
            # round 3 — STREAM_BENCH.json's committed pallas_stateless
            # numbers are the record of why: 105-120 us vs the scan's
            # 103-108 us at this geometry, with no carried-state path)
            probe = {
                "scan_stateful": bench_lstm("scan", T, args.iters, True),
                "scan_stateless": bench_lstm("scan", T, args.iters, False),
            }
            report["lstm_probe_us"][f"T{T}_B1"] = probe
            print(f"lstm probe T={T}: {probe}", flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
