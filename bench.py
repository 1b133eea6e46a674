#!/usr/bin/env python
"""Benchmark: enhancement RTFx per chip on the flagship I-DCCRN-VAE path.

Measures the real-time factor (audio seconds enhanced per wall second)
of the full NSVAE-encoder + CVAE-decoder enhancement program (STFT ->
6-stage complex conv encoder -> 2-layer complex LSTM -> latent sampling
-> complex deconv decoder with skips -> ISTFT) at reference geometry
(zdim=128, channels to 256, causal, 16 kHz, 3 s utterances, serving
config num_samples=1, bf16 MXU compute).

Methodology: the whole measurement loop runs ON DEVICE as one jitted
`lax.fori_loop` (each iteration feeds the previous output back into the
input, so nothing can be elided), dispatched once per long window
(150 iterations, ~12 s) so per-dispatch control-path latency is <2% of
the measurement. This is sustained per-chip throughput, as in a
production serving loop where host I/O overlaps compute. Verified
convergent: 200- and 400-iteration windows agree to <1%.

OUTAGE RESILIENCE (round 4): the axon TPU tunnel this image uses has
documented multi-hour outages (round 3 lost its driver perf capture to
one). Before measuring, a tiny matmul PROBE runs in a `timeout`-guarded
SUBPROCESS (a downed tunnel HANGS rather than erroring, so an in-process
probe would wedge the benchmark); on failure the probe retries with a
long backoff across BENCH_RETRY_WINDOW_S (default 2 h — the driver gets
one shot per round, so the window is spent waiting out the outage). If
the window expires, ONE parseable JSON line is still printed:
  {"metric": "enhance_rtfx_per_chip", "value": null, "error":
   "backend_unavailable", ...}
and the process exits 0, so the driver records a structured failure
instead of a null parse. Knobs (env):
  BENCH_RETRY_WINDOW_S   total seconds to keep retrying (default 7200)
  BENCH_PROBE_TIMEOUT_S  per-probe timeout (default 300 — measured
                          r4: first connect after the tunnel has sat
                          idle takes 2-4 min even when it is UP, so a
                          120 s probe misreads a cold tunnel as down)
  BENCH_PROBE_INTERVAL_S sleep between failed probes (default 300)
  BENCH_MEASURE_TIMEOUT_S hard kill on the measurement subprocess
                          (default 2400 — covers the first remote
                          compile); a tunnel dropping MID-measurement
                          hangs rather than raising, so the measurement
                          also runs in a subprocess
  IDCCRN_BENCH_PROGRAM   clean_direct (default) | dual_complex_mask —
                          the latter benches the latent_num=2
                          dual-decoder serving program (NSVAE dual
                          encoder + speech/noise decoders + complex
                          ratio mask) via eval/enhance.py Enhancer
  IDCCRN_BENCH_BATCHES   comma list overriding the default batch sweep
                          (32,128); use for the dual-decoder program,
                          whose ~2x memory crashed the worker at B=128
  IDCCRN_BENCH_TINY=1    CPU-runnable smoke geometry (tiny channels,
                          0.4 s clips, B=2, 2 iters) so the suite can
                          execute both programs end-to-end; the RTFx
                          printed is meaningless
  IDCCRN_BENCH_FAKE_OUTAGE=1  force every probe to fail (tests the
                              error path without a real outage)
  IDCCRN_BENCH_FAKE_HANG=1    make the measure subprocess hang (tests
                              the watchdog)

On success prints ONE JSON line:
  {"metric": "enhance_rtfx_per_chip", "value": N, "unit": "x_realtime",
   "vs_baseline": N/300}
vs_baseline is the ratio against the BASELINE.json north-star target of
RTFx >= 300x per chip (the reference publishes no throughput numbers).
"""

import json
import os
import subprocess
import sys
import time

FS = 16000
SECONDS = 3.0
ITERS = 150

_PROBE_CODE = """
import os, jax, jax.numpy as jnp
p = os.environ.get("IDCCRN_BENCH_PLATFORM")
if p:  # sitecustomize pins axon; the config update is what actually wins
    jax.config.update("jax_platforms", p)
x = jnp.ones((64, 64), jnp.float32)
v = float((x @ x).sum())
assert v == 64.0 * 64 * 64
print("PROBE_OK", jax.devices()[0].platform)
"""


def probe_backend_once(timeout_s: float) -> bool:
    """One tiny-matmul liveness probe in a subprocess with a hard kill.

    Subprocess because a downed tunnel makes device calls HANG (not
    raise) — r3's judge probe hung for 90 s; only an external timeout
    can bound that.
    """
    if os.environ.get("IDCCRN_BENCH_FAKE_OUTAGE") == "1":
        return False
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            timeout=timeout_s, capture_output=True, text=True)
        return r.returncode == 0 and "PROBE_OK" in r.stdout
    except subprocess.TimeoutExpired:
        return False
    except OSError:
        return False


def wait_for_backend() -> bool:
    """Retry the probe across the configured window. Returns liveness."""
    window = float(os.environ.get("BENCH_RETRY_WINDOW_S", 7200))
    timeout_s = float(os.environ.get("BENCH_PROBE_TIMEOUT_S", 300))
    interval = float(os.environ.get("BENCH_PROBE_INTERVAL_S", 300))
    deadline = time.monotonic() + window
    attempt = 0
    while True:
        attempt += 1
        if probe_backend_once(timeout_s):
            if attempt > 1:
                print(f"# backend up after {attempt} probes", file=sys.stderr)
            return True
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return False
        print(f"# backend probe {attempt} failed; retrying for another "
              f"{remaining:.0f}s", file=sys.stderr)
        time.sleep(min(interval, max(remaining, 0.0)))


def emit_failure(reason: str, detail: str = "") -> None:
    line = {"metric": "enhance_rtfx_per_chip", "value": None,
            "unit": "x_realtime", "vs_baseline": None, "error": reason}
    if detail:
        line["detail"] = detail[:500]
    print(json.dumps(line))


def measure() -> float:
    import jax

    p = os.environ.get("IDCCRN_BENCH_PLATFORM")
    if p:  # same override the probe honors (CPU smoke runs)
        jax.config.update("jax_platforms", p)

    import jax.numpy as jnp
    from jax import lax

    from idccrn_vae_tpu.models.config import DccrnConfig
    from idccrn_vae_tpu.models.nsvae import NsvaeEncoder, split_noisy_skips
    from idccrn_vae_tpu.models.vae import VaeDecoder

    # IDCCRN_BENCH_COMPUTE=int8 measures the quantized serving mode
    # (serving-only int8 MXU convs, ops/conv.py _quantized_conv);
    # main() validates the value before anything runs
    compute = os.environ.get("IDCCRN_BENCH_COMPUTE", "bf16")
    program = os.environ.get("IDCCRN_BENCH_PROGRAM", "clean_direct")
    # IDCCRN_BENCH_TINY=1: CPU-runnable smoke geometry so the suite can
    # execute BOTH serving programs end-to-end (the RTFx it prints is
    # meaningless; only the code path matters)
    tiny = os.environ.get("IDCCRN_BENCH_TINY") == "1"
    geo = dict(encoder_channels=(1, 2, 2, 4, 4, 4, 4), zdim=4) if tiny \
        else dict(zdim=128)
    seconds = 0.4 if tiny else SECONDS
    iters = 2 if tiny else ITERS
    batches = (2,) if tiny else (32, 128)
    if os.environ.get("IDCCRN_BENCH_BATCHES"):
        # override, e.g. "32,64" — the dual-decoder program carries ~2x
        # the memory of clean_direct and B=128 crashed the TPU worker
        batches = tuple(int(b) for b in
                        os.environ["IDCCRN_BENCH_BATCHES"].split(","))
    n = int(FS * seconds)

    if program == "dual_complex_mask":
        # The latent_num=2 serving program (test_nsvae_se.py
        # --latent_to_use 2 --outtype complex_mask): dual-latent NSVAE
        # encoder + speech AND noise decoders + complex ratio mask.
        # Measured through the REAL serving class (eval/enhance.py
        # Enhancer.forward) rather than a re-implementation.
        import dataclasses

        from idccrn_vae_tpu.eval.enhance import Enhancer

        enc_cfg = DccrnConfig(causal=True, num_samples=1,
                              latent_num=2, channel_mode="double",
                              compute=compute, **geo)
        dec_cfg = dataclasses.replace(enc_cfg, latent_num=1,
                                      channel_mode="normal")
        enc = NsvaeEncoder(enc_cfg)
        dec = VaeDecoder(dec_cfg)
        enh = Enhancer(enc_cfg, dec_cfg,
                       enc.init(jax.random.PRNGKey(0)),
                       dec.init(jax.random.PRNGKey(1)),
                       noise_dec_vars=VaeDecoder(dec_cfg).init(
                           jax.random.PRNGKey(2)),
                       num_samples=1, outtype="complex_mask",
                       latent_to_use=2, pad_mode="sig")

        def enhance(wav, key):
            return enh.forward(enh.enc_vars, enh.dec_vars,
                               enh.noise_dec_vars, wav, key)
    else:
        cfg = DccrnConfig(causal=True, num_samples=1,
                          latent_num=1, compute=compute, **geo)
        enc = NsvaeEncoder(cfg)
        dec = VaeDecoder(cfg)
        enc_vars = enc.init(jax.random.PRNGKey(0))
        dec_vars = dec.init(jax.random.PRNGKey(1))

        def enhance(wav, key):
            out, _ = enc.apply(enc_vars, wav, train=False, rng=key,
                               num_samples=1)
            skips = split_noisy_skips(out.skips, cfg, "speech")
            (recon, _pred), _ = dec.apply(dec_vars, out.stft_x,
                                          out.z_speech, skips,
                                          train=False, num_samples=1,
                                          pad_mode="sig")
            return recon

    @jax.jit
    def bench_window(wav, key, iters):
        def body(i, out):
            wav2 = wav + 1e-6 * out
            return enhance(wav2, jax.random.fold_in(key, i))

        out = lax.fori_loop(0, iters, body, wav)
        return jnp.mean(out)

    # Batch sweep (measured, v5e): 32 -> 1366x, 64 -> 1368x, 96 -> 1677x,
    # 128 -> 2005x, 192 -> 1676x, 256 -> 1995x, 384 -> compile failure.
    # Power-of-two batches tile best; 128 is the sweet spot.
    results = []
    for batch in batches:
        key = jax.random.PRNGKey(7)
        wav = jax.random.normal(key, (batch, n), jnp.float32) * 0.1
        float(bench_window(wav, key, 2))  # compile + warm (scalar fetch)
        t0 = time.perf_counter()
        float(bench_window(wav, key, iters))  # fetch forces completion
        dt = time.perf_counter() - t0
        results.append(iters * batch * seconds / dt)
    return max(results)


def run_measure_subprocess():
    """Run measure() in a SUBPROCESS with a hard timeout.

    The probe covers a tunnel that is down *before* the run; a tunnel
    that drops *mid-measurement* makes the in-flight device call HANG
    (not raise) — the same pathology the probe subprocess exists for —
    so the measurement needs its own external kill. Returns
    (rtfx | None, error detail | None). BENCH_MEASURE_TIMEOUT_S
    (default 2400 s) must cover the multi-minute first remote compile.
    """
    timeout_s = float(os.environ.get("BENCH_MEASURE_TIMEOUT_S", 2400))
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--measure"],
            timeout=timeout_s, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return None, f"measurement hang (> {timeout_s:.0f}s, killed)"
    if r.stderr:
        sys.stderr.write(r.stderr)
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()
        return None, (tail[-1][:300] if tail
                      else f"measure exited {r.returncode}")
    for line in reversed(r.stdout.splitlines()):
        if line.startswith("MEASURE_RESULT "):
            return float(line.split(" ", 1)[1]), None
    return None, "measure subprocess printed no result line"


def main():
    compute = os.environ.get("IDCCRN_BENCH_COMPUTE", "bf16")
    if compute not in ("f32", "bf16", "int8"):  # fail BEFORE the probe
        raise SystemExit(f"IDCCRN_BENCH_COMPUTE={compute!r} is not one "
                         "of f32/bf16/int8")
    program = os.environ.get("IDCCRN_BENCH_PROGRAM", "clean_direct")
    if program not in ("clean_direct", "dual_complex_mask"):
        raise SystemExit(f"IDCCRN_BENCH_PROGRAM={program!r} is not one "
                         "of clean_direct/dual_complex_mask")
    if "--measure" in sys.argv:
        if os.environ.get("IDCCRN_BENCH_FAKE_HANG") == "1":
            time.sleep(3600)  # exercises the parent's watchdog in tests
        print(f"MEASURE_RESULT {measure()}", flush=True)
        return
    if not wait_for_backend():
        emit_failure("backend_unavailable")
        return
    # The probe passed, but the tunnel can still drop mid-measurement
    # (hang OR error); one more probe-gated retry covers that edge.
    for retry in (True, False):
        best, err = run_measure_subprocess()
        if best is not None:
            break
        if retry and wait_for_backend():
            continue
        emit_failure("measurement_failed", err or "")
        return
    line = {
        "metric": "enhance_rtfx_per_chip",
        "value": round(best, 2),
        "unit": "x_realtime",
        "vs_baseline": round(best / 300.0, 3),
    }
    compute = os.environ.get("IDCCRN_BENCH_COMPUTE", "bf16")
    if compute != "bf16":  # label non-default modes so numbers can't mix
        line["compute"] = compute
    if program != "clean_direct":
        line["program"] = program
    print(json.dumps(line))


if __name__ == "__main__":
    main()
