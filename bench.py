#!/usr/bin/env python
"""Benchmark: enhancement RTFx per chip on the flagship I-DCCRN-VAE path.

Measures real-time factor (audio seconds enhanced per wall second) of
the full NSVAE-encoder + CVAE-decoder enhancement program (STFT ->
6-stage complex conv encoder -> 2-layer complex LSTM -> latent sampling
-> complex deconv decoder with skips -> ISTFT) at the reference
geometry (zdim=128, channels up to 256, causal, 16 kHz, 3 s utterances,
serving config num_samples=1).

Prints ONE JSON line:
  {"metric": "enhance_rtfx_per_chip", "value": N, "unit": "x_realtime",
   "vs_baseline": N/300}
vs_baseline is the ratio against the BASELINE.json north-star target of
RTFx >= 300x per chip (the reference publishes no throughput numbers).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from idccrn_vae_tpu.eval.enhance import Enhancer
from idccrn_vae_tpu.models.config import DccrnConfig

FS = 16000
SECONDS = 3.0


def main():
    cfg = DccrnConfig(causal=True, zdim=128, num_samples=1, latent_num=1)
    dec_cfg = cfg

    from idccrn_vae_tpu.models.nsvae import NsvaeEncoder
    from idccrn_vae_tpu.models.vae import VaeDecoder

    enc = NsvaeEncoder(cfg)
    dec = VaeDecoder(dec_cfg)
    enc_vars = enc.init(jax.random.PRNGKey(0))
    dec_vars = dec.init(jax.random.PRNGKey(1))

    enhancer = Enhancer(cfg, dec_cfg, enc_vars, dec_vars, num_samples=1,
                        outtype="clean_direct")

    n_samples = int(FS * SECONDS)
    best_rtfx = 0.0
    for batch in (8, 16, 32):
        wav = np.random.default_rng(0).standard_normal(
            (batch, enhancer.bucket_length(n_samples))
        ).astype(np.float32) * 0.1
        # warmup / compile
        out = enhancer.enhance_batch(wav)
        jax.block_until_ready(out)
        iters = 5
        t0 = time.perf_counter()
        for i in range(iters):
            out = enhancer.enhance_batch(wav, rng=jax.random.PRNGKey(i))
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        audio_seconds = iters * batch * wav.shape[1] / FS
        rtfx = audio_seconds / dt
        best_rtfx = max(best_rtfx, rtfx)

    print(json.dumps({
        "metric": "enhance_rtfx_per_chip",
        "value": round(best_rtfx, 2),
        "unit": "x_realtime",
        "vs_baseline": round(best_rtfx / 300.0, 3),
    }))


if __name__ == "__main__":
    main()
