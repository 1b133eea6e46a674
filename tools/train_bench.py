#!/usr/bin/env python
"""Training-step benchmark at REFERENCE geometry on the real TPU chip.

Measures per-step wall time (forward+backward+update, device-resident
state, scalar-fetch barrier) for:

  * VAE pretrain  — zdim=128, num_samples=5, T=481 (3 s @ 16 kHz),
    B in {8, 16, 32}, f32 vs bf16 compute, remat off/on
    (reference: i_dccrn_vae/pretrained_vaes/train.py, batch_size=15),
  * NSVAE         — dual-latent double-channel noisy encoder
    (reference batch_size=25),
  * Phase-2 classical and adversarial,
  * Supervised DCCRN (reference batch_size=48).

Emits TRAIN_BENCH.json: one record per config with step_ms,
audio-seconds/second throughput, and status ('ok' | 'oom').
Methodology per CLAUDE.md: batches live on device, the timing loop
never does host transfers; each timed window ends with a scalar fetch.
First compile of each config is minutes through the tunnel — excluded
from timing (2 warmup steps).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from idccrn_vae_tpu.losses.nsvae_loss import NsvaeTrueKlLoss  # noqa: E402
from idccrn_vae_tpu.losses.phase2 import EteTrainSeLoss, TwoPhaseLoss  # noqa: E402
from idccrn_vae_tpu.losses.vae_loss import (  # noqa: E402
    PretrainVaeLoss,
    kl_annealing_schedule,
)
from idccrn_vae_tpu.models.config import DccrnConfig  # noqa: E402
from idccrn_vae_tpu.train.nsvae import NsvaeTrainer  # noqa: E402
from idccrn_vae_tpu.train.phase2 import Phase2Trainer  # noqa: E402
from idccrn_vae_tpu.train.pretrain import PretrainTrainer  # noqa: E402
from idccrn_vae_tpu.train.supervised import SupervisedTrainer  # noqa: E402

FS = 16000
SECONDS = 3.0
L = int(SECONDS * FS)
STEPS = 8


def _wav(b, seed=0, count=1):
    rng = np.random.default_rng(seed)
    out = tuple(jnp.asarray(
        rng.standard_normal((b, L)).astype(np.float32) * 0.1)
        for _ in range(count))
    return out if count > 1 else out[0]


def _time_steps(trainer, state, batch, label):
    rng = jax.random.PRNGKey(0)
    try:
        for i in range(2):  # compile + settle
            state, m = trainer.train_step(state, batch, rng, 0)
        # scalar fetch, NOT block_until_ready: the tunnel's barrier can
        # return early and leak warm-up compute into the timed window
        _ = float(m["total"])
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, m = trainer.train_step(state, batch, rng, 0)
        _ = float(m["total"])  # scalar fetch barrier
        dt = (time.perf_counter() - t0) / STEPS
        return {"status": "ok", "step_ms": round(dt * 1000, 1),
                "loss": float(m["total"])}
    except Exception as e:  # noqa: BLE001  (record OOM/compile failures)
        msg = str(e)
        status = "oom" if "RESOURCE_EXHAUSTED" in msg or "memory" in \
            msg.lower() else "error"
        return {"status": status, "detail": msg[:200]}


def bench_pretrain(b, compute, remat):
    cfg = DccrnConfig(causal=True, zdim=128, num_samples=5,
                      compute=compute, remat=remat)
    loss = PretrainVaeLoss(kl_annealing_schedule(20), 1.0, num_samples=5)
    tr = PretrainTrainer(cfg, loss, 1e-3)
    r = _time_steps(tr, tr.init_state(), _wav(b), "pretrain")
    return {"trainer": "pretrain", "batch": b, "compute": compute,
            "remat": remat, "num_samples": 5, **r}


def bench_nsvae(b, compute):
    pre = DccrnConfig(causal=True, zdim=128, num_samples=5, compute=compute)
    noisy = dataclasses.replace(pre, latent_num=2, channel_mode="double")
    loss = NsvaeTrueKlLoss(alpha=1.0, w_resi=0.1, w_kl=1.0, w_dismiu=0.1,
                           cfg=noisy, matching="both")
    tr = NsvaeTrainer(pre, noisy, loss, 1e-3)
    r = _time_steps(tr, tr.init_state(), _wav(b, count=3), "nsvae")
    return {"trainer": "nsvae", "batch": b, "compute": compute, **r}


def bench_phase2(b, compute, adversarial):
    enc = DccrnConfig(causal=True, zdim=128, num_samples=5,
                      latent_num=1, compute=compute)
    dec = dataclasses.replace(enc, skip_mode="runtime", recon_type="mask")
    tr = Phase2Trainer(enc, dec, TwoPhaseLoss((1.0, 1.0, 0.0), 1.0, 1),
                       1e-3, adversarial=adversarial, d_step=1)
    r = _time_steps(tr, tr.init_state(), _wav(b, count=3), "phase2")
    return {"trainer": "phase2_adv" if adversarial else "phase2",
            "batch": b, "compute": compute, **r}


def bench_supervised(b, compute):
    cfg = DccrnConfig(causal=True, zdim=128, lstm_hidden=128,
                      recon_type="mask", compute=compute)
    tr = SupervisedTrainer(cfg, EteTrainSeLoss((1.0, 1.0, 1.0)), 1e-3)
    r = _time_steps(tr, tr.init_state(), _wav(b, count=2), "supervised")
    return {"trainer": "supervised", "batch": b, "compute": compute, **r}


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    results = []

    def run(fn, *args, **kw):
        rec = fn(*args, **kw)
        if rec.get("status") == "ok":
            rec["audio_s_per_s"] = round(
                rec["batch"] * SECONDS / (rec["step_ms"] / 1000), 1)
        results.append(rec)
        print(json.dumps(rec), file=sys.stderr, flush=True)
        with open("TRAIN_BENCH.json", "w") as f:
            json.dump({"fs": FS, "seconds": SECONDS, "T_frames": 481,
                       "zdim": 128, "steps_timed": STEPS,
                       "results": results}, f, indent=1)

    for b in (8, 16):
        for compute in ("f32", "bf16"):
            run(bench_pretrain, b, compute, remat=False)
    run(bench_pretrain, 16, "bf16", remat=True)
    run(bench_pretrain, 32, "bf16", remat=False)
    run(bench_pretrain, 32, "bf16", remat=True)
    run(bench_pretrain, 32, "f32", remat=False)
    run(bench_nsvae, 25, "bf16")
    run(bench_phase2, 15, "bf16", adversarial=False)
    run(bench_phase2, 15, "bf16", adversarial=True)
    run(bench_supervised, 48, "bf16")
    run(bench_supervised, 48, "f32")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
