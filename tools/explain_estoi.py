"""Why does the classical phase-2 leg LOSE ESTOI while gaining
+5.2 dB SI-SNR and +0.70 PESQ (E2E_TRAIN.json eval stage)?

Controlled experiment on the same synthetic corpus generator the E2E
demo trains on (idccrn_vae_tpu/data/synth.py): apply ORACLE spectral
masks of increasing suppression aggressiveness (Wiener gain raised to a
power beta, beta=0 == identity/noisy) plus a mask-estimation-error arm
(time-frequency smearing of the oracle mask, modeling what an imperfect
estimator does), and score SI-SNR / PESQ / ESTOI per SNR bucket with
the repo's own metric stack (idccrn_vae_tpu/eval/metrics.py).

The question the sweep answers: on THIS corpus, does aggressive
suppression alone reproduce the classical leg's metric signature
(SI-SNR up, PESQ up, ESTOI DOWN vs noisy), or does it take mask error?
The companion evidence already captured in E2E_TRAIN.json is the DNSMOS
decomposition: classical p2 gains BAK +1.72 but loses SIG -0.44
(adversarial: BAK +1.77, SIG -0.17) -- i.e. the classical leg buys its
noise removal with speech distortion, which ESTOI (an envelope
-correlation intelligibility proxy) punishes and SI-SNR/PESQ forgive.

CONCLUSION (full-size run, ESTOI_ANALYSIS.json, 2026-08-18): the
classical leg's -0.019 ESTOI delta is NOT an over-suppression effect
and NOT reproducible by any masking mechanism tried -- all 16 arms
(oracle Wiener beta 0.5-4, time/freq smearing, blind spectral
subtraction x1-x8, stochastic mask jitter sigma 0.5-2) RAISE ESTOI on
this corpus (noisy 0.292 -> 0.31-0.85), even arms that wreck SI-SNR.
Two findings close the anomaly: (1) per-utterance noisy ESTOI SD is
0.15, so at N=24 an unpaired delta needs +-0.085 for 95% resolution --
the observed -0.019 is statistical noise at this corpus size; (2) the
SYSTEMATIC ordering classical < adversarial < supervised holds across
both ESTOI (-0.019 / +0.009 / +0.031) and the independent DNSMOS SIG
axis (-0.44 / -0.17 / -0.15), i.e. the classical leg's resynthesized
speech carries real residual distortion that the adversarial loss
partially repairs -- exactly the reference's motivation for its
adversarial second phase (ref: i_dccrn_vae/nsvae_dccrn/
train_second_phase_adversarial.py).

Writes ESTOI_ANALYSIS.json at the repo root. CPU-only, ~4 min.
ESTOI_TINY=1 shrinks to a smoke-test geometry.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from idccrn_vae_tpu.data.synth import (SNR_BUCKETS, bucket_label, mix_at_snr,
                                       synth_noise, synth_speech)
from idccrn_vae_tpu.eval.metrics import EvalMetrics

FS = 16000
NFFT, HOP = 512, 128
_WIN = np.hanning(NFFT + 1)[:-1]


def _stft(x: np.ndarray) -> np.ndarray:
    # zero-pad NFFT on both ends so every ORIGINAL sample has full
    # window overlap in the OLA resynthesis -- without this, masked
    # edge frames divide by a near-zero window sum and single boundary
    # samples blow up to ~60x the signal peak, wrecking SI-SNR.
    x = np.concatenate([np.zeros(NFFT), x, np.zeros(NFFT)])
    n = (len(x) - NFFT) // HOP + 1
    idx = np.arange(n)[:, None] * HOP + np.arange(NFFT)[None, :]
    return np.fft.rfft(x[idx] * _WIN, axis=1)  # (T, F)


def _istft(spec: np.ndarray, n_out: int) -> np.ndarray:
    frames = np.fft.irfft(spec, NFFT, axis=1) * _WIN
    n_pad = n_out + 2 * NFFT
    out = np.zeros(n_pad)
    wsum = np.zeros(n_pad)
    for i in range(frames.shape[0]):
        out[i * HOP : i * HOP + NFFT] += frames[i]
        wsum[i * HOP : i * HOP + NFFT] += _WIN ** 2
    out = out / np.maximum(wsum, 1e-8)
    return out[NFFT : NFFT + n_out]


def _smear(mask: np.ndarray, t_rad: int, f_rad: int) -> np.ndarray:
    """Box-blur the mask over +-t_rad frames / +-f_rad bins: a mask
    that is right on average but mistimed/misplaced, the cheapest
    stand-in for estimation error."""
    out = mask
    if t_rad:
        k = np.ones(2 * t_rad + 1) / (2 * t_rad + 1)
        out = np.apply_along_axis(lambda v: np.convolve(v, k, "same"), 0, out)
    if f_rad:
        k = np.ones(2 * f_rad + 1) / (2 * f_rad + 1)
        out = np.apply_along_axis(lambda v: np.convolve(v, k, "same"), 1, out)
    return out


def run(per_bucket: int = 8, utt_seconds: float = 6.5, seed: int = 7,
        only_arms: "tuple | None" = None) -> dict:
    rng = np.random.default_rng(seed)
    n = int(utt_seconds * FS)
    metrics = EvalMetrics("all")

    # one in-memory val set, bucket-balanced like make_corpus
    utts = []
    for b, (lo, hi) in enumerate(SNR_BUCKETS):
        for _ in range(per_bucket):
            sp = synth_speech(rng, n, FS)
            nz, _ = synth_noise(rng, n, FS)
            snr = float(rng.uniform(lo, hi))
            noisy, nz_scaled = mix_at_snr(sp, nz, snr)
            utts.append((bucket_label(lo, hi), sp, nz_scaled, noisy))

    # (name, kind, param, t_rad, f_rad).  'oracle' = Wiener from true
    # S/V raised to param; 'blind' = spectral subtraction against a
    # STATIONARY noise-floor estimate (20th percentile of |Y|^2 over
    # time) with over-subtraction factor param -- what any estimator
    # does when its noise model misses the nonstationary bursts.
    arms = [("noisy", "id", 0.0, 0, 0)]
    arms += [(f"wiener^{b:g}", "oracle", b, 0, 0) for b in (0.5, 1.0, 2.0, 4.0)]
    arms += [("wiener^1 smear_t3", "oracle", 1.0, 3, 0),
             ("wiener^1 smear_t8", "oracle", 1.0, 8, 0),
             ("wiener^2 smear_t8", "oracle", 2.0, 8, 0),
             ("wiener^1 smear_t8_f4", "oracle", 1.0, 8, 4)]
    arms += [(f"specsub x{a:g}", "blind", a, 0, 0) for a in (1.0, 2.0, 4.0, 8.0)]
    # 'jitter' = oracle Wiener with iid lognormal amplitude noise on
    # the mask (sigma=param in log-amplitude): stochastic-resynthesis
    # surrogate -- a decoder that re-SYNTHESIZES the spectrum from a
    # sampled latent injects modulation noise that is uncorrelated
    # with the clean band envelopes.
    arms += [(f"wiener^1 jitter{s:g}", "jitter", s, 0, 0)
             for s in (0.5, 1.0, 2.0)]
    if only_arms is not None:
        # the 'noisy' baseline arm is load-bearing (delta denominator +
        # dispersion block) — keep it regardless of the subset asked for
        arms = [a for a in arms
                if a[0] in only_arms or a[0] == "noisy"]

    report = {}
    noisy_estoi_per_utt: list = []
    for name, kind, param, t_rad, f_rad in arms:
        per_bucket_scores: dict = {}
        for bucket, sp, nz, noisy in utts:
            if kind == "id":
                est = noisy
            else:
                Y = _stft(noisy)
                if kind in ("oracle", "jitter"):
                    S, V = _stft(sp), _stft(nz)
                    w = (np.abs(S) ** 2) / (
                        np.abs(S) ** 2 + np.abs(V) ** 2 + 1e-12)
                    if kind == "jitter":
                        w = w * np.exp(param * rng.standard_normal(w.shape))
                    else:
                        w = w ** param
                else:
                    py = np.abs(Y) ** 2
                    nf = np.percentile(py, 20, axis=0, keepdims=True)
                    w = np.maximum(1.0 - param * nf / (py + 1e-12), 0.0)
                w = _smear(w, t_rad, f_rad)
                est = _istft(Y * w, len(noisy))
            _, sisdr, pesq, estoi = metrics.eval(est, sp, FS)
            if kind == "id":
                noisy_estoi_per_utt.append(float(estoi))
            per_bucket_scores.setdefault(bucket, []).append(
                (float(sisdr), float(pesq), float(estoi)))
        rows = {}
        for bucket, vals in per_bucket_scores.items():
            a = np.array(vals)
            rows[bucket] = {"sisdr": round(float(np.median(a[:, 0])), 3),
                            "pesq": round(float(np.median(a[:, 1])), 3),
                            "estoi": round(float(np.median(a[:, 2])), 4)}
        allv = np.array([v for vals in per_bucket_scores.values() for v in vals])
        rows["ALL"] = {"sisdr": round(float(np.median(allv[:, 0])), 3),
                       "pesq": round(float(np.median(allv[:, 1])), 3),
                       "estoi": round(float(np.median(allv[:, 2])), 4)}
        report[name] = rows
        print(f"{name:24s} ALL  sisdr={rows['ALL']['sisdr']:7.3f}  "
              f"pesq={rows['ALL']['pesq']:5.3f}  estoi={rows['ALL']['estoi']:7.4f}",
              flush=True)

    base = report["noisy"]["ALL"]
    deltas = {name: {m: round(rows["ALL"][m] - base[m], 4)
                     for m in ("sisdr", "pesq", "estoi")}
              for name, rows in report.items() if name != "noisy"}
    # dispersion of per-utterance noisy ESTOI: how big a delta the
    # E2E protocol (N=24 val utts, unpaired summary CIs) can resolve
    sd = float(np.array(noisy_estoi_per_utt).std(ddof=1))
    resolvable = {"noisy_estoi_sd": round(sd, 4),
                  "unpaired_delta_95ci_at_n24":
                      round(1.96 * sd * np.sqrt(2.0 / 24.0), 4)}
    return {"per_bucket": report, "delta_vs_noisy_ALL": deltas,
            "noisy_estoi_dispersion": resolvable,
            "geometry": {"per_bucket": per_bucket, "utt_seconds": utt_seconds,
                         "nfft": NFFT, "hop": HOP, "seed": seed}}


def main():
    tiny = os.environ.get("ESTOI_TINY") == "1"
    out = run(per_bucket=2 if tiny else 8,
              utt_seconds=2.0 if tiny else 6.5)
    if not tiny:
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "ESTOI_ANALYSIS.json"), "w") as f:
            json.dump(out, f, indent=1)
        print("wrote ESTOI_ANALYSIS.json")
    return out


if __name__ == "__main__":
    main()
