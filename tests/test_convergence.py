"""Learning actually happens: short training runs must move losses and
beat the do-nothing baseline — evidence the gradient path, optimizer,
and BN-stat plumbing are wired correctly end to end (beyond the
single-step smoke tests in test_trainers.py).
"""

import dataclasses

import jax
import numpy as np

from idccrn_vae_tpu.losses.phase2 import EteTrainSeLoss
from idccrn_vae_tpu.losses.vae_loss import PretrainVaeLoss, kl_annealing_schedule
from idccrn_vae_tpu.models.config import DccrnConfig
from idccrn_vae_tpu.models.dccrn import SupervisedDccrn
from idccrn_vae_tpu.train.pretrain import PretrainTrainer
from idccrn_vae_tpu.train.supervised import SupervisedTrainer

TINY = DccrnConfig(
    encoder_channels=(1, 2, 2, 4, 4, 4, 4),
    zdim=4,
    lstm_hidden=8,
    num_samples=1,
    causal=True,
    recon_type="mask",
)
B, L, FS = 4, 1600, 16000


def _toy_batch(rng, snr_scale=0.3):
    """Fixed-structure denoising task: harmonic 'speech' + white noise."""
    t = np.arange(L) / FS
    f0 = rng.uniform(150, 300, (B, 1))
    clean = np.sin(2 * np.pi * f0 * t) + 0.5 * np.sin(2 * np.pi * 2 * f0 * t)
    clean = (0.3 * clean).astype(np.float32)
    noisy = clean + snr_scale * rng.standard_normal((B, L)).astype(np.float32)
    return noisy, clean


def _sisnr(est, ref):
    a = np.sum(est * ref, -1, keepdims=True) / (np.sum(ref * ref, -1,
                                                       keepdims=True) + 1e-8)
    s = a * ref
    e = est - s
    return 10 * np.log10((s**2).sum(-1) / ((e**2).sum(-1) + 1e-8)).mean()


def test_supervised_training_learns_to_denoise():
    rng = np.random.default_rng(0)
    tr = SupervisedTrainer(TINY, EteTrainSeLoss((1.0, 1.0, 1.0)), 1e-3)
    state = tr.init_state()
    first = last = None
    for step in range(120):
        batch = _toy_batch(rng)
        state, m = tr.train_step(state, batch, jax.random.PRNGKey(step), 0)
        if step == 0:
            first = float(m["total"])
        last = float(m["total"])
    assert last < 0.5 * first, (first, last)

    # held-out pair: enhanced must beat the noisy input by >= 2 dB SI-SNR
    noisy, clean = _toy_batch(np.random.default_rng(1234))
    model = SupervisedDccrn(TINY)
    variables = {"params": state["model"]["params"],
                 "stats": state["model"]["stats"]}
    (est, _), _ = model.apply(variables, noisy, train=False)
    est = np.asarray(est)
    n = min(est.shape[1], clean.shape[1])
    gain = _sisnr(est[:, :n], clean[:, :n]) - _sisnr(noisy[:, :n],
                                                     clean[:, :n])
    assert gain >= 2.0, f"SI-SNR gain over noisy baseline: {gain:.2f} dB"


def test_vae_pretrain_loss_decreases():
    cfg = dataclasses.replace(TINY, recon_type="real_imag")
    loss = PretrainVaeLoss(kl_annealing_schedule(10), kl_weight=0.01,
                           num_samples=1, recon_loss_weight=(1.0, 1.0, 0.0))
    tr = PretrainTrainer(cfg, loss, 1e-3)
    state = tr.init_state()
    rng = np.random.default_rng(2)
    curve = []
    for step in range(80):
        _, clean = _toy_batch(rng)
        state, m = tr.train_step(state, clean, jax.random.PRNGKey(step), 0)
        curve.append(float(m["recon"]))
    # reconstruction through a 4-dim latent: expect a steady ~30%+ drop
    # (measured 4849 -> ~3300 over 80 steps), not supervised-level halving
    head = np.mean(curve[:10])
    tail = np.mean(curve[-10:])
    assert tail < 0.75 * head, (head, tail)
