"""Reconstruction losses: SI-SNR, complex+magnitude MSE, prob recon.

Single implementations of si_snr (sisnr_loss.py:7-24 and its >=6 clones)
and multiple_recon_loss (pretrain_pvaes_loss.py:184-206 etc.).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def si_snr_loss(source: jnp.ndarray, estimate: jnp.ndarray,
                eps: float = 1e-8) -> jnp.ndarray:
    """Negative mean SI-SNR in dB. source/estimate: (B, L).

    The reference computes s_target via a diag(matmul) dance
    (sisnr_loss.py:10-18); algebraically it is the standard projection
    s_target = (<est, src> / ||src||^2) * src.
    """
    dot = jnp.sum(source * estimate, axis=-1, keepdims=True)
    energy = jnp.sum(source * source, axis=-1, keepdims=True)
    s_target = dot * source / (energy + eps)
    e_noise = estimate - s_target
    snr = 10.0 * jnp.log10(
        jnp.sum(s_target**2, axis=-1) / (jnp.sum(e_noise**2, axis=-1) + eps)
        + eps
    )
    return -jnp.mean(snr)


def complex_mag_mse(predict: jnp.ndarray, target: jnp.ndarray,
                    ref_mag_bug: bool = False):
    """(cpx-MSE, mag-MSE), each summed over freq then meaned over (B, T).

    predict/target: (B, F, T, 2). ref_mag_bug replicates the reference's
    target magnitude computed from the real part twice
    (pretrain_pvaes_loss.py:192: ``sqrt(re^2 + re^2)``) — off by default;
    we compute the correct |X|.
    """
    pr, pi = predict[..., 0], predict[..., 1]
    tr, ti = target[..., 0], target[..., 1]
    p_mag = jnp.sqrt(pr * pr + pi * pi + 1e-6)
    if ref_mag_bug:
        t_mag = jnp.sqrt(tr * tr + tr * tr + 1e-6)
    else:
        t_mag = jnp.sqrt(tr * tr + ti * ti + 1e-6)
    loss_cpx = jnp.mean(
        jnp.sum((pr - tr) ** 2, axis=1) + jnp.sum((pi - ti) ** 2, axis=1)
    )
    loss_mag = jnp.mean(jnp.sum((p_mag - t_mag) ** 2, axis=1))
    return loss_cpx, loss_mag


def multiple_recon_loss(
    predict_spec: jnp.ndarray,
    target_spec: jnp.ndarray,
    source: jnp.ndarray,
    est_source: jnp.ndarray,
    weights: Sequence[float] = (1.0, 1.0, 1.0),
    ref_mag_bug: bool = False,
):
    """w0*cpx-MSE + w1*mag-MSE + w2*SI-SNR (the 'multiple' recon loss).

    Returns (total, loss_cpx, loss_mag, loss_sisnr).
    """
    loss_cpx, loss_mag = complex_mag_mse(predict_spec, target_spec,
                                         ref_mag_bug)
    loss_sisnr = si_snr_loss(source, est_source)
    total = (weights[0] * loss_cpx + weights[1] * loss_mag
             + weights[2] * loss_sisnr)
    return total, loss_cpx, loss_mag, loss_sisnr


def prob_recon_loss(predict_spec: jnp.ndarray, target_spec: jnp.ndarray):
    """MSE on the decoder-mean spectrogram ('prob' recon type,
    pretrain_pvaes_loss.py:161-181): squared error summed over freq,
    meaned over (B, T)."""
    pr, pi = predict_spec[..., 0], predict_spec[..., 1]
    tr, ti = target_spec[..., 0], target_spec[..., 1]
    loss = jnp.mean(jnp.sum((pr - tr) ** 2 + (pi - ti) ** 2, axis=1))
    return loss
