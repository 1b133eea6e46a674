"""Complex-Gaussian density and KL — the core latent-space math.

Single implementations of what the reference duplicates in every loss
class: the complex-Gaussian log-likelihood (pretrain_pvaes_loss.py:
64-128) and the closed-form KL between complex Gaussians with
pseudo-covariance (pretrain_pvaes_loss.py:225-281 == nsvae_loss.py:
275-328 == nsvae_loss.py:818-872).

A 1-D complex Gaussian with variance sigma (real) and pseudo-covariance
delta (complex, |delta| < sigma) has covariance of the stacked real
2-vector:  C = 0.5 * [[sigma+Re d, Im d], [Im d, sigma-Re d]].
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax
from jax.scipy.special import logsumexp

from idccrn_vae_tpu.models.reparam import CGauss, project_delta


def standard_prior_like(g: CGauss, prior_mode: str = "ri_inde") -> CGauss:
    """N(0, I) prior ('ri_inde') or the correlated prior with
    delta_i = 1 ('ri_corr') — pretrain_pvaes_loss.py:322-331."""
    zeros = jnp.zeros_like(g.mu_r)
    delta_i = jnp.ones_like(g.mu_r) if prior_mode == "ri_corr" else zeros
    return CGauss(mu_r=zeros, mu_i=zeros, log_sigma=zeros,
                  delta_r=zeros, delta_i=delta_i)


def _guard_delta(sigma, dr, di, eps, factor):
    """|delta| <= factor*sigma projection. The formula lives in
    models/reparam.project_delta — sampling and density math MUST use
    the identical guarded delta, so there is exactly one copy."""
    dr, di = project_delta(sigma, dr, di, eps=eps, factor=factor)
    return dr, di, dr * dr + di * di


def _log_density_core(sigma, dr, di, zr, zi, eps):
    """log q(z) up to the constant -H*log(pi), reduced over the last
    (latent) axis. All args pre-guarded and mutually broadcastable;
    zr/zi are already mean-centered. The single implementation of the
    closed form cal_gaussian_prob (pretrain_pvaes_loss.py:64-128)
    duplicates >= 6x in the reference — used by complex_gaussian_log_prob,
    mutual_information, and EstLikelihoodVaeLoss.recon_log_likelihood."""
    abs_d = dr * dr + di * di
    p = sigma - abs_d / (sigma + eps)
    reci_p = 1.0 / (p + eps)
    rp_r = dr / (sigma * p + eps)
    rp_i = -di / (sigma * p + eps)
    p_1_minus = reci_p - abs_d / (sigma * p * sigma + eps)
    log_det = jnp.sum(jnp.log(p_1_minus + eps), axis=-1)
    log_1_over_p = jnp.sum(jnp.log(reci_p + eps), axis=-1)
    quad = -jnp.sum((zr * zr + zi * zi) * reci_p, axis=-1)
    real_part = jnp.sum(
        (zr * zr - zi * zi) * rp_r - 2.0 * zr * zi * rp_i, axis=-1
    )
    return 0.5 * (log_det + log_1_over_p) + real_part + quad


def complex_kl_divergence(g1: CGauss, g2: CGauss, eps: float = 1e-10
                          ) -> jnp.ndarray:
    """KL(q1 || q2) per (batch, time), summed over latent dims.

    Closed form over the real 2x2 covariances, matching
    cal_kl_arbi_prior / cal_kl exactly including the ``- zdim``
    normalization and epsilon placement. Inputs (B, T, H); output (B, T).
    """
    zdim = g1.mu_r.shape[-1]
    s1 = jnp.exp(g1.log_sigma)
    s2 = jnp.exp(g2.log_sigma)
    d1r, d1i, abs_d1 = _guard_delta(s1, g1.delta_r, g1.delta_i, eps, 0.99)
    d2r, d2i, abs_d2 = _guard_delta(s2, g2.delta_r, g2.delta_i, eps, 0.99)

    log_det_c1 = jnp.log(0.25 * (s1 * s1 - abs_d1) + eps)
    log_det_c2 = jnp.log(0.25 * (s2 * s2 - abs_d2) + eps)
    coeff = 2.0 / (s2 * s2 - abs_d2 + eps)
    trace_term = s1 * s2 - d2r * d1r - d2i * d1i
    mdr = g2.mu_r - g1.mu_r
    mdi = g2.mu_i - g1.mu_i
    quad = (mdr * mdr * (s2 - d2r) - 2.0 * d2i * mdr * mdi
            + mdi * mdi * (s2 + d2r))
    kl = 0.5 * jnp.sum(
        coeff * (trace_term + quad) + log_det_c2 - log_det_c1, axis=-1
    ) - zdim
    return kl


def complex_gaussian_log_prob(g: CGauss, z_r: jnp.ndarray, z_i: jnp.ndarray,
                              eps: float = 1e-9) -> jnp.ndarray:
    """log q(z | g) up to the constant -H*log(pi), per (batch, sample, time).

    Matches cal_gaussian_prob (pretrain_pvaes_loss.py:64-128) including
    its 0.90 delta-guard factor. g fields are (B, T, H); z_r/z_i are
    (B, S, T, H). Returns (B, S, T).
    """
    sigma = jnp.exp(g.log_sigma)
    dr, di, _ = _guard_delta(sigma, g.delta_r, g.delta_i, eps, 0.90)
    zr = z_r - g.mu_r[:, None]
    zi = z_i - g.mu_i[:, None]
    return _log_density_core(sigma[:, None], dr[:, None], di[:, None],
                             zr, zi, eps)


def mutual_information(g: CGauss, z_r, z_i, eps: float = 1e-9) -> jnp.ndarray:
    """Minibatch MI estimator I(x; z) (pretrain_pvaes_loss.py:129-158).

    Vectorized over the reference's O(B^2) python loop, but memory-
    bounded: a fully broadcast (B_z, B_x, S, T, H) evaluation is ~3 GB
    per temporary at reference geometry (B=16, S=5, T=481, H=128) and
    can OOM a chip once the backward pass doubles it. Instead lax.map
    scans the z-batch axis: each step evaluates one z sample-set
    against ALL x posteriors — peak memory O(B_x*S*T*H), identical
    result. z_r/z_i: (B, S, T, H).
    """
    b = z_r.shape[0]
    log_q_zx = complex_gaussian_log_prob(g, z_r, z_i, eps)  # (B,S,T)

    # log q(z_i) ≈ logsumexp_j log q(z_i | x_j) - log B.
    sigma = jnp.exp(g.log_sigma)
    dr, di, _ = _guard_delta(sigma, g.delta_r, g.delta_i, eps, 0.90)
    s_, dr_, di_ = sigma[:, None], dr[:, None], di[:, None]  # (B_x,1,T,H)

    def lp_one(z):
        zr1, zi1 = z                          # (S, T, H) — one z-batch row
        zr = zr1[None] - g.mu_r[:, None]      # (B_x, S, T, H)
        zi = zi1[None] - g.mu_i[:, None]
        return _log_density_core(s_, dr_, di_, zr, zi, eps)  # (B_x, S, T)

    log_prob = lax.map(lp_one, (z_r, z_i))    # (B_z, B_x, S, T)
    log_q_z = logsumexp(log_prob, axis=1) - jnp.log(b)  # (B_z, S, T)
    mi = jnp.mean(jnp.mean(log_q_zx - log_q_z, axis=1), axis=0)
    return jnp.mean(mi)
