"""Loss-math verification.

Strategy: independent oracles rather than re-typed formulas —
  * KL: numpy multivariate-normal KL over the equivalent real 2x2
    covariances C = 0.5*[[s+Re d, Im d], [Im d, s-Re d]].
  * log-prob / reparam / KL cross-check: Monte-Carlo
    E_{z~q1}[log q1(z) - log q2(z)] ≈ closed-form KL (normalization
    constants cancel in the difference).
  * reparameterize moments: empirical mean/var/pseudo-covariance.
"""

import numpy as np
import jax
import jax.numpy as jnp

from idccrn_vae_tpu.losses.complex_gaussian import (
    complex_gaussian_log_prob,
    complex_kl_divergence,
    standard_prior_like,
)
from idccrn_vae_tpu.losses.recon import si_snr_loss
from idccrn_vae_tpu.losses.vae_loss import kl_annealing_schedule
from idccrn_vae_tpu.models.reparam import CGauss, reparameterize


def _rand_gauss(b, t, h, seed, spread=0.5):
    rng = np.random.default_rng(seed)
    f32 = lambda a: jnp.asarray(a.astype(np.float32))
    sigma_log = rng.uniform(-1.0, 1.0, (b, t, h))
    # keep |delta| safely below sigma so the guard is inactive
    mag = np.exp(sigma_log) * rng.uniform(0.0, 0.7, (b, t, h))
    ang = rng.uniform(-np.pi, np.pi, (b, t, h))
    return CGauss(
        mu_r=f32(rng.normal(0, spread, (b, t, h))),
        mu_i=f32(rng.normal(0, spread, (b, t, h))),
        log_sigma=f32(sigma_log),
        delta_r=f32(mag * np.cos(ang)),
        delta_i=f32(mag * np.sin(ang)),
    )


def _np_cov(g, i):
    s = np.exp(np.asarray(g.log_sigma).reshape(-1)[i])
    dr = np.asarray(g.delta_r).reshape(-1)[i]
    di = np.asarray(g.delta_i).reshape(-1)[i]
    return 0.5 * np.array([[s + dr, di], [di, s - dr]])


def test_kl_matches_multivariate_normal_kl():
    b, t, h = 2, 3, 4
    g1 = _rand_gauss(b, t, h, 0)
    g2 = _rand_gauss(b, t, h, 1)
    ours = np.asarray(complex_kl_divergence(g1, g2))
    # independent oracle: sum over dims of real-2D Gaussian KL
    mu1 = np.stack([np.asarray(g1.mu_r), np.asarray(g1.mu_i)], -1)
    mu2 = np.stack([np.asarray(g2.mu_r), np.asarray(g2.mu_i)], -1)
    total = np.zeros((b, t))
    flat = 0
    for bb in range(b):
        for tt in range(t):
            acc = 0.0
            for hh in range(h):
                i = (bb * t + tt) * h + hh
                c1, c2 = _np_cov(g1, i), _np_cov(g2, i)
                m = mu2[bb, tt, hh] - mu1[bb, tt, hh]
                c2inv = np.linalg.inv(c2)
                acc += 0.5 * (
                    np.trace(c2inv @ c1) + m @ c2inv @ m - 2
                    + np.log(np.linalg.det(c2) / np.linalg.det(c1))
                )
            total[bb, tt] = acc
            flat += h
    np.testing.assert_allclose(ours, total, rtol=2e-3, atol=2e-3)


def test_kl_zero_for_identical():
    g = _rand_gauss(2, 3, 4, 2)
    kl = np.asarray(complex_kl_divergence(g, g))
    np.testing.assert_allclose(kl, 0.0, atol=1e-3)


def test_monte_carlo_kl_matches_closed_form():
    b, t, h = 1, 1, 3
    g1 = _rand_gauss(b, t, h, 3)
    g2 = _rand_gauss(b, t, h, 4)
    n = 200_000
    z = reparameterize(jax.random.PRNGKey(0), g1, n)  # (n, 1, 2h)
    zr, zi = jnp.split(z, 2, axis=-1)
    zr = zr.reshape(b, n, t, h)
    zi = zi.reshape(b, n, t, h)
    lp1 = complex_gaussian_log_prob(g1, zr, zi)
    lp2 = complex_gaussian_log_prob(g2, zr, zi)
    mc_kl = float(jnp.mean(lp1 - lp2))
    closed = float(complex_kl_divergence(g1, g2)[0, 0])
    assert abs(mc_kl - closed) < 0.05 * max(1.0, abs(closed)), (mc_kl, closed)


def test_reparameterize_moments():
    g = _rand_gauss(1, 1, 2, 5)
    n = 400_000
    z = reparameterize(jax.random.PRNGKey(1), g, n)
    zr, zi = jnp.split(z, 2, axis=-1)
    zc = np.asarray(zr).reshape(n, 2) + 1j * np.asarray(zi).reshape(n, 2)
    mu = np.asarray(g.mu_r)[0, 0] + 1j * np.asarray(g.mu_i)[0, 0]
    sigma = np.exp(np.asarray(g.log_sigma))[0, 0]
    delta = np.asarray(g.delta_r)[0, 0] + 1j * np.asarray(g.delta_i)[0, 0]
    np.testing.assert_allclose(zc.mean(0), mu, atol=0.02)
    centered = zc - zc.mean(0)
    np.testing.assert_allclose(
        (centered * centered.conj()).real.mean(0), sigma, rtol=0.03)
    emp_delta = (centered * centered).mean(0)
    np.testing.assert_allclose(emp_delta.real, delta.real, atol=0.03)
    np.testing.assert_allclose(emp_delta.imag, delta.imag, atol=0.03)


def test_si_snr_basics():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 1000)).astype(np.float32)
    # perfect estimate (any positive scale): SI-SNR -> large, loss -> very negative
    loss_same = float(si_snr_loss(jnp.asarray(x), jnp.asarray(2.0 * x)))
    assert loss_same < -50
    noise = rng.standard_normal((3, 1000)).astype(np.float32)
    loss_noisy = float(si_snr_loss(jnp.asarray(x), jnp.asarray(x + noise)))
    assert loss_noisy > loss_same
    # matches the definition directly
    est = x + 0.5 * noise
    dot = (x * est).sum(-1, keepdims=True)
    s_t = dot * x / (x * x).sum(-1, keepdims=True)
    ref = -np.mean(10 * np.log10((s_t**2).sum(-1) /
                                 ((est - s_t) ** 2).sum(-1)))
    np.testing.assert_allclose(
        float(si_snr_loss(jnp.asarray(x), jnp.asarray(est))), ref, rtol=1e-4)


def test_kl_annealing_schedule():
    s = kl_annealing_schedule(10, 0.0, 1.0, n_cycle=2, ratio=1.0)
    assert s.shape == (10,)
    assert s[0] == 0.0
    # second cycle restarts
    assert s[5] == 0.0
    assert np.all(np.diff(s[:5]) >= 0)


def test_standard_prior_modes():
    g = _rand_gauss(1, 2, 3, 6)
    p0 = standard_prior_like(g, "ri_inde")
    assert float(jnp.sum(jnp.abs(p0.delta_i))) == 0.0
    p1 = standard_prior_like(g, "ri_corr")
    np.testing.assert_allclose(np.asarray(p1.delta_i), 1.0)


def test_mi_estimator_exactly_invariant_under_batch_tiling():
    """pad_small_tpu_batch (parallel/mesh.py) repeats the WHOLE batch k
    times on TPU when per-chip B < 8. Round-3 review conjectured the
    minibatch MI estimator drifts under that tiling because its
    aggregate-posterior term sees k*B rows — this test pins the
    refutation: duplicating every mixture component adds log k to the
    logsumexp and log k to the log(k*B) normalizer, which cancel, so
    log q(z) is EXACTLY duplicate-invariant; with the z draws tiled
    too, the estimate matches to f32 reassociation noise (~1e-6 — the
    logsumexp reduces k*B terms in a different order). (In a real
    padded step the
    duplicated rows draw fresh reparameterization noise, which — as
    for the recon MC term — changes only the sampling noise of the
    outer mean around the identical expectation.)"""
    from idccrn_vae_tpu.losses.complex_gaussian import mutual_information

    rng = np.random.default_rng(11)
    g = _rand_gauss(5, 7, 4, 11)
    z_r = jnp.asarray(rng.standard_normal((5, 3, 7, 4)).astype(np.float32))
    z_i = jnp.asarray(rng.standard_normal((5, 3, 7, 4)).astype(np.float32))

    def tile(x, k):
        return jnp.concatenate([x] * k, axis=0)

    base = float(mutual_information(g, z_r, z_i))
    for k in (2, 3):
        gk = CGauss(*(None if f is None else tile(f, k) for f in g))
        mk = float(mutual_information(gk, tile(z_r, k), tile(z_i, k)))
        np.testing.assert_allclose(mk, base, rtol=1e-5)
