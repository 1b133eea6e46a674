"""Variant-loss sanity tests (finite values, expected relations)."""

import jax
import jax.numpy as jnp
import numpy as np

from idccrn_vae_tpu.losses.nsvae_variants import (
    EteWithLatentLoss,
    NsvaeSamplingKlLoss,
    NsvaeWithDecoderReconLoss,
    sampled_kl,
)
from idccrn_vae_tpu.losses.complex_gaussian import complex_kl_divergence
from idccrn_vae_tpu.losses.vae_variants import (
    DipVaeLoss,
    EstLikelihoodVaeLoss,
    VcaeLoss,
    VcaeRegmiuLoss,
    mu_free_kl,
)
from idccrn_vae_tpu.models.config import DccrnConfig
from idccrn_vae_tpu.models.reparam import CGauss, reparameterize

from tests.test_losses import _rand_gauss


def test_sampled_kl_close_to_closed_form():
    g1 = _rand_gauss(1, 2, 3, 10)
    g2 = _rand_gauss(1, 2, 3, 11)
    z = reparameterize(jax.random.PRNGKey(0), g1, 50_000)
    mc = np.asarray(jnp.mean(sampled_kl(g1, g2, z), axis=-1))
    closed = np.asarray(jnp.mean(complex_kl_divergence(g1, g2), axis=-1))
    np.testing.assert_allclose(mc, closed, rtol=0.1, atol=0.1)


def test_mu_free_kl_zero_for_same_cov():
    g = _rand_gauss(2, 3, 4, 12)
    same_cov = CGauss(
        mu_r=jnp.zeros_like(g.mu_r), mu_i=jnp.zeros_like(g.mu_i),
        log_sigma=g.log_sigma, delta_r=g.delta_r, delta_i=g.delta_i)
    np.testing.assert_allclose(np.asarray(mu_free_kl(g, same_cov)), 0.0,
                               atol=1e-3)


def _spec(b=2, f=9, t=5, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(
        (b, f, t, 2)).astype(np.float32))


def _wav(b=2, n=500, seed=1):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(
        (b, n)).astype(np.float32))


def test_vcae_and_regmiu_and_dip_finite():
    g = _rand_gauss(2, 5, 4, 13)
    z = reparameterize(jax.random.PRNGKey(1), g, 3)
    spec, pred = _spec(seed=2), _spec(seed=3)
    src, est = _wav(seed=4), _wav(seed=5)

    out = VcaeLoss(0.1)(src, est, spec, pred, g, z)
    assert np.isfinite(float(out[0]))

    out = VcaeRegmiuLoss(0.1, loss_opt=2, regmiu_w=0.5)(src, est, spec,
                                                        pred, g, z)
    assert np.isfinite(float(out[0]))

    out = DipVaeLoss(0.1, off_weight=0.5, diag_weight=0.5)(src, est, spec,
                                                           pred, g, z)
    assert np.isfinite(float(out[0]))


def test_est_likelihood_loss():
    b, s, t, f = 2, 3, 5, 9
    rng = np.random.default_rng(6)
    g_x = CGauss(
        mu_r=jnp.asarray(rng.standard_normal((b, s, t, f)), jnp.float32),
        mu_i=jnp.asarray(rng.standard_normal((b, s, t, f)), jnp.float32),
        log_sigma=jnp.asarray(rng.uniform(-1, 1, (b, s, t, f)), jnp.float32),
        delta_r=jnp.zeros((b, s, t, f), jnp.float32),
        delta_i=jnp.zeros((b, s, t, f), jnp.float32),
    )
    target = _spec(b, f, t, seed=7)
    g = _rand_gauss(b, t, 4, 14)
    z = reparameterize(jax.random.PRNGKey(2), g, s)
    loss = EstLikelihoodVaeLoss(np.zeros(0, np.float32), 0.1, num_samples=s)
    total, recon, kl, mi, l_cpx = loss(g_x, target, g, z,
                                       jnp.asarray(0.1))
    assert np.isfinite(float(total))
    # a tighter (matching) decoder mean yields higher likelihood
    g_x_match = g_x._replace(
        mu_r=jnp.swapaxes(target[..., 0], 1, 2)[:, None].repeat(s, 1),
        mu_i=jnp.swapaxes(target[..., 1], 1, 2)[:, None].repeat(s, 1),
        log_sigma=jnp.zeros_like(g_x.log_sigma),
    )
    recon2 = loss.recon_log_likelihood(g_x_match, target)[0]
    assert float(recon2) < float(recon)


def test_nsvae_sampling_and_decoder_recon_losses():
    cfg = DccrnConfig(latent_num=2, encoder_channels=(1, 2, 2, 4, 4, 4, 4))
    g_c, g_n = _rand_gauss(2, 4, 3, 15), _rand_gauss(2, 4, 3, 16)
    g_s, g_nn = _rand_gauss(2, 4, 3, 17), _rand_gauss(2, 4, 3, 18)
    z_s = reparameterize(jax.random.PRNGKey(3), g_s, 2)
    z_n = reparameterize(jax.random.PRNGKey(4), g_nn, 2)
    loss = NsvaeSamplingKlLoss(1.0, 0.0, 1.0, 0.0, cfg)
    out = loss(g_c, g_n, g_s, g_nn, z_s, z_n)
    assert np.isfinite(float(out[0]))

    spec, pred = _spec(seed=8), _spec(seed=9)
    src, est = _wav(seed=10), _wav(seed=11)
    loss2 = NsvaeWithDecoderReconLoss(1.0, 1.0, 0.5, (1.0, 1.0, 0.0), 2)
    out2 = loss2(g_c, g_n, g_s, g_nn, pred, spec, src, est)
    assert np.isfinite(float(out2[0]))

    loss3 = EteWithLatentLoss(0.1, (1.0, 1.0, 0.0), alpha=0.5)
    out3 = loss3(g_c, g_n, g_s, pred, spec, src, est)
    assert np.isfinite(float(out3[0]))
