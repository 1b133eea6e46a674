"""Parity vs the reference's ACTUAL torch loss classes.

complex_standard_vae_loss components (multiple/prob recon, si_snr,
cal_kl_arbi_prior for both priors, the minibatch MI estimator),
standard_nsvae_loss_true_kl.final_nsvae_loss (both latent counts,
skip residuals, miu distance), two_phase_loss.phase_2_loss, and
adversarial_second_phase_loss — driven with identical random tensors.

The reference's target-magnitude bug (sqrt(re^2 + re^2), present in
every multi_recon_loss copy) is reproduced via ref_mag_bug=True for
the comparison; our default computes the correct |X| (documented
deviation, losses/recon.py:34-48).
"""

import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from idccrn_vae_tpu.losses.complex_gaussian import (
    complex_kl_divergence,
    mutual_information,
    standard_prior_like,
)
from idccrn_vae_tpu.losses.nsvae_loss import NsvaeTrueKlLoss
from idccrn_vae_tpu.losses.phase2 import AdversarialPhase2Loss, TwoPhaseLoss
from idccrn_vae_tpu.losses.recon import (
    multiple_recon_loss,
    prob_recon_loss,
    si_snr_loss,
)
from idccrn_vae_tpu.models.config import DccrnConfig
from idccrn_vae_tpu.models.reparam import CGauss

from oracle_ref import REF_ROOT, assert_close

if REF_ROOT not in sys.path:
    sys.path.insert(0, REF_ROOT)
from model import nsvae_loss as RN  # noqa: E402
from model import pretrain_pvaes_loss as RP  # noqa: E402
from model.sisnr_loss import SiSnr  # noqa: E402

B, S, T, H, F, L = 2, 2, 5, 3, 7, 400


def _rng(seed):
    return np.random.default_rng(seed)


def _gauss(rng, scale_delta=0.4):
    """(B,T,H,2) torch-layout posterior params + our CGauss view."""
    mu = rng.standard_normal((B, T, H, 2)).astype(np.float32)
    ls = rng.uniform(-2, 1, (B, T, H, 2)).astype(np.float32)
    dl = (scale_delta * rng.standard_normal((B, T, H, 2))).astype(np.float32)
    g = CGauss(mu_r=jnp.asarray(mu[..., 0]), mu_i=jnp.asarray(mu[..., 1]),
               log_sigma=jnp.asarray(ls[..., 0]),
               delta_r=jnp.asarray(dl[..., 0]),
               delta_i=jnp.asarray(dl[..., 1]),
               log_sigma_i=jnp.asarray(ls[..., 1]))
    return (torch.from_numpy(mu), torch.from_numpy(ls),
            torch.from_numpy(dl)), g


def test_sisnr_parity():
    rng = _rng(0)
    src = rng.standard_normal((B, L)).astype(np.float32)
    est = (src + 0.3 * rng.standard_normal((B, L))).astype(np.float32)
    ref = SiSnr()(torch.from_numpy(src), torch.from_numpy(est))
    assert_close(si_snr_loss(jnp.asarray(src), jnp.asarray(est)),
                 ref.numpy(), what="si_snr")


def _mk_ref_pretrain_loss(recon_loss_type, prior_mode, mi_weight=0.1):
    return RP.complex_standard_vae_loss(
        kl_warm_weights=torch.linspace(0, 1, 5), kl_weight=1.0,
        mi_weight=mi_weight, recon_loss_type=recon_loss_type,
        recon_type="real_imag", recon_loss_weight=[1.0, 0.5, 0.2],
        num_samples=S, prior_mode=prior_mode)


@pytest.mark.parametrize("prior_mode", ["ri_inde", "ri_corr"])
def test_pretrain_kl_and_mi_parity(prior_mode):
    """cal_kl_arbi_prior + mutual_information vs the torch class."""
    rng = _rng(1)
    (mu, ls, dl), g = _gauss(rng)
    z = rng.standard_normal((B * S, T, H, 2)).astype(np.float32)
    ref = _mk_ref_pretrain_loss("multiple", prior_mode)

    mu_p = torch.zeros_like(mu)
    ls_p = torch.zeros_like(ls)
    dl_p = torch.zeros_like(dl)
    if prior_mode == "ri_corr":
        dl_p[..., 1] = 1
    with torch.no_grad():
        kl_t = ref.cal_kl_arbi_prior(mu, mu_p, ls, ls_p, dl, dl_p)
        mi_t = ref.mutual_information(mu, ls, dl, torch.from_numpy(z))

    prior = standard_prior_like(g, prior_mode)
    kl = jnp.mean(complex_kl_divergence(g, prior, eps=1e-9))
    assert_close(kl, kl_t.numpy(), what="kl")

    zr = jnp.asarray(z[..., 0]).reshape(B, S, T, H)
    zi = jnp.asarray(z[..., 1]).reshape(B, S, T, H)
    mi = mutual_information(g, zr, zi, eps=1e-9)
    assert_close(mi, mi_t.numpy(), atol=1e-4, what="mi")


def test_multiple_and_prob_recon_parity():
    rng = _rng(2)
    pred = rng.standard_normal((B * S, F, T, 2)).astype(np.float32)
    targ = rng.standard_normal((B * S, F, T, 2)).astype(np.float32)
    src = rng.standard_normal((B * S, L)).astype(np.float32)
    est = (src + 0.2 * rng.standard_normal((B * S, L))).astype(np.float32)
    ref = _mk_ref_pretrain_loss("multiple", "ri_inde")
    pred_t = torch.complex(torch.from_numpy(pred[..., 0]),
                           torch.from_numpy(pred[..., 1]))
    with torch.no_grad():
        tot_t, cpx_t, mag_t, snr_t = ref.multiple_recon_loss(
            pred_t, torch.from_numpy(targ), torch.from_numpy(src),
            torch.from_numpy(est))
        prob_t, *_ = ref.prob_recon_loss(pred_t, torch.from_numpy(targ))

    tot, cpx, mag, snr = multiple_recon_loss(
        jnp.asarray(pred), jnp.asarray(targ), jnp.asarray(src),
        jnp.asarray(est), (1.0, 0.5, 0.2), ref_mag_bug=True)
    assert_close(cpx, cpx_t.numpy(), what="loss_cpx")
    assert_close(mag, mag_t.numpy(), what="loss_mag (ref_mag_bug)")
    assert_close(snr, snr_t.numpy(), what="loss_sisnr")
    assert_close(tot, tot_t.numpy(), what="total")
    assert_close(prob_recon_loss(jnp.asarray(pred), jnp.asarray(targ)),
                 prob_t.numpy(), what="prob recon")


def _torch_skips(rng, plan, doubled=False):
    """Random torch feature maps (B, C, F_i, T, 2) + cpack views."""
    t_list, c_list = [], []
    f = 9
    for c in plan:
        cc = 2 * c if doubled else c
        a = rng.standard_normal((B, cc, f, T, 2)).astype(np.float32)
        t_list.append(torch.from_numpy(a))
        re = np.transpose(a[..., 0], (0, 2, 3, 1))
        im = np.transpose(a[..., 1], (0, 2, 3, 1))
        c_list.append(jnp.asarray(np.concatenate([re, im], -1)))
        f = (f + 4 - 5) // 2 + 1
    return t_list, c_list


@pytest.mark.parametrize("latent_num", [1, 2])
def test_nsvae_true_kl_full_parity(latent_num):
    """standard_nsvae_loss_true_kl.final_nsvae_loss vs NsvaeTrueKlLoss:
    total (w_kl*KL + w_dismiu*dismiu — resi reported but never added,
    nsvae_loss.py:462-470), components, and the double-channel skip
    split in the residual loss."""
    rng = _rng(3 + latent_num)
    (mu_c, ls_c, dl_c), g_c = _gauss(rng)
    (mu_n, ls_n, dl_n), g_n = _gauss(rng)
    (mu_s, ls_s, dl_s), g_s = _gauss(rng)
    (mu_nn, ls_nn, dl_nn), g_nn = _gauss(rng)
    z = torch.from_numpy(
        rng.standard_normal((B * S, T, H, 2)).astype(np.float32))

    plan = (2, 4)
    sk_c_t, sk_c = _torch_skips(rng, plan)
    sk_n_t, sk_n = _torch_skips(rng, plan)
    sk_y_t, sk_y = _torch_skips(rng, plan, doubled=True)

    ref = RN.standard_nsvae_loss_true_kl(
        alpha=0.7, w_resi=0.3, w_kl=1.0, w_dismiu=0.2, zdim=H,
        num_samples=S, latent_num=latent_num, nsvae_model="double",
        skipc="True", skip_to_use=[0, 1], matching="both")
    with torch.no_grad():
        out = ref.final_nsvae_loss(
            mu_c, mu_n, mu_s, mu_nn if latent_num == 2 else mu_s,
            ls_c, ls_n, ls_s, ls_nn if latent_num == 2 else ls_s,
            dl_c, dl_n, dl_s, dl_nn if latent_num == 2 else dl_s,
            z, z, sk_c_t, sk_n_t, sk_y_t)
    (tot_t, kl_t, klc_t, kln_t, dms_t, dmn_t, resi_t, resis_t,
     resin_t) = out

    cfg = DccrnConfig(encoder_channels=(1,) + plan, zdim=H,
                      latent_num=latent_num, channel_mode="double",
                      skip_to_use=(0, 1))
    ours = NsvaeTrueKlLoss(alpha=0.7, w_resi=0.3, w_kl=1.0, w_dismiu=0.2,
                           cfg=cfg, matching="both")
    lo = ours(g_c, g_n, g_s, g_nn if latent_num == 2 else None,
              skips_clean=sk_c, skips_noise=sk_n, skips_noisy=sk_y)
    assert_close(lo.kl, kl_t.numpy(), what="kl")
    assert_close(lo.kl_clean, klc_t.numpy(), what="kl_clean")
    assert_close(lo.kl_noise, kln_t.numpy(), what="kl_noise")
    assert_close(lo.dismiu_speech, dms_t.numpy(), what="dismiu_speech")
    assert_close(lo.dismiu_noise, dmn_t.numpy(), what="dismiu_noise")
    assert_close(lo.resi, resi_t.numpy(), what="resi")
    assert_close(lo.resi_speech, resis_t.numpy(), what="resi_speech")
    assert_close(lo.total, tot_t.numpy(), what="total")


def test_two_phase_loss_parity():
    rng = _rng(7)
    pred_c = rng.standard_normal((B * S, F, T, 2)).astype(np.float32)
    spec_c = rng.standard_normal((B * S, F, T, 2)).astype(np.float32)
    src_c = rng.standard_normal((B * S, L)).astype(np.float32)
    est_c = (src_c + 0.2 * rng.standard_normal((B * S, L))).astype(
        np.float32)
    pred_n = rng.standard_normal((B * S, F, T, 2)).astype(np.float32)
    spec_n = rng.standard_normal((B * S, F, T, 2)).astype(np.float32)
    src_n = rng.standard_normal((B * S, L)).astype(np.float32)
    est_n = (src_n + 0.2 * rng.standard_normal((B * S, L))).astype(
        np.float32)

    ref = RN.two_phase_loss([1.0, 0.5, 0.2], alpha=1.0, zdim=H,
                            latent_num=2)
    cplx = lambda a: torch.complex(torch.from_numpy(a[..., 0]),  # noqa: E731
                                   torch.from_numpy(a[..., 1]))
    with torch.no_grad():
        out = ref.phase_2_loss(
            cplx(pred_c), torch.from_numpy(spec_c), torch.from_numpy(src_c),
            torch.from_numpy(est_c), cplx(pred_n), torch.from_numpy(spec_n),
            torch.from_numpy(src_n), torch.from_numpy(est_n))
    tot_t, cpxc_t, magc_t, snrc_t, cpxn_t, magn_t, snrn_t = out

    ours = TwoPhaseLoss((1.0, 0.5, 0.2), alpha=1.0, latent_num=2,
                        ref_mag_bug=True)
    lo = ours.phase_2_loss(
        jnp.asarray(pred_c), jnp.asarray(spec_c), jnp.asarray(src_c),
        jnp.asarray(est_c), jnp.asarray(pred_n), jnp.asarray(spec_n),
        jnp.asarray(src_n), jnp.asarray(est_n))
    assert_close(lo.total, tot_t.numpy(), what="total")
    assert_close(lo.cpx_clean, cpxc_t.numpy(), what="cpx_clean")
    assert_close(lo.sisnr_clean, snrc_t.numpy(), what="sisnr_clean")
    assert_close(lo.cpx_noise, cpxn_t.numpy(), what="cpx_noise")


def test_adversarial_loss_parity():
    rng = _rng(8)
    src = rng.standard_normal((B, L)).astype(np.float32)
    est = (src + 0.2 * rng.standard_normal((B, L))).astype(np.float32)
    d_true = rng.standard_normal((B, T, 1)).astype(np.float32)
    d_est = rng.standard_normal((B, T, 1)).astype(np.float32)
    ref = RN.adversarial_second_phase_loss(latent_num=1)
    with torch.no_grad():
        dl_t = ref.distinguisher_loss(torch.from_numpy(d_true),
                                      torch.from_numpy(d_est))
        gl_t, gr_t, gd_t = ref.generator_loss(
            torch.from_numpy(src), torch.from_numpy(est),
            torch.from_numpy(d_est))
    ours = AdversarialPhase2Loss(1)
    assert_close(ours.discriminator_loss(jnp.asarray(d_true),
                                         jnp.asarray(d_est)),
                 dl_t.numpy(), what="D loss")
    gl, gr, gd = ours.generator_loss(jnp.asarray(src), jnp.asarray(est),
                                     jnp.asarray(d_est))
    assert_close(gl, gl_t.numpy(), what="G total")
    assert_close(gr, gr_t.numpy(), what="G recon")
    assert_close(gd, gd_t.numpy(), what="G dis")
