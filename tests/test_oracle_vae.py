"""Parity vs the reference's ACTUAL torch classes — VAE family.

Imports /root/reference/model/pvae_module.py, instantiates
pvae_dccrn_encoder / _decoder (and the no_skip / fc_latent /
skip_prepare / prob_skip variants, pvae_module.py:259-926, 1556-2122)
at tiny geometry, copies live weights via models/torch_import, and pins
eval-mode forwards to <=1e-4.

Deterministic quantities are compared (mu, log_sigma, delta, skips,
stft_x, decoder outputs given a shared z); the stochastic
reparameterization is pinned separately by driving both sides with
identical noise.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from idccrn_vae_tpu.models.reparam import CGauss, reparameterize
from idccrn_vae_tpu.models.torch_import import (
    import_vae_decoder,
    import_vae_encoder,
)
from idccrn_vae_tpu.models.vae import VaeDecoder, VaeEncoder

from oracle_ref import (
    NS,
    ZDIM,
    assert_close,
    complex_to_ri,
    map_to_cpack,
    our_cfg,
    ref_models,
    sd_numpy,
    t2np,
    tiny_net_params,
    tstack_to_cpack,
    wav_batch,
)

M = ref_models()
STFT_KW = dict(n_fft=32, hop_len=8, win_length=16)


def _mk_ref_pair(causal, enc_cls, dec_cls, dec_kw, seed=0, enc_kw=None):
    """Build reference encoder+decoder, warm BN buffers in train mode."""
    torch.manual_seed(seed)
    np_params = tiny_net_params(causal)
    enc = enc_cls(np_params, causal=causal, device="cpu", zdim=ZDIM,
                  num_samples=NS, **STFT_KW, **(enc_kw or {}))
    dec = dec_cls(np_params, causal=causal, device="cpu", zdim=ZDIM,
                  num_samples=NS, **STFT_KW, **dec_kw)
    x = torch.from_numpy(wav_batch(seed=7))
    with torch.no_grad():
        z, miu, ls, dl, skiper, C, F, stft_x = enc(x, train=True)
        dec(stft_x, z, skiper, C, F, train=True)
    return enc, dec


def _run_ref_eval(enc, dec, wav):
    with torch.no_grad():
        z, miu, ls, dl, skiper, C, F, stft_x = enc(
            torch.from_numpy(wav), train=False)
        recon, predict = dec(stft_x, z, skiper, C, F, train=False)
    return dict(z=z, miu=miu, log_sigma=ls, delta=dl, skiper=skiper,
                C=C, F=F, stft_x=stft_x, recon=recon, predict=predict)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("recon_type", ["mask", "real_imag"])
def test_vae_enc_dec_parity(causal, recon_type):
    """pvae_dccrn_encoder + pvae_dccrn_decoder (real skips)."""
    enc_t, dec_t = _mk_ref_pair(
        causal, M.pvae_dccrn_encoder, M.pvae_dccrn_decoder,
        dict(recon_type=recon_type, skip_to_use=[0, 1]))
    wav = wav_batch(seed=1)
    ref = _run_ref_eval(enc_t, dec_t, wav)

    cfg = our_cfg(causal, skip_mode="real", recon_type=recon_type)
    enc = VaeEncoder(cfg)
    dec = VaeDecoder(cfg)
    enc_vars = import_vae_encoder(sd_numpy(enc_t), cfg)
    dec_vars = import_vae_decoder(sd_numpy(dec_t), cfg)

    out, _ = enc.apply(enc_vars, jnp.asarray(wav), train=False,
                       rng=jax.random.PRNGKey(0))
    assert_close(out.stft_x, t2np(ref["stft_x"]), what="stft_x")
    assert_close(out.gauss.mu_r, t2np(ref["miu"])[..., 0], what="mu_r")
    assert_close(out.gauss.mu_i, t2np(ref["miu"])[..., 1], what="mu_i")
    assert_close(out.gauss.log_sigma, t2np(ref["log_sigma"])[..., 0],
                 what="log_sigma")
    assert_close(out.gauss.delta_r, t2np(ref["delta"])[..., 0], what="delta_r")
    assert_close(out.gauss.delta_i, t2np(ref["delta"])[..., 1], what="delta_i")
    for i, (ours, theirs) in enumerate(zip(out.skips, ref["skiper"])):
        assert_close(ours, map_to_cpack(theirs), what=f"skip[{i}]")

    # decoder: drive ours with the reference's z (cpack-converted)
    z_c = jnp.asarray(tstack_to_cpack(ref["z"]))
    (recon, predict), _ = dec.apply(dec_vars, out.stft_x, z_c, out.skips,
                                    train=False)
    assert_close(predict, complex_to_ri(ref["predict"]), atol=3e-4,
                 what="predict_spec")
    assert_close(recon, t2np(ref["recon"]), atol=3e-4, what="recon_sig")


def test_vae_no_skip_parity():
    """pvae_dccrn_encoder_no_skip + decoder_no_skip (skip_mode='none')."""
    enc_t, dec_t = _mk_ref_pair(
        False, M.pvae_dccrn_encoder_no_skip, M.pvae_dccrn_decoder_no_skip,
        dict(recon_type="real_imag"), seed=2,
        enc_kw=dict(data_mean=None, data_std=None))
    wav = wav_batch(seed=3)
    ref = _run_ref_eval(enc_t, dec_t, wav)

    cfg = our_cfg(False, skip_mode="none", recon_type="real_imag")
    enc, dec = VaeEncoder(cfg), VaeDecoder(cfg)
    enc_vars = import_vae_encoder(sd_numpy(enc_t), cfg)
    dec_vars = import_vae_decoder(sd_numpy(dec_t), cfg)

    out, _ = enc.apply(enc_vars, jnp.asarray(wav), train=False,
                       rng=jax.random.PRNGKey(0))
    assert_close(out.gauss.mu_r, t2np(ref["miu"])[..., 0], what="mu_r")
    assert_close(out.gauss.log_sigma, t2np(ref["log_sigma"])[..., 0],
                 what="log_sigma")
    z_c = jnp.asarray(tstack_to_cpack(ref["z"]))
    (recon, predict), _ = dec.apply(dec_vars, out.stft_x, z_c, out.skips,
                                    train=False)
    assert_close(predict, complex_to_ri(ref["predict"]), atol=3e-4,
                 what="predict_spec")
    assert_close(recon, t2np(ref["recon"]), atol=3e-4, what="recon_sig")


def test_vae_fc_latent_parity():
    """pvae_dccrn_encoder_no_skip_fc_latent: fc heads + clamp guard."""
    torch.manual_seed(4)
    np_params = tiny_net_params(False)
    enc_t = M.pvae_dccrn_encoder_no_skip_fc_latent(
        np_params, causal=False, device="cpu", zdim=ZDIM, num_samples=NS,
        data_mean=None, data_std=None, **STFT_KW)
    x = torch.from_numpy(wav_batch(seed=8))
    with torch.no_grad():
        enc_t(x, train=True)

    wav = wav_batch(seed=5)
    with torch.no_grad():
        _, miu, ls, dl, _, _, _, stft_x = enc_t(
            torch.from_numpy(wav), train=False)

    cfg = our_cfg(False, latent="fc", skip_mode="none")
    enc = VaeEncoder(cfg)
    enc_vars = import_vae_encoder(sd_numpy(enc_t), cfg)
    out, _ = enc.apply(enc_vars, jnp.asarray(wav), train=False,
                       rng=jax.random.PRNGKey(0))
    assert_close(out.gauss.mu_r, t2np(miu)[..., 0], what="mu_r")
    assert_close(out.gauss.mu_i, t2np(miu)[..., 1], what="mu_i")
    assert_close(out.gauss.log_sigma, t2np(ls)[..., 0], what="log_sigma")
    assert_close(out.gauss.delta_r, t2np(dl)[..., 0], what="delta_r")
    assert_close(out.gauss.delta_i, t2np(dl)[..., 1], what="delta_i")


def test_vae_skip_prepare_decoder_zero_concat():
    """pvae_dccrn_decoder_skip_prepare concats ZEROS ('spadd')."""
    enc_t, dec_t = _mk_ref_pair(
        False, M.pvae_dccrn_encoder_skip_prepare,
        M.pvae_dccrn_decoder_skip_prepare,
        dict(recon_type="real_imag", skip_to_use=[0, 1]), seed=6)
    wav = wav_batch(seed=9)
    ref = _run_ref_eval(enc_t, dec_t, wav)

    cfg = our_cfg(False, skip_mode="zero", recon_type="real_imag")
    enc, dec = VaeEncoder(cfg), VaeDecoder(cfg)
    enc_vars = import_vae_encoder(sd_numpy(enc_t), cfg)
    dec_vars = import_vae_decoder(sd_numpy(dec_t), cfg)
    out, _ = enc.apply(enc_vars, jnp.asarray(wav), train=False,
                       rng=jax.random.PRNGKey(0))
    z_c = jnp.asarray(tstack_to_cpack(ref["z"]))
    (recon, predict), _ = dec.apply(dec_vars, out.stft_x, z_c, out.skips,
                                    train=False)
    assert_close(predict, complex_to_ri(ref["predict"]), atol=3e-4,
                 what="predict_spec")
    assert_close(recon, t2np(ref["recon"]), atol=3e-4, what="recon_sig")


def test_vae_prob_skip_decoder_eval_uses_real_skips():
    """pvae_dccrn_decoder_prob_skip: eval -> sc_flag=True (real skips,
    pvae_module.py:1731-1737)."""
    enc_t, dec_t = _mk_ref_pair(
        False, M.pvae_dccrn_encoder_prob_skip,
        M.pvae_dccrn_decoder_prob_skip,
        dict(recon_type="real_imag", skip_to_use=[0, 1], skip_prob=1),
        seed=10)
    wav = wav_batch(seed=11)
    ref = _run_ref_eval(enc_t, dec_t, wav)

    cfg = our_cfg(False, skip_mode="prob", skip_prob=1,
                  recon_type="real_imag")
    enc, dec = VaeEncoder(cfg), VaeDecoder(cfg)
    enc_vars = import_vae_encoder(sd_numpy(enc_t), cfg)
    dec_vars = import_vae_decoder(sd_numpy(dec_t), cfg)
    out, _ = enc.apply(enc_vars, jnp.asarray(wav), train=False,
                       rng=jax.random.PRNGKey(0))
    z_c = jnp.asarray(tstack_to_cpack(ref["z"]))
    (recon, predict), _ = dec.apply(dec_vars, out.stft_x, z_c, out.skips,
                                    train=False)
    assert_close(predict, complex_to_ri(ref["predict"]), atol=3e-4,
                 what="predict_spec")
    assert_close(recon, t2np(ref["recon"]), atol=3e-4, what="recon_sig")


@pytest.mark.parametrize("guard,enc_cls", [
    ("eps", "pvae_dccrn_encoder"),
    ("clamp", "pvae_dccrn_encoder_no_skip_fc_latent"),
])
def test_reparameterization_parity(guard, enc_cls):
    """Drive both reparameterizations with identical noise and compare z
    (pvae_module.py:307-361 eps-guard, :713-769 clamp-guard)."""
    torch.manual_seed(0)
    np_params = tiny_net_params(False)
    kw = dict(data_mean=None, data_std=None) if guard == "clamp" else {}
    enc_t = getattr(M, enc_cls)(np_params, causal=False, device="cpu",
                                zdim=ZDIM, num_samples=NS, **STFT_KW, **kw)
    rng = np.random.default_rng(42)
    b, t, h = 2, 7, ZDIM
    mu = rng.standard_normal((b, t, h, 2)).astype(np.float32)
    # log_sigma spans small and large; delta sometimes violates the bound
    ls = rng.uniform(-3, 2, (b, t, h, 2)).astype(np.float32)
    dl = (2.0 * rng.standard_normal((b, t, h, 2))).astype(np.float32)
    eps_r = rng.standard_normal((b, NS, t, h)).astype(np.float32)
    eps_i = rng.standard_normal((b, NS, t, h)).astype(np.float32)

    fixed = iter([torch.from_numpy(eps_r), torch.from_numpy(eps_i)])
    orig = torch.randn_like
    try:
        torch.randn_like = lambda x, **k: next(fixed)
        with torch.no_grad():
            z_t = enc_t.reparameterization(
                torch.from_numpy(mu), torch.from_numpy(ls),
                torch.from_numpy(dl), NS)
    finally:
        torch.randn_like = orig

    g = CGauss(mu_r=jnp.asarray(mu[..., 0]), mu_i=jnp.asarray(mu[..., 1]),
               log_sigma=jnp.asarray(ls[..., 0]),
               delta_r=jnp.asarray(dl[..., 0]),
               delta_i=jnp.asarray(dl[..., 1]))
    z = reparameterize(jax.random.PRNGKey(0), g, NS, guard=guard,
                       noise=(jnp.asarray(eps_r), jnp.asarray(eps_i)))
    z_ref = tstack_to_cpack(z_t)  # (B*NS, T, 2H)
    assert_close(z, z_ref, what=f"z ({guard})")
