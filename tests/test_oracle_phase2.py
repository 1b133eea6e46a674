"""Parity vs the reference's ACTUAL torch classes — phase-2 stack.

nsvae_pvae_dccrn_decoder_twophase with pad in {'zero','sig'} and
use_sc in {True, False} (pvae_module.py:2505-2619), plus the LSGAN
distinguisher (pvae_module.py:2271-2351), against VaeDecoder
(skip_mode='runtime') and Discriminator with imported weights.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from idccrn_vae_tpu.models.discriminator import Discriminator
from idccrn_vae_tpu.models.nsvae import NsvaeEncoder
from idccrn_vae_tpu.models.torch_import import (
    import_discriminator,
    import_nsvae_encoder,
    import_vae_decoder,
)
from idccrn_vae_tpu.models.vae import VaeDecoder

from oracle_ref import (
    NS,
    ZDIM,
    assert_close,
    complex_to_ri,
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


def _mk_twophase(causal, recon_type, use_sc, seed=0):
    torch.manual_seed(seed)
    np_params = tiny_net_params(causal)
    enc = M.nsvae_pvae_dccrn_encoder_twophase(
        np_params, causal=causal, device="cpu", zdim=ZDIM, num_samples=NS,
        latent_num=1, **STFT_KW)
    dec = M.nsvae_pvae_dccrn_decoder_twophase(
        np_params, causal=causal, device="cpu", num_samples=NS, zdim=ZDIM,
        recon_type=recon_type, use_sc=use_sc, skip_to_use=[0, 1],
        resynthesis=False, **STFT_KW)
    x = torch.from_numpy(wav_batch(seed=99))
    with torch.no_grad():
        z, *_, skiper, C, F, stft_x = _enc12(enc, x, train=True)
        dec(stft_x, z, skiper, C, F, train=True,
            pad="sig" if use_sc else "zero")
    return enc, dec


def _enc12(enc, x, train):
    out = enc(x, train=train)
    z_s = out[0]
    skiper, C, F, stft_x = out[8], out[9], out[10], out[11]
    return z_s, skiper, C, F, stft_x


@pytest.mark.parametrize("pad", ["zero", "sig"])
@pytest.mark.parametrize("recon_type", ["mask", "real_imag"])
def test_twophase_decoder_parity(recon_type, pad):
    """use_sc=True decoder, call-time pad selects zero vs real skips
    (pvae_module.py:2561-2566)."""
    enc_t, dec_t = _mk_twophase(True, recon_type, use_sc=True, seed=1)
    wav = wav_batch(seed=2)
    with torch.no_grad():
        z, skiper, C, F, stft_x = _enc12(
            enc_t, torch.from_numpy(wav), train=False)
        recon_t, predict_t = dec_t(stft_x, z, skiper, C, F, train=False,
                                   pad=pad)

    cfg = our_cfg(True, skip_mode="runtime", recon_type=recon_type)
    enc = NsvaeEncoder(cfg)
    dec = VaeDecoder(cfg)
    enc_vars = import_nsvae_encoder(sd_numpy(enc_t), cfg)
    dec_vars = import_vae_decoder(sd_numpy(dec_t), cfg)
    out, _ = enc.apply(enc_vars, jnp.asarray(wav), train=False,
                       rng=jax.random.PRNGKey(0))
    z_c = jnp.asarray(tstack_to_cpack(z))
    (recon, predict), _ = dec.apply(dec_vars, out.stft_x, z_c, out.skips,
                                    train=False, pad_mode=pad)
    assert_close(predict, complex_to_ri(predict_t), atol=3e-4,
                 what=f"predict ({pad})")
    assert_close(recon, t2np(recon_t), atol=3e-4, what=f"recon ({pad})")


def test_twophase_decoder_no_sc_parity():
    """use_sc=False: decoder declares no skip channels at all."""
    enc_t, dec_t = _mk_twophase(False, "real_imag", use_sc=False, seed=3)
    wav = wav_batch(seed=4)
    with torch.no_grad():
        z, skiper, C, F, stft_x = _enc12(
            enc_t, torch.from_numpy(wav), train=False)
        recon_t, predict_t = dec_t(stft_x, z, skiper, C, F, train=False)

    cfg = our_cfg(False, skip_mode="none", recon_type="real_imag")
    enc = NsvaeEncoder(our_cfg(False))
    dec = VaeDecoder(cfg)
    enc_vars = import_nsvae_encoder(sd_numpy(enc_t), our_cfg(False))
    dec_vars = import_vae_decoder(sd_numpy(dec_t), cfg)
    out, _ = enc.apply(enc_vars, jnp.asarray(wav), train=False,
                       rng=jax.random.PRNGKey(0))
    z_c = jnp.asarray(tstack_to_cpack(z))
    (recon, predict), _ = dec.apply(dec_vars, out.stft_x, z_c, out.skips,
                                    train=False)
    assert_close(predict, complex_to_ri(predict_t), atol=3e-4, what="predict")
    assert_close(recon, t2np(recon_t), atol=3e-4, what="recon")


@pytest.mark.parametrize("causal", [False, True])
def test_distinguisher_parity(causal):
    """distinguisher: dis-mode CBN stack + real hidden-1 LSTM over
    interleaved re/im features -> per-frame score (B, T, 1)."""
    torch.manual_seed(5)
    np_params = tiny_net_params(causal)
    dis_t = M.distinguisher(np_params, causal=causal, device="cpu",
                            zdim=ZDIM, **STFT_KW)
    with torch.no_grad():
        dis_t(torch.from_numpy(wav_batch(seed=98)), train=True)  # warm BN

    wav = wav_batch(seed=6)
    with torch.no_grad():
        score_t = dis_t(torch.from_numpy(wav), train=False)

    cfg = our_cfg(causal)
    dis = Discriminator(cfg)
    dis_vars = import_discriminator(sd_numpy(dis_t), cfg)
    score, _ = dis.apply(dis_vars, jnp.asarray(wav), train=False)
    assert_close(score, t2np(score_t), what="score")
