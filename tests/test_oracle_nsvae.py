"""Parity vs the reference's ACTUAL torch classes — NSVAE encoders.

nsvae_dccrn_encoder_original (latent_num 1/2), _double_channel,
_adapt_channel and nsvae_pvae_dccrn_encoder_twophase
(pvae_module.py:930-1550, 2131-2268) vs our NsvaeEncoder with
channel_mode flags, weights shared through models/torch_import.
Also pins split_noisy_skips against the torch channel-half convention
(test_nsvae_se.py:333-348).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from idccrn_vae_tpu.models.nsvae import NsvaeEncoder, split_noisy_skips
from idccrn_vae_tpu.models.torch_import import import_nsvae_encoder

from oracle_ref import (
    NS,
    ZDIM,
    assert_close,
    map_to_cpack,
    our_cfg,
    ref_models,
    sd_numpy,
    t2np,
    tiny_net_params,
    wav_batch,
)

M = ref_models()
STFT_KW = dict(n_fft=32, hop_len=8, win_length=16)


def _mk_ref(enc_cls, causal, latent_num, seed=0, **extra):
    torch.manual_seed(seed)
    np_params = tiny_net_params(causal)
    enc = enc_cls(np_params, causal=causal, device="cpu", zdim=ZDIM,
                  num_samples=NS, latent_num=latent_num, **STFT_KW, **extra)
    with torch.no_grad():
        enc(torch.from_numpy(wav_batch(seed=99)), train=True)  # warm BN
    return enc


def _ref_eval(enc, wav):
    with torch.no_grad():
        out = enc(torch.from_numpy(wav), train=False)
    (z_s, miu_s, ls_s, dl_s, z_n, miu_n, ls_n, dl_n,
     skiper, C, F, stft_x) = out
    return dict(miu_s=miu_s, ls_s=ls_s, dl_s=dl_s, miu_n=miu_n, ls_n=ls_n,
                dl_n=dl_n, skiper=skiper, stft_x=stft_x)


def _check_gauss(out, ref):
    assert_close(out.gauss_speech.mu_r, t2np(ref["miu_s"])[..., 0], what="mu_s_r")
    assert_close(out.gauss_speech.mu_i, t2np(ref["miu_s"])[..., 1], what="mu_s_i")
    assert_close(out.gauss_speech.log_sigma, t2np(ref["ls_s"])[..., 0],
                 what="log_sigma_s")
    assert_close(out.gauss_speech.delta_r, t2np(ref["dl_s"])[..., 0],
                 what="delta_s_r")
    if ref["miu_n"] is not None:
        assert_close(out.gauss_noise.mu_r, t2np(ref["miu_n"])[..., 0],
                     what="mu_n_r")
        assert_close(out.gauss_noise.log_sigma, t2np(ref["ls_n"])[..., 0],
                     what="log_sigma_n")
        assert_close(out.gauss_noise.delta_i, t2np(ref["dl_n"])[..., 1],
                     what="delta_n_i")


@pytest.mark.parametrize("latent_num", [1, 2])
@pytest.mark.parametrize("causal", [False, True])
def test_nsvae_original_parity(causal, latent_num):
    enc_t = _mk_ref(M.nsvae_dccrn_encoder_original, causal, latent_num)
    wav = wav_batch(seed=1)
    ref = _ref_eval(enc_t, wav)

    cfg = our_cfg(causal, latent_num=latent_num)
    enc = NsvaeEncoder(cfg)
    enc_vars = import_nsvae_encoder(sd_numpy(enc_t), cfg)
    out, _ = enc.apply(enc_vars, jnp.asarray(wav), train=False,
                       rng=jax.random.PRNGKey(0))
    _check_gauss(out, ref)
    for i, (ours, theirs) in enumerate(zip(out.skips, ref["skiper"])):
        assert_close(ours, map_to_cpack(theirs), what=f"skip[{i}]")


def test_nsvae_double_channel_parity():
    """double: every conv channel x2 (pvae_module.py:1255-1261); skips
    split half speech / half noise."""
    enc_t = _mk_ref(M.nsvae_dccrn_encoder_double_channel, False, 2, seed=2)
    wav = wav_batch(seed=3)
    ref = _ref_eval(enc_t, wav)

    cfg = our_cfg(False, latent_num=2, channel_mode="double")
    enc = NsvaeEncoder(cfg)
    enc_vars = import_nsvae_encoder(sd_numpy(enc_t), cfg)
    out, _ = enc.apply(enc_vars, jnp.asarray(wav), train=False,
                       rng=jax.random.PRNGKey(0))
    _check_gauss(out, ref)
    sp = split_noisy_skips(out.skips, cfg, "speech")
    no = split_noisy_skips(out.skips, cfg, "noise")
    for i, theirs in enumerate(ref["skiper"]):
        c = theirs.shape[1] // 2
        assert_close(out.skips[i], map_to_cpack(theirs), what=f"skip[{i}]")
        assert_close(sp[i], map_to_cpack(theirs[:, :c]), what=f"speech[{i}]")
        assert_close(no[i], map_to_cpack(theirs[:, c:]), what=f"noise[{i}]")


@pytest.mark.parametrize("skip_to_use", [(0, 1), (1,)])
def test_nsvae_adapt_channel_parity(skip_to_use):
    """adapt: stage i doubled iff decoder index (n-1-i) in skip_to_use —
    the reference mutates net_params in place (pvae_module.py:1410-1413);
    we rebuild the resulting plan from an immutable config."""
    enc_t = _mk_ref(M.nsvae_dccrn_encoder_adapt_channel, False, 1, seed=4,
                    skip_to_use=list(skip_to_use))
    wav = wav_batch(seed=5)
    ref = _ref_eval(enc_t, wav)

    cfg = our_cfg(False, latent_num=1, channel_mode="adapt",
                  skip_to_use=skip_to_use)
    enc = NsvaeEncoder(cfg)
    enc_vars = import_nsvae_encoder(sd_numpy(enc_t), cfg)
    out, _ = enc.apply(enc_vars, jnp.asarray(wav), train=False,
                       rng=jax.random.PRNGKey(0))
    _check_gauss(out, ref)
    sp = split_noisy_skips(out.skips, cfg, "speech")
    n = cfg.num_stages
    for i, theirs in enumerate(ref["skiper"]):
        assert_close(out.skips[i], map_to_cpack(theirs), what=f"skip[{i}]")
        if (n - 1 - i) in skip_to_use:  # doubled stage -> split
            c = theirs.shape[1] // 2
            assert_close(sp[i], map_to_cpack(theirs[:, :c]),
                         what=f"speech[{i}]")
        else:
            assert_close(sp[i], map_to_cpack(theirs), what=f"passthru[{i}]")


@pytest.mark.parametrize("latent_num", [1, 2])
def test_nsvae_twophase_encoder_parity(latent_num):
    """nsvae_pvae_dccrn_encoder_twophase (pvae_module.py:2131-2268) —
    normal channels, spadd-style; maps to channel_mode='normal'."""
    enc_t = _mk_ref(M.nsvae_pvae_dccrn_encoder_twophase, True, latent_num,
                    seed=6)
    wav = wav_batch(seed=7)
    ref = _ref_eval(enc_t, wav)

    cfg = our_cfg(True, latent_num=latent_num)
    enc = NsvaeEncoder(cfg)
    enc_vars = import_nsvae_encoder(sd_numpy(enc_t), cfg)
    out, _ = enc.apply(enc_vars, jnp.asarray(wav), train=False,
                       rng=jax.random.PRNGKey(0))
    _check_gauss(out, ref)
    assert_close(out.stft_x, t2np(ref["stft_x"]), what="stft_x")
