"""Parity vs the reference's ACTUAL torch classes — supervised DCCRN.

DCCRN_ / standard_DCCRN (pvae_module.py:96-255) full forward (STFT ->
datanorm -> encoder -> complex LSTM -> dense -> skip-concat decoder ->
mask|real_imag -> ISTFT) vs SupervisedDccrn with imported weights,
across causal x recon_type and with per-bin datanorm.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from idccrn_vae_tpu.models.dccrn import SupervisedDccrn
from idccrn_vae_tpu.models.torch_import import import_supervised_dccrn

from oracle_ref import (
    assert_close,
    complex_to_ri,
    our_cfg,
    ref_models,
    sd_numpy,
    t2np,
    tiny_net_params,
    wav_batch,
)

M = ref_models()
LSTM_HIDDEN = 4


def _mk_ref(causal, recon_type, datanorm=None, seed=0):
    torch.manual_seed(seed)
    np_params = tiny_net_params(causal, lstm_hidden=LSTM_HIDDEN)
    mean, std = (None, None) if datanorm is None else (
        torch.from_numpy(datanorm[0][None, :, None, :]),
        torch.from_numpy(datanorm[1][None, :, None, :]),
    )
    model = M.DCCRN_(
        n_fft=32, hop_len=8, net_params=np_params, causal=causal,
        device="cpu", win_length=16, skip_to_use=[0, 1],
        recon_type=recon_type, resynthesis=False,
        data_mean=mean, data_std=std)
    with torch.no_grad():
        model(torch.from_numpy(wav_batch(seed=99)), train=True)  # warm BN
    return model


def _ours(causal, recon_type, sd, datanorm=None):
    cfg = our_cfg(causal, recon_type=recon_type, lstm_hidden=LSTM_HIDDEN)
    dn = None if datanorm is None else (
        jnp.asarray(datanorm[0]), jnp.asarray(datanorm[1]))
    model = SupervisedDccrn(cfg, datanorm=dn)
    return model, import_supervised_dccrn(sd, cfg)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("recon_type", ["mask", "real_imag"])
def test_supervised_dccrn_parity(causal, recon_type):
    model_t = _mk_ref(causal, recon_type)
    wav = wav_batch(seed=1)
    with torch.no_grad():
        clean_t, predict_t = model_t(torch.from_numpy(wav), train=False)

    model, variables = _ours(causal, recon_type, sd_numpy(model_t))
    (clean, predict), _ = model.apply(variables, jnp.asarray(wav),
                                      train=False)
    assert_close(predict, complex_to_ri(predict_t), atol=3e-4, what="predict")
    assert_close(clean, t2np(clean_t), atol=3e-4, what="clean")


def test_supervised_dccrn_datanorm_parity():
    """Per-bin mean/std normalization + DC/Nyquist imag zeroing
    (pvae_module.py:217-221) and the de-norm before ISTFT."""
    rng = np.random.default_rng(3)
    f = 17
    mean = (0.1 * rng.standard_normal((f, 2))).astype(np.float32)
    std = (1.0 + 0.2 * rng.random((f, 2))).astype(np.float32)
    model_t = _mk_ref(True, "mask", datanorm=(mean, std), seed=2)
    wav = wav_batch(seed=4)
    with torch.no_grad():
        clean_t, predict_t = model_t(torch.from_numpy(wav), train=False)

    model, variables = _ours(True, "mask", sd_numpy(model_t),
                             datanorm=(mean, std))
    (clean, predict), _ = model.apply(variables, jnp.asarray(wav),
                                      train=False)
    assert_close(predict, complex_to_ri(predict_t), atol=3e-4, what="predict")
    assert_close(clean, t2np(clean_t), atol=3e-4, what="clean")


def test_supervised_return_latent_matches_ref_latent():
    """standard_DCCRN stores the LSTM bottleneck at eval
    (pvae_module.py:186-189); our return_latent exposes the same."""
    model_t = _mk_ref(False, "mask", seed=5)
    wav = wav_batch(seed=6)
    with torch.no_grad():
        model_t(torch.from_numpy(wav), train=False)
        latent_t = model_t.std_DCCRN.latent  # (B, T, H, 2)

    model, variables = _ours(False, "mask", sd_numpy(model_t))
    (clean, predict, latent), _ = model.apply(
        variables, jnp.asarray(wav), train=False, return_latent=True)
    lt = t2np(latent_t)
    ours = np.asarray(latent)
    h = ours.shape[-1] // 2
    assert_close(ours[..., :h], lt[..., 0], what="latent_re")
    assert_close(ours[..., h:], lt[..., 1], what="latent_im")
