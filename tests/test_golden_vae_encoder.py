"""Golden parity for the VAE encoder posterior path.

Pins wav -> STFT -> causal conv stack -> 2-layer complex LSTM ->
(mu, log_sigma, delta) slicing against a torch-primitive oracle with
shared weights — the posterior math that NSVAE training and metric
parity rest on (pvae_dccrn_encoder, pvae_module.py:259-394).
"""

import dataclasses

import numpy as np
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from idccrn_vae_tpu.models.config import DccrnConfig, bottleneck_dims
from idccrn_vae_tpu.models.torch_import import import_vae_encoder
from idccrn_vae_tpu.models.vae import VaeEncoder

EPS = 1e-5
CFG = dataclasses.replace(
    DccrnConfig(),
    encoder_channels=(1, 2, 2, 4, 4, 4, 4),
    zdim=4,
    num_samples=1,
    causal=True,
    skip_mode="none",
)
N_FFT, HOP, WIN = 512, 100, 400


def _mk_state_dict(seed=0):
    rng = np.random.default_rng(seed)
    f32 = np.float32
    sd = {}
    ch = CFG.encoder_channels
    kh, kw = CFG.kernel
    for i in range(CFG.num_stages):
        cin, cout = ch[i], ch[i + 1]
        pre = f"encoders.{i}"
        sd[f"{pre}.conv.conv_re.weight"] = (
            0.3 * rng.standard_normal((cout, cin, kh, kw))).astype(f32)
        sd[f"{pre}.conv.conv_im.weight"] = (
            0.3 * rng.standard_normal((cout, cin, kh, kw))).astype(f32)
        sd[f"{pre}.conv.conv_re.bias"] = (
            0.1 * rng.standard_normal(cout)).astype(f32)
        sd[f"{pre}.conv.conv_im.bias"] = (
            0.1 * rng.standard_normal(cout)).astype(f32)
        sd[f"{pre}.bn.gamma_rr"] = np.ones(cout, f32)
        sd[f"{pre}.bn.gamma_ri"] = (0.1 * rng.standard_normal(cout)).astype(f32)
        sd[f"{pre}.bn.gamma_ii"] = np.ones(cout, f32)
        sd[f"{pre}.bn.beta_r"] = (0.1 * rng.standard_normal(cout)).astype(f32)
        sd[f"{pre}.bn.beta_i"] = (0.1 * rng.standard_normal(cout)).astype(f32)
        sd[f"{pre}.bn.running_mean_real"] = (
            0.1 * rng.standard_normal((1, cout, 1, 1))).astype(f32)
        sd[f"{pre}.bn.running_mean_imag"] = (
            0.1 * rng.standard_normal((1, cout, 1, 1))).astype(f32)
        sd[f"{pre}.bn.Vrr"] = (1 + 0.2 * rng.random((1, cout, 1, 1))).astype(f32)
        sd[f"{pre}.bn.Vri"] = (0.05 * rng.standard_normal(
            (1, cout, 1, 1))).astype(f32)
        sd[f"{pre}.bn.Vii"] = (1 + 0.2 * rng.random((1, cout, 1, 1))).astype(f32)
        sd[f"{pre}.prelu.weight"] = np.array([0.25], f32)
    c_b, f_b = bottleneck_dims(CFG)
    lstm_in = c_b * f_b
    h = 3 * CFG.zdim  # sliced head
    for part in ("re", "im"):
        for k in range(CFG.lstm_layers):
            pre = f"lstms.0.lstm_{part}"
            in_sz = lstm_in if k == 0 else h
            sd[f"{pre}.weight_ih_l{k}"] = (
                0.2 * rng.standard_normal((4 * h, in_sz))).astype(f32)
            sd[f"{pre}.weight_hh_l{k}"] = (
                0.2 * rng.standard_normal((4 * h, h))).astype(f32)
            sd[f"{pre}.bias_ih_l{k}"] = (
                0.1 * rng.standard_normal(4 * h)).astype(f32)
            sd[f"{pre}.bias_hh_l{k}"] = (
                0.1 * rng.standard_normal(4 * h)).astype(f32)
    return sd


def _t(sd, k):
    return torch.from_numpy(sd[k])


def _oracle_posterior(sd, wav):
    """torch oracle: stft -> causal conv/CBN/PReLU stack -> 4-pass
    complex LSTM -> slice (mu, log_sigma, delta)."""
    window = torch.hann_window(WIN)
    spec = torch.view_as_real(torch.stft(
        torch.from_numpy(wav), N_FFT, HOP, WIN, window, return_complex=True))
    xr = spec[..., 0].unsqueeze(1)
    xi = spec[..., 1].unsqueeze(1)
    for i in range(CFG.num_stages):
        pre = f"encoders.{i}"
        conv = lambda x, w, b: tF.conv2d(x, w, b, stride=(2, 1),
                                         padding=(2, 1))
        wr, wi = _t(sd, f"{pre}.conv.conv_re.weight"), _t(
            sd, f"{pre}.conv.conv_im.weight")
        br, bi = _t(sd, f"{pre}.conv.conv_re.bias"), _t(
            sd, f"{pre}.conv.conv_im.bias")
        re = (conv(xr, wr, br) - conv(xi, wi, bi))[..., :-1]
        im = (conv(xi, wr, br) + conv(xr, wi, bi))[..., :-1]
        t = lambda k: _t(sd, f"{pre}.bn.{k}")
        rc = re - t("running_mean_real")
        ic = im - t("running_mean_imag")
        vrr, vri, vii = t("Vrr"), t("Vri"), t("Vii")
        s = torch.sqrt(torch.clamp(vrr * vii - vri**2 + EPS, min=1e-8))
        tt = torch.sqrt(vrr + vii + 2 * s + EPS)
        inv = 1.0 / (s * tt + EPS)
        wrr, wii, wri = (vii + s) * inv, (vrr + s) * inv, -vri * inv
        shp = (1, -1, 1, 1)
        g_rr, g_ri, g_ii = (t("gamma_rr").view(shp), t("gamma_ri").view(shp),
                            t("gamma_ii").view(shp))
        re = ((g_rr * wrr + g_ri * wri) * rc + (g_rr * wri + g_ri * wii) * ic
              + t("beta_r").view(shp))
        im = ((g_ri * wrr + g_ii * wri) * rc + (g_ri * wri + g_ii * wii) * ic
              + t("beta_i").view(shp))
        xr = torch.where(re >= 0, re, 0.25 * re)
        xi = torch.where(im >= 0, im, 0.25 * im)
    b, c, f, t_len = xr.shape
    seq_r = xr.reshape(b, c * f, t_len).permute(2, 0, 1)
    seq_i = xi.reshape(b, c * f, t_len).permute(2, 0, 1)
    h = 3 * CFG.zdim
    lstms = {}
    for part in ("re", "im"):
        lstm = torch.nn.LSTM(c * f, h, num_layers=CFG.lstm_layers)
        for k in range(CFG.lstm_layers):
            pre = f"lstms.0.lstm_{part}"
            getattr(lstm, f"weight_ih_l{k}").data = _t(
                sd, f"{pre}.weight_ih_l{k}")
            getattr(lstm, f"weight_hh_l{k}").data = _t(
                sd, f"{pre}.weight_hh_l{k}")
            getattr(lstm, f"bias_ih_l{k}").data = _t(sd, f"{pre}.bias_ih_l{k}")
            getattr(lstm, f"bias_hh_l{k}").data = _t(sd, f"{pre}.bias_hh_l{k}")
        lstms[part] = lstm
    with torch.no_grad():
        rr, _ = lstms["re"](seq_r)
        ii, _ = lstms["im"](seq_i)
        ir, _ = lstms["re"](seq_i)
        ri, _ = lstms["im"](seq_r)
    out_r = (rr - ii).permute(1, 0, 2).numpy()   # (B, T, 3z)
    out_i = (ir + ri).permute(1, 0, 2).numpy()
    z = CFG.zdim
    return {
        "mu_r": out_r[..., :z], "mu_i": out_i[..., :z],
        "log_sigma": out_r[..., z:2 * z],
        "delta_r": out_r[..., 2 * z:], "delta_i": out_i[..., 2 * z:],
    }


def test_vae_posterior_matches_torch_oracle():
    sd = _mk_state_dict()
    wav = (np.random.default_rng(1).standard_normal((2, 1600)) * 0.1
           ).astype(np.float32)
    ref = _oracle_posterior(sd, wav)

    enc = VaeEncoder(CFG)
    variables = import_vae_encoder(sd, CFG)
    out, _ = enc.apply(variables, jnp.asarray(wav), train=False,
                       rng=jax.random.PRNGKey(0))
    for key in ("mu_r", "mu_i", "log_sigma", "delta_r", "delta_i"):
        np.testing.assert_allclose(
            np.asarray(getattr(out.gauss, key)), ref[key],
            atol=5e-4, rtol=5e-3, err_msg=key)
