"""End-to-end golden parity: full supervised DCCRN forward (causal,
mask recon) vs a torch-primitive oracle.

The oracle composes the documented reference semantics entirely from
torch ops: torch.stft -> causal complex conv stack (pad (2,1) + trim)
with complex-BN running stats + shared-alpha PReLU -> 2-layer complex
LSTM (4 nn.LSTM passes) -> independent re/im linears -> causal complex
tconv stack with skip concat -> polar bounded mask -> torch.istft.
Our model runs from the same weights via the torch-import mapping.
"""

import dataclasses

import numpy as np
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from idccrn_vae_tpu.models.config import DccrnConfig, bottleneck_dims
from idccrn_vae_tpu.models.dccrn import SupervisedDccrn
from idccrn_vae_tpu.models.torch_import import import_supervised_dccrn

EPS = 1e-5

CFG = dataclasses.replace(
    DccrnConfig(),
    encoder_channels=(1, 2, 2, 4, 4, 4, 4),
    lstm_hidden=4,
    zdim=4,
    causal=True,
    recon_type="mask",
    skip_to_use=(0, 1, 2, 3, 4, 5),
)
N_FFT, HOP, WIN = 512, 100, 400


def _mk_state_dict(seed=0):
    rng = np.random.default_rng(seed)
    sd = {}
    f32 = np.float32
    ch = CFG.encoder_channels
    de = CFG.decoder_channels
    kh, kw = CFG.kernel
    n = CFG.num_stages

    def bn_entries(pre, c):
        sd[f"{pre}.gamma_rr"] = np.ones(c, f32)
        sd[f"{pre}.gamma_ri"] = (0.1 * rng.standard_normal(c)).astype(f32)
        sd[f"{pre}.gamma_ii"] = np.ones(c, f32)
        sd[f"{pre}.beta_r"] = (0.1 * rng.standard_normal(c)).astype(f32)
        sd[f"{pre}.beta_i"] = (0.1 * rng.standard_normal(c)).astype(f32)
        sd[f"{pre}.running_mean_real"] = (
            0.1 * rng.standard_normal((1, c, 1, 1))).astype(f32)
        sd[f"{pre}.running_mean_imag"] = (
            0.1 * rng.standard_normal((1, c, 1, 1))).astype(f32)
        sd[f"{pre}.Vrr"] = (1 + 0.2 * rng.random((1, c, 1, 1))).astype(f32)
        sd[f"{pre}.Vri"] = (0.05 * rng.standard_normal(
            (1, c, 1, 1))).astype(f32)
        sd[f"{pre}.Vii"] = (1 + 0.2 * rng.random((1, c, 1, 1))).astype(f32)

    for i in range(n):
        pre = f"std_DCCRN.encoders.{i}"
        cin, cout = ch[i], ch[i + 1]
        sd[f"{pre}.conv.conv_re.weight"] = (
            0.3 * rng.standard_normal((cout, cin, kh, kw))).astype(f32)
        sd[f"{pre}.conv.conv_im.weight"] = (
            0.3 * rng.standard_normal((cout, cin, kh, kw))).astype(f32)
        sd[f"{pre}.conv.conv_re.bias"] = (
            0.1 * rng.standard_normal(cout)).astype(f32)
        sd[f"{pre}.conv.conv_im.bias"] = (
            0.1 * rng.standard_normal(cout)).astype(f32)
        bn_entries(f"{pre}.bn", cout)
        sd[f"{pre}.prelu.weight"] = np.array([0.25], f32)
    for i in range(n):
        pre = f"std_DCCRN.decoders.{i}"
        cin = de[i] + (ch[n - i] if i in CFG.skip_to_use else 0)
        cout = de[i + 1]
        sd[f"{pre}.transconv.tconv_re.weight"] = (
            0.3 * rng.standard_normal((cin, cout, kh, kw))).astype(f32)
        sd[f"{pre}.transconv.tconv_im.weight"] = (
            0.3 * rng.standard_normal((cin, cout, kh, kw))).astype(f32)
        sd[f"{pre}.transconv.tconv_re.bias"] = (
            0.1 * rng.standard_normal(cout)).astype(f32)
        sd[f"{pre}.transconv.tconv_im.bias"] = (
            0.1 * rng.standard_normal(cout)).astype(f32)
        bn_entries(f"{pre}.bn", cout)
        sd[f"{pre}.prelu.weight"] = np.array([0.25], f32)
    c_bott, f_bott = bottleneck_dims(CFG)
    lstm_in = c_bott * f_bott
    h = CFG.lstm_hidden
    for part in ("re", "im"):
        for k in range(CFG.lstm_layers):
            pre = f"std_DCCRN.lstms.0.lstm_{part}"
            in_sz = lstm_in if k == 0 else h
            sd[f"{pre}.weight_ih_l{k}"] = (
                0.2 * rng.standard_normal((4 * h, in_sz))).astype(f32)
            sd[f"{pre}.weight_hh_l{k}"] = (
                0.2 * rng.standard_normal((4 * h, h))).astype(f32)
            sd[f"{pre}.bias_ih_l{k}"] = (
                0.1 * rng.standard_normal(4 * h)).astype(f32)
            sd[f"{pre}.bias_hh_l{k}"] = (
                0.1 * rng.standard_normal(4 * h)).astype(f32)
    sd["std_DCCRN.dense.linear_read.weight"] = (
        0.2 * rng.standard_normal((lstm_in, h))).astype(f32)
    sd["std_DCCRN.dense.linear_imag.weight"] = (
        0.2 * rng.standard_normal((lstm_in, h))).astype(f32)
    sd["std_DCCRN.dense.linear_read.bias"] = (
        0.1 * rng.standard_normal(lstm_in)).astype(f32)
    sd["std_DCCRN.dense.linear_imag.bias"] = (
        0.1 * rng.standard_normal(lstm_in)).astype(f32)
    return sd


def _t(sd, key):
    return torch.from_numpy(sd[key])


def _cbn_eval(sd, pre, re, im):
    t = lambda k: _t(sd, f"{pre}.{k}")
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
    re_o = ((g_rr * wrr + g_ri * wri) * rc + (g_rr * wri + g_ri * wii) * ic
            + t("beta_r").view(shp))
    im_o = ((g_ri * wrr + g_ii * wri) * rc + (g_ri * wri + g_ii * wii) * ic
            + t("beta_i").view(shp))
    return re_o, im_o


def _prelu(x, alpha=0.25):
    return torch.where(x >= 0, x, alpha * x)


def _oracle(sd, wav):
    window = torch.hann_window(WIN)
    spec = torch.stft(torch.from_numpy(wav), N_FFT, HOP, WIN, window,
                      return_complex=True)
    spec = torch.view_as_real(spec)  # (B, F, T, 2)
    xr = spec[..., 0].unsqueeze(1)   # (B, 1, F, T)
    xi = spec[..., 1].unsqueeze(1)
    n = CFG.num_stages
    skips = []
    for i in range(n):
        pre = f"std_DCCRN.encoders.{i}"
        conv = lambda x, w, b: tF.conv2d(x, w, b, stride=(2, 1),
                                         padding=(2, 1))
        wr, wi = _t(sd, f"{pre}.conv.conv_re.weight"), _t(
            sd, f"{pre}.conv.conv_im.weight")
        br, bi = _t(sd, f"{pre}.conv.conv_re.bias"), _t(
            sd, f"{pre}.conv.conv_im.bias")
        re = (conv(xr, wr, br) - conv(xi, wi, bi))[..., :-1]
        im = (conv(xi, wr, br) + conv(xr, wi, bi))[..., :-1]
        re, im = _cbn_eval(sd, f"{pre}.bn", re, im)
        xr, xi = _prelu(re), _prelu(im)
        skips.append((xr, xi))
    b, c, f, t = xr.shape
    # (B, C*F, T) C-major -> (T, B, CF)
    seq_r = xr.reshape(b, c * f, t).permute(2, 0, 1)
    seq_i = xi.reshape(b, c * f, t).permute(2, 0, 1)
    lstms = {}
    for part in ("re", "im"):
        lstm = torch.nn.LSTM(c * f, CFG.lstm_hidden,
                             num_layers=CFG.lstm_layers)
        for k in range(CFG.lstm_layers):
            pre = f"std_DCCRN.lstms.0.lstm_{part}"
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
    out_r = (rr - ii).permute(1, 0, 2)  # (B, T, H)
    out_i = (ir + ri).permute(1, 0, 2)
    dr = tF.linear(out_r, _t(sd, "std_DCCRN.dense.linear_read.weight"),
                   _t(sd, "std_DCCRN.dense.linear_read.bias"))
    di = tF.linear(out_i, _t(sd, "std_DCCRN.dense.linear_imag.weight"),
                   _t(sd, "std_DCCRN.dense.linear_imag.bias"))
    # (B, T, CF) -> (B, C, F, T)
    pr = dr.reshape(b, t, c, f).permute(0, 2, 3, 1)
    pi = di.reshape(b, t, c, f).permute(0, 2, 3, 1)
    for i in range(n):
        pre = f"std_DCCRN.decoders.{i}"
        if i in CFG.skip_to_use:
            sr, si = skips[n - 1 - i]
            pr = torch.cat([pr, sr], 1)
            pi = torch.cat([pi, si], 1)
        tconv = lambda x, w, bb: tF.conv_transpose2d(
            x, w, bb, stride=(2, 1), padding=(2, 0))
        wr = _t(sd, f"{pre}.transconv.tconv_re.weight")
        wi = _t(sd, f"{pre}.transconv.tconv_im.weight")
        br = _t(sd, f"{pre}.transconv.tconv_re.bias")
        bi = _t(sd, f"{pre}.transconv.tconv_im.bias")
        re = (tconv(pr, wr, br) - tconv(pi, wi, bi))[..., :-1]
        im = (tconv(pi, wr, br) + tconv(pr, wi, bi))[..., :-1]
        re, im = _cbn_eval(sd, f"{pre}.bn", re, im)
        pr, pi = _prelu(re), _prelu(im)
    mask_r, mask_i = pr.squeeze(1), pi.squeeze(1)  # (B, F, T)
    mag = torch.tanh(torch.sqrt(mask_r**2 + mask_i**2))
    phase = torch.atan2(mask_i / (mag + 1e-8), mask_r / (mag + 1e-8))
    in_mag = torch.sqrt(spec[..., 0] ** 2 + spec[..., 1] ** 2)
    in_phase = torch.atan2(spec[..., 1], spec[..., 0])
    est = in_mag * mag * torch.exp(1j * (in_phase + phase))
    return torch.istft(est, N_FFT, HOP, WIN, window).numpy()


def test_full_forward_matches_torch_oracle():
    sd = _mk_state_dict()
    wav = (np.random.default_rng(1).standard_normal((2, 1600)) * 0.1
           ).astype(np.float32)
    ref = _oracle(sd, wav)

    model = SupervisedDccrn(CFG)
    variables = import_supervised_dccrn(sd, CFG)
    (ours, _pred), _ = model.apply(variables, jnp.asarray(wav), train=False)
    ours = np.asarray(ours)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=5e-3)
