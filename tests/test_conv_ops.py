"""Complex conv / transposed conv / dense / LSTM parity vs torch oracles.

Each test builds the reference semantics directly from torch primitives
(the reference's complex ops are thin compositions of nn.Conv2d /
nn.ConvTranspose2d / nn.LSTM / nn.Linear — complex_progress.py) and
checks our single-conv block-kernel formulation against them.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax.numpy as jnp

from idccrn_vae_tpu.ops.conv import complex_conv2d, complex_conv_transpose2d
from idccrn_vae_tpu.ops.dense import complex_dense
from idccrn_vae_tpu.ops.lstm import lstm, complex_lstm


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def _ref_complex_conv(xr, xi, wr, wi, br, bi, stride, padding):
    """re = conv_re(xr) - conv_im(xi); im = conv_re(xi) + conv_im(xr)."""
    conv = lambda x, w, b: tF.conv2d(x, w, b, stride=stride, padding=padding)
    re = conv(xr, wr, br) - conv(xi, wi, bi)
    im = conv(xi, wr, br) + conv(xr, wi, bi)
    return re, im


class TestComplexConv2d:
    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_torch(self, causal):
        b, cin, cout, f, t = 2, 3, 5, 17, 11
        kh, kw, stride = 5, 2, (2, 1)
        padding = (2, 1) if causal else (2, 0)
        x = _rand(b, 2 * cin, f, t, seed=1)  # torch NCHW, [0:cin]=re
        wr = _rand(cout, cin, kh, kw, seed=2) * 0.2
        wi = _rand(cout, cin, kh, kw, seed=3) * 0.2
        br = _rand(cout, seed=4)
        bi = _rand(cout, seed=5)

        xt = torch.from_numpy(x)
        re, im = _ref_complex_conv(
            xt[:, :cin], xt[:, cin:],
            torch.from_numpy(wr), torch.from_numpy(wi),
            torch.from_numpy(br), torch.from_numpy(bi), stride, padding,
        )
        if causal:
            re, im = re[..., :-1], im[..., :-1]
        ref = torch.cat([re, im], 1).numpy()

        # ours: NHWC cpack; kernels HWIO
        xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
        params = {
            "wr": jnp.asarray(np.transpose(wr, (2, 3, 1, 0))),
            "wi": jnp.asarray(np.transpose(wi, (2, 3, 1, 0))),
            "br": jnp.asarray(br),
            "bi": jnp.asarray(bi),
        }
        ours = np.asarray(
            complex_conv2d(xj, params, stride, padding, causal=causal)
        )
        np.testing.assert_allclose(
            np.transpose(ours, (0, 3, 1, 2)), ref, atol=1e-4, rtol=1e-4
        )


class TestComplexConvTranspose2d:
    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_torch(self, causal):
        b, cin, cout, f, t = 2, 4, 3, 9, 11
        kh, kw, stride, padding = 5, 2, (2, 1), (2, 0)
        x = _rand(b, 2 * cin, f, t, seed=6)
        wr = _rand(cin, cout, kh, kw, seed=7) * 0.2
        wi = _rand(cin, cout, kh, kw, seed=8) * 0.2
        br = _rand(cout, seed=9)
        bi = _rand(cout, seed=10)

        xt = torch.from_numpy(x)
        tconv = lambda xx, w, bb: tF.conv_transpose2d(
            xx, w, bb, stride=stride, padding=padding
        )
        wrt, wit = torch.from_numpy(wr), torch.from_numpy(wi)
        brt, bit = torch.from_numpy(br), torch.from_numpy(bi)
        re = tconv(xt[:, :cin], wrt, brt) - tconv(xt[:, cin:], wit, bit)
        im = tconv(xt[:, cin:], wrt, brt) + tconv(xt[:, :cin], wit, bit)
        if causal:
            re, im = re[..., :-1], im[..., :-1]
        ref = torch.cat([re, im], 1).numpy()

        xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
        params = {
            "wr": jnp.asarray(np.transpose(wr, (2, 3, 0, 1))),
            "wi": jnp.asarray(np.transpose(wi, (2, 3, 0, 1))),
            "br": jnp.asarray(br),
            "bi": jnp.asarray(bi),
        }
        ours = np.asarray(
            complex_conv_transpose2d(xj, params, stride, padding, causal=causal)
        )
        np.testing.assert_allclose(
            np.transpose(ours, (0, 3, 1, 2)), ref, atol=1e-4, rtol=1e-4
        )
        # shape law: F' = 2F - 1 for the reference geometry
        assert ours.shape[1] == 2 * f - 1


class TestComplexDense:
    def test_matches_torch(self):
        b, t, cin, cout = 3, 7, 6, 4
        x = _rand(b, t, 2 * cin, seed=11)
        wr = _rand(cout, cin, seed=12)
        wi = _rand(cout, cin, seed=13)
        br, bi = _rand(cout, seed=14), _rand(cout, seed=15)
        xt = torch.from_numpy(x)
        re = tF.linear(xt[..., :cin], torch.from_numpy(wr), torch.from_numpy(br))
        im = tF.linear(xt[..., cin:], torch.from_numpy(wi), torch.from_numpy(bi))
        ref = torch.cat([re, im], -1).numpy()
        params = {
            "wr": jnp.asarray(wr.T), "wi": jnp.asarray(wi.T),
            "br": jnp.asarray(br), "bi": jnp.asarray(bi),
        }
        ours = np.asarray(complex_dense(jnp.asarray(x), params))
        np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def _torch_lstm_params(tl: torch.nn.LSTM):
    layers = []
    for layer in range(tl.num_layers):
        layers.append({
            "w_ih": jnp.asarray(
                getattr(tl, f"weight_ih_l{layer}").detach().numpy().T),
            "w_hh": jnp.asarray(
                getattr(tl, f"weight_hh_l{layer}").detach().numpy().T),
            "b_ih": jnp.asarray(getattr(tl, f"bias_ih_l{layer}").detach().numpy()),
            "b_hh": jnp.asarray(getattr(tl, f"bias_hh_l{layer}").detach().numpy()),
        })
    return layers


class TestLSTM:
    @pytest.mark.parametrize("num_layers", [1, 2])
    def test_matches_torch(self, num_layers):
        torch.manual_seed(0)
        b, t, din, h = 3, 20, 8, 6
        tl = torch.nn.LSTM(din, h, num_layers=num_layers)
        x = _rand(t, b, din, seed=16)
        ref, _ = tl(torch.from_numpy(x))
        ours = lstm(jnp.asarray(np.transpose(x, (1, 0, 2))),
                    _torch_lstm_params(tl))
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (1, 0, 2)),
            ref.detach().numpy(), atol=1e-5, rtol=1e-4,
        )

    def test_complex_matches_four_pass(self):
        """ComplexLSTM semantics: re=L_re(xr)-L_im(xi); im=L_re(xi)+L_im(xr)
        (complex_progress.py:50-74)."""
        torch.manual_seed(1)
        b, t, din, h = 2, 15, 10, 5
        l_re = torch.nn.LSTM(din, h, num_layers=2)
        l_im = torch.nn.LSTM(din, h, num_layers=2)
        xr = _rand(t, b, din, seed=17)
        xi = _rand(t, b, din, seed=18)
        rr, _ = l_re(torch.from_numpy(xr))
        ii, _ = l_im(torch.from_numpy(xi))
        ir, _ = l_re(torch.from_numpy(xi))
        ri, _ = l_im(torch.from_numpy(xr))
        ref_re = (rr - ii).detach().numpy()
        ref_im = (ir + ri).detach().numpy()

        params = {"re": _torch_lstm_params(l_re), "im": _torch_lstm_params(l_im)}
        x_cpack = jnp.concatenate(
            [jnp.asarray(np.transpose(xr, (1, 0, 2))),
             jnp.asarray(np.transpose(xi, (1, 0, 2)))], axis=-1)
        out = np.asarray(complex_lstm(x_cpack, params))
        np.testing.assert_allclose(
            np.transpose(out[..., :h], (1, 0, 2)), ref_re, atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(
            np.transpose(out[..., h:], (1, 0, 2)), ref_im, atol=1e-5, rtol=1e-4)
