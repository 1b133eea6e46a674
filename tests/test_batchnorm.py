"""Complex BN parity vs an inline torch oracle of the reference formula.

The oracle below re-derives the Trabelsi whitening closed form from the
documented semantics (complex_progress.py:92-209): batch stats in train
mode, momentum 0.9 running update, first-batch wholesale copy, dis-mode
always-copy, epsilon/clamp guards.
"""

import numpy as np
import torch

import jax.numpy as jnp

from idccrn_vae_tpu.ops.batchnorm import (
    complex_batch_norm,
    init_cbn_stats,
)

EPS = 1e-5


def _oracle(re, im, gamma, beta, vstats=None):
    """Whitening+affine with given or batch stats. All torch, NCHW."""
    if vstats is None:
        mu_r = re.mean(dim=(0, 2, 3), keepdim=True)
        mu_i = im.mean(dim=(0, 2, 3), keepdim=True)
        rc, ic = re - mu_r, im - mu_i
        vrr = (rc * rc).mean(dim=(0, 2, 3), keepdim=True) + EPS
        vii = (ic * ic).mean(dim=(0, 2, 3), keepdim=True) + EPS
        vri = (rc * ic).mean(dim=(0, 2, 3), keepdim=True)
    else:
        mu_r, mu_i, vrr, vri, vii = vstats
        rc, ic = re - mu_r, im - mu_i
    tau = vrr + vii
    det = torch.clamp(vrr * vii - vri ** 2 + EPS, min=1e-8)
    s = torch.sqrt(det)
    t = torch.sqrt(tau + 2 * s + EPS)
    inv = 1.0 / (s * t + EPS)
    wrr, wii, wri = (vii + s) * inv, (vrr + s) * inv, -vri * inv
    g_rr, g_ri, g_ii = gamma
    zrr = g_rr * wrr + g_ri * wri
    zri = g_rr * wri + g_ri * wii
    zir = g_ri * wrr + g_ii * wri
    zii = g_ri * wri + g_ii * wii
    return zrr * rc + zri * ic + beta[0], zir * rc + zii * ic + beta[1]


def _mk(b=4, c=3, f=6, t=5, seed=0):
    rng = np.random.default_rng(seed)
    re = rng.standard_normal((b, c, f, t)).astype(np.float32) * 2 + 0.5
    im = rng.standard_normal((b, c, f, t)).astype(np.float32) * 0.7 - 0.3
    g_rr = np.ones(c, np.float32)
    g_ri = rng.standard_normal(c).astype(np.float32) * 0.1
    g_ii = np.ones(c, np.float32)
    b_r = rng.standard_normal(c).astype(np.float32) * 0.1
    b_i = rng.standard_normal(c).astype(np.float32) * 0.1
    params = {
        "gamma_rr": jnp.asarray(g_rr), "gamma_ri": jnp.asarray(g_ri),
        "gamma_ii": jnp.asarray(g_ii), "beta_r": jnp.asarray(b_r),
        "beta_i": jnp.asarray(b_i),
    }
    x = jnp.concatenate(
        [jnp.asarray(np.transpose(re, (0, 2, 3, 1))),
         jnp.asarray(np.transpose(im, (0, 2, 3, 1)))], axis=-1)
    shp = (1, c, 1, 1)
    torch_bits = (
        torch.from_numpy(re), torch.from_numpy(im),
        (torch.from_numpy(g_rr).view(shp), torch.from_numpy(g_ri).view(shp),
         torch.from_numpy(g_ii).view(shp)),
        (torch.from_numpy(b_r).view(shp), torch.from_numpy(b_i).view(shp)),
    )
    return x, params, torch_bits


def _unpack(out, c):
    out = np.asarray(out)
    return (np.transpose(out[..., :c], (0, 3, 1, 2)),
            np.transpose(out[..., c:], (0, 3, 1, 2)))


def test_train_matches_oracle():
    x, params, (re, im, gamma, beta) = _mk()
    out, stats = complex_batch_norm(x, params, init_cbn_stats(3), train=True)
    ref_re, ref_im = _oracle(re, im, gamma, beta)
    our_re, our_im = _unpack(out, 3)
    np.testing.assert_allclose(our_re, ref_re.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(our_im, ref_im.numpy(), atol=1e-5, rtol=1e-4)
    assert int(stats["count"]) == 1


def test_first_batch_copies_then_momentum():
    x, params, (re, im, *_rest) = _mk(seed=1)
    stats = init_cbn_stats(3)
    _, s1 = complex_batch_norm(x, params, stats, train=True)
    # first batch: wholesale copy (init_flag semantics)
    batch_mu = re.mean(dim=(0, 2, 3)).numpy()
    np.testing.assert_allclose(np.asarray(s1["mean_r"]), batch_mu, atol=1e-5)

    x2, _, (re2, *_r2) = _mk(seed=2)
    _, s2 = complex_batch_norm(x2, params, s1, train=True)
    expect = 0.9 * batch_mu + 0.1 * re2.mean(dim=(0, 2, 3)).numpy()
    np.testing.assert_allclose(np.asarray(s2["mean_r"]), expect, atol=1e-5)


def test_dis_mode_always_copies():
    x, params, (re, *_r) = _mk(seed=3)
    stats = init_cbn_stats(3)
    _, s1 = complex_batch_norm(x, params, stats, train=True, dis_mode=True)
    x2, _, (re2, *_r2) = _mk(seed=4)
    _, s2 = complex_batch_norm(x2, params, s1, train=True, dis_mode=True)
    np.testing.assert_allclose(
        np.asarray(s2["mean_r"]), re2.mean(dim=(0, 2, 3)).numpy(), atol=1e-5)


def test_eval_uses_running_stats():
    x, params, (re, im, gamma, beta) = _mk(seed=5)
    _, s1 = complex_batch_norm(x, params, init_cbn_stats(3), train=True)
    x2, _, (re2, im2, *_r) = _mk(seed=6)
    out, s_same = complex_batch_norm(x2, params, s1, train=False)
    assert int(s_same["count"]) == int(s1["count"])
    shp = (1, 3, 1, 1)
    vstats = tuple(
        torch.from_numpy(np.asarray(s1[k])).view(shp)
        for k in ("mean_r", "mean_i", "Vrr", "Vri", "Vii"))
    ref_re, ref_im = _oracle(re2, im2, gamma, beta, vstats=vstats)
    our_re, our_im = _unpack(out, 3)
    np.testing.assert_allclose(our_re, ref_re.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(our_im, ref_im.numpy(), atol=1e-5, rtol=1e-4)
