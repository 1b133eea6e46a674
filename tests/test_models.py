"""Shape/flow tests for the model zoo on a tiny geometry."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idccrn_vae_tpu.models import (
    DccrnConfig,
    Discriminator,
    NsvaeEncoder,
    StftConfig,
    SupervisedDccrn,
    VaeDecoder,
    VaeEncoder,
)
from idccrn_vae_tpu.models.config import bottleneck_dims, freq_sizes
from idccrn_vae_tpu.models.nsvae import split_noisy_skips

TINY = DccrnConfig(
    stft=StftConfig(),
    encoder_channels=(1, 2, 4, 4, 8, 8, 8),
    zdim=6,
    num_samples=2,
    causal=True,
)
B, L = 2, 1600  # -> T = 17 frames
T = L // 100 + 1


def test_freq_plan():
    assert freq_sizes(TINY) == (129, 65, 33, 17, 9, 5)
    assert bottleneck_dims(TINY) == (8, 5)
    # full-size geometry: 256 x 5 = 1280 (net_config.py lstm_dim)
    assert bottleneck_dims(DccrnConfig()) == (256, 5)


@pytest.mark.parametrize("latent", ["sliced", "fc"])
def test_vae_encoder_decoder_roundtrip(latent):
    cfg = dataclasses.replace(TINY, latent=latent)
    enc = VaeEncoder(cfg)
    dec = VaeDecoder(cfg)
    key = jax.random.PRNGKey(0)
    ev = enc.init(key)
    dv = dec.init(jax.random.PRNGKey(1))
    wav = jax.random.normal(jax.random.PRNGKey(2), (B, L))
    out, _ = enc.apply(ev, wav, train=True, rng=jax.random.PRNGKey(3))
    S = cfg.num_samples
    assert out.z.shape == (B * S, T, 2 * cfg.zdim)
    assert out.gauss.mu_r.shape == (B, T, cfg.zdim)
    assert out.stft_x.shape == (B, 257, T, 2)
    (recon, predict), _ = dec.apply(dv, out.stft_x, out.z, out.skips,
                                    train=True)
    assert recon.shape == (B * S, (T - 1) * 100)
    assert predict.shape == (B * S, 257, T, 2)
    assert np.isfinite(np.asarray(recon)).all()


def test_vae_noncausal_time_alignment():
    cfg = dataclasses.replace(TINY, causal=False)
    enc, dec = VaeEncoder(cfg), VaeDecoder(cfg)
    ev = enc.init(jax.random.PRNGKey(0))
    dv = dec.init(jax.random.PRNGKey(1))
    wav = jax.random.normal(jax.random.PRNGKey(2), (B, L))
    out, _ = enc.apply(ev, wav, train=True, rng=jax.random.PRNGKey(3))
    # non-causal encoder shrinks time by 1 per stage
    assert out.z.shape[1] == T - 6
    (recon, predict), _ = dec.apply(dv, out.stft_x, out.z, out.skips,
                                    train=True)
    # decoder grows it back
    assert predict.shape[2] == T


@pytest.mark.parametrize("mode,latent_num", [
    ("normal", 1), ("normal", 2), ("double", 2), ("adapt", 2),
])
def test_nsvae_encoder(mode, latent_num):
    cfg = dataclasses.replace(TINY, channel_mode=mode,
                              latent_num=latent_num)
    enc = NsvaeEncoder(cfg)
    v = enc.init(jax.random.PRNGKey(0))
    wav = jax.random.normal(jax.random.PRNGKey(1), (B, L))
    out, _ = enc.apply(v, wav, train=True, rng=jax.random.PRNGKey(2))
    S = cfg.num_samples
    assert out.z_speech.shape == (B * S, T, 2 * cfg.zdim)
    if latent_num == 2:
        assert out.z_noise.shape == (B * S, T, 2 * cfg.zdim)
    else:
        assert out.z_noise is None
    # split skips recover nominal channel widths for the clean decoder
    speech_skips = split_noisy_skips(out.skips, cfg, "speech")
    for i, s in enumerate(speech_skips):
        assert s.shape[-1] == 2 * TINY.encoder_channels[i + 1]


def test_supervised_dccrn():
    for recon_type in ("mask", "real_imag"):
        cfg = dataclasses.replace(TINY, recon_type=recon_type)
        model = SupervisedDccrn(cfg)
        v = model.init(jax.random.PRNGKey(0))
        wav = jax.random.normal(jax.random.PRNGKey(1), (B, L))
        (clean, predict), _ = model.apply(v, wav, train=True)
        assert clean.shape == (B, (T - 1) * 100)
        assert predict.shape == (B, 257, T, 2)
        assert np.isfinite(np.asarray(clean)).all()


def test_discriminator():
    d = Discriminator(TINY)
    v = d.init(jax.random.PRNGKey(0))
    wav = jax.random.normal(jax.random.PRNGKey(1), (B, L))
    score, _ = d.apply(v, wav, train=True)
    assert score.shape == (B, T, 1)


def test_skip_modes_zero_and_none():
    for mode in ("zero", "none", "runtime"):
        cfg = dataclasses.replace(TINY, skip_mode=mode)
        enc, dec = VaeEncoder(cfg), VaeDecoder(cfg)
        ev = enc.init(jax.random.PRNGKey(0))
        dv = dec.init(jax.random.PRNGKey(1))
        wav = jax.random.normal(jax.random.PRNGKey(2), (B, L))
        out, _ = enc.apply(ev, wav, train=True, rng=jax.random.PRNGKey(3))
        (recon, _p), _ = dec.apply(dv, out.stft_x, out.z, out.skips,
                                   train=True, pad_mode="zero")
        assert np.isfinite(np.asarray(recon)).all()


def test_jit_forward():
    model = SupervisedDccrn(TINY)
    v = model.init(jax.random.PRNGKey(0))
    fwd = jax.jit(lambda vv, w: model.apply(vv, w, train=False)[0][0])
    wav = jax.random.normal(jax.random.PRNGKey(1), (B, L))
    out = fwd(v, wav)
    assert out.shape == (B, (T - 1) * 100)


def test_forward_determinism():
    """Same rng -> bitwise-identical forward (the reference pins seeds
    for reproducibility; here determinism is structural)."""
    model = SupervisedDccrn(TINY)
    v = model.init(jax.random.PRNGKey(0))
    wav = jax.random.normal(jax.random.PRNGKey(1), (B, L))
    (o1, _), _ = model.apply(v, wav, train=False)
    (o2, _), _ = model.apply(v, wav, train=False)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    enc = VaeEncoder(TINY)
    ev = enc.init(jax.random.PRNGKey(2))
    out1, _ = enc.apply(ev, wav, train=False, rng=jax.random.PRNGKey(3))
    out2, _ = enc.apply(ev, wav, train=False, rng=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(out1.z), np.asarray(out2.z))


def test_bf16_activations_stay_bf16():
    """compute='bf16' must keep stage outputs and skips bf16 end to end
    — the f32 PReLU alpha used to promote everything back to f32,
    doubling activation HBM traffic (the bf16 path's whole point)."""
    import dataclasses as _dc

    from idccrn_vae_tpu.models.nsvae import NsvaeEncoder

    cfg = _dc.replace(TINY, compute="bf16")
    enc = NsvaeEncoder(cfg)
    v = enc.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 1600)), jnp.float32
    ) * 0.1
    out, _ = enc.apply(v, wav, train=False, rng=jax.random.PRNGKey(1),
                       num_samples=1)
    assert all(s.dtype == jnp.bfloat16 for s in out.skips), \
        [str(s.dtype) for s in out.skips]
