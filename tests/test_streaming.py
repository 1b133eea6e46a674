"""Streaming causal inference: state-carry exactness + offline parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from idccrn_vae_tpu.eval.streaming import StreamingEnhancer
from idccrn_vae_tpu.models.config import DccrnConfig, bottleneck_dims
from idccrn_vae_tpu.models.modules import (
    apply_decoder_stack,
    apply_encoder_stack,
    flatten_bottleneck,
    mask_reconstruct,
    unflatten_bottleneck,
)
from idccrn_vae_tpu.models.nsvae import NsvaeEncoder
from idccrn_vae_tpu.models.vae import VaeDecoder, parse_sliced_head
from idccrn_vae_tpu.ops.dense import complex_dense
from idccrn_vae_tpu.ops.lstm import complex_lstm
from idccrn_vae_tpu.ops.stft import istft, stft

CFG = DccrnConfig(
    encoder_channels=(1, 2, 2, 4, 4, 4, 4),
    zdim=4,
    num_samples=1,
    causal=True,
    recon_type="mask",
)
B = 2


def _models():
    enc = NsvaeEncoder(CFG)
    dec = VaeDecoder(CFG)
    return (enc.init(jax.random.PRNGKey(0)), dec.init(jax.random.PRNGKey(1)))


def _wav(n, zero_head=True, seed=0):
    x = (np.random.default_rng(seed).standard_normal((B, n)) * 0.1).astype(
        np.float32)
    if zero_head:
        x[:, :400] = 0.0  # reflect-pad of a zero head == zero-pad
    return x


def test_chunk_size_invariance():
    enc_vars, dec_vars = _models()
    n = 4000  # 40 frames
    wav = _wav(n)
    small = StreamingEnhancer(CFG, CFG, enc_vars, dec_vars, chunk_frames=8)
    big = StreamingEnhancer(CFG, CFG, enc_vars, dec_vars, chunk_frames=40)
    out_small = small.stream(wav)
    out_big = big.stream(wav)
    np.testing.assert_allclose(out_small, out_big, atol=1e-4, rtol=1e-3)


def _offline_mu_forward(enc_vars, dec_vars, wav):
    """Offline causal forward with z = mu through the NON-streaming code
    path (offline padding), for cross-validation."""
    s = CFG.stft
    stft_x = stft(jnp.asarray(wav), s.n_fft, s.hop, s.win_length)
    x, skips, _ = apply_encoder_stack(
        enc_vars["params"]["encoder"], enc_vars["stats"]["encoder"],
        stft_x, CFG, train=False)
    lstm_out = complex_lstm(flatten_bottleneck(x),
                            enc_vars["params"]["lstm"], backend="scan")
    gauss = parse_sliced_head(lstm_out, CFG.zdim, offset=0)
    z = jnp.concatenate([gauss.mu_r, gauss.mu_i], axis=-1)
    c, f = bottleneck_dims(CFG)
    dense_out = complex_dense(z, dec_vars["params"]["dense"])
    p = unflatten_bottleneck(dense_out, c, f)
    out, _ = apply_decoder_stack(
        dec_vars["params"]["decoder"], dec_vars["stats"]["decoder"], p,
        skips, CFG, train=False, num_samples=1)
    est = mask_reconstruct(out, stft_x)
    return np.asarray(istft(est, s.n_fft, s.hop, s.win_length))


def test_streaming_matches_offline():
    """Streaming frames sit at stream offset n_fft - hop (412 zeros of
    initial state); align the offline oracle by left-padding the input
    with (n_fft - hop) - n_fft//2 = 156 zeros, after which
    streaming[q] == offline[q - n_fft//2] exactly."""
    enc_vars, dec_vars = _models()
    n = 3000  # 30 frames
    wav = _wav(n, zero_head=True, seed=3)
    streamer = StreamingEnhancer(CFG, CFG, enc_vars, dec_vars,
                                 chunk_frames=10)
    out_stream = streamer.stream(wav)
    shift = (CFG.stft.n_fft - CFG.stft.hop) - CFG.stft.n_fft // 2
    wav_shifted = np.pad(wav, ((0, 0), (shift, 0)))
    out_offline = _offline_mu_forward(enc_vars, dec_vars, wav_shifted)
    delay = CFG.stft.n_fft // 2
    a = out_stream[:, delay:]
    b = out_offline[:, : a.shape[1]]
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)


def test_streaming_matches_offline_zero_skips():
    """'spadd' (skip_mode='zero') checkpoints: the offline decoder
    contributes NOTHING from the skip half (apply_decoder_stack
    skip_kind='zero'), so the streaming step must feed zeros there too —
    regression for a bug where real encoder skips went through the
    skip-half weights and every chunk silently diverged."""
    zcfg = dataclasses.replace(CFG, skip_mode="zero")
    enc = NsvaeEncoder(CFG)
    dec = VaeDecoder(zcfg)
    enc_vars = enc.init(jax.random.PRNGKey(0))
    dec_vars = dec.init(jax.random.PRNGKey(1))
    wav = _wav(3000, zero_head=True, seed=7)
    streamer = StreamingEnhancer(CFG, zcfg, enc_vars, dec_vars,
                                 chunk_frames=10)
    assert streamer.zero_skips
    out_stream = streamer.stream(wav)

    s = CFG.stft
    shift = (s.n_fft - s.hop) - s.n_fft // 2
    wav_shifted = jnp.asarray(np.pad(wav, ((0, 0), (shift, 0))))
    stft_x = stft(wav_shifted, s.n_fft, s.hop, s.win_length)
    x, skips, _ = apply_encoder_stack(
        enc_vars["params"]["encoder"], enc_vars["stats"]["encoder"],
        stft_x, CFG, train=False)
    lstm_out = complex_lstm(flatten_bottleneck(x),
                            enc_vars["params"]["lstm"], backend="scan")
    gauss = parse_sliced_head(lstm_out, CFG.zdim, offset=0)
    z = jnp.concatenate([gauss.mu_r, gauss.mu_i], axis=-1)
    c, f = bottleneck_dims(zcfg)
    p = unflatten_bottleneck(complex_dense(z, dec_vars["params"]["dense"]),
                             c, f)
    out, _ = apply_decoder_stack(
        dec_vars["params"]["decoder"], dec_vars["stats"]["decoder"], p,
        skips, zcfg, train=False, num_samples=1)
    out_offline = np.asarray(istft(mask_reconstruct(out, stft_x),
                                   s.n_fft, s.hop, s.win_length))
    delay = s.n_fft // 2
    a = out_stream[:, delay:]
    b = out_offline[:, : a.shape[1]]
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)


def test_stream_pads_final_partial_chunk():
    """stream() must not silently drop the last L % chunk_samples
    samples: the tail chunk is zero-padded and the output trimmed."""
    enc_vars, dec_vars = _models()
    streamer = StreamingEnhancer(CFG, CFG, enc_vars, dec_vars,
                                 chunk_frames=10)  # 1000-sample chunks
    wav = _wav(3640, zero_head=True, seed=8)
    out = streamer.stream(wav)
    assert out.shape == wav.shape
    # the covered prefix equals a run on the exact-multiple prefix
    out_exact = streamer.stream(wav[:, :3000])
    np.testing.assert_allclose(out[:, :3000], out_exact,
                               atol=1e-5, rtol=1e-4)


def test_stream_shapes_and_latency():
    enc_vars, dec_vars = _models()
    streamer = StreamingEnhancer(CFG, CFG, enc_vars, dec_vars,
                                 chunk_frames=5)
    state = streamer.init_state(B)
    chunk = _wav(500, zero_head=False, seed=4)
    out, state2 = streamer.process_chunk(state, chunk)
    assert out.shape == (B, 500)
    assert np.isfinite(np.asarray(out)).all()
    # state advances
    assert not np.allclose(np.asarray(state2.pad_tail),
                           np.asarray(state.pad_tail))


def test_streaming_supervised_matches_offline():
    from idccrn_vae_tpu.models.dccrn import SupervisedDccrn

    cfg = dataclasses.replace(CFG, lstm_hidden=4)
    model = SupervisedDccrn(cfg)
    v = model.init(jax.random.PRNGKey(5))
    wav = _wav(3000, zero_head=True, seed=6)
    streamer = StreamingEnhancer(cfg, cfg, v, v, chunk_frames=10,
                                 model="supervised")
    out_stream = streamer.stream(wav)
    shift = (cfg.stft.n_fft - cfg.stft.hop) - cfg.stft.n_fft // 2
    wav_shifted = np.pad(wav, ((0, 0), (shift, 0)))
    (out_offline, _), _ = model.apply(v, jnp.asarray(wav_shifted),
                                      train=False)
    delay = cfg.stft.n_fft // 2
    a = out_stream[:, delay:]
    b = np.asarray(out_offline)[:, : a.shape[1]]
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)


def test_streaming_double_channel():
    """double/adapt NSVAE checkpoints stream: the doubled skip channels
    are half-split to the pretrained-geometry decoder (previously a
    concat/conv shape crash). Chunk-size invariance doubles as the
    state-carry correctness check."""
    enc_cfg = dataclasses.replace(CFG, latent_num=2, channel_mode="double")
    enc_vars = NsvaeEncoder(enc_cfg).init(jax.random.PRNGKey(3))
    dec_vars = VaeDecoder(CFG).init(jax.random.PRNGKey(4))
    wav = _wav(2400, seed=5)
    small = StreamingEnhancer(enc_cfg, CFG, enc_vars, dec_vars,
                              chunk_frames=8)
    big = StreamingEnhancer(enc_cfg, CFG, enc_vars, dec_vars,
                            chunk_frames=24)
    out_small = small.stream(wav)
    out_big = big.stream(wav)
    assert out_small.shape == (B, 2400)
    assert np.isfinite(out_small).all()
    np.testing.assert_allclose(out_small, out_big, atol=1e-4, rtol=1e-3)


def test_streaming_supervised_datanorm_matches_offline():
    """A datanorm-trained supervised checkpoint must stream through the
    SAME normalize/denormalize as the offline forward (previously the
    streaming engine silently dropped datanorm)."""
    from idccrn_vae_tpu.models.dccrn import SupervisedDccrn

    cfg = dataclasses.replace(CFG, lstm_hidden=4)
    f = cfg.stft.freq_bins
    rng = np.random.default_rng(8)
    dn = (rng.standard_normal((f, 2)).astype(np.float32) * 0.01,
          (1.0 + 0.1 * rng.standard_normal((f, 2))).astype(np.float32))
    model = SupervisedDccrn(cfg, (jnp.asarray(dn[0]), jnp.asarray(dn[1])))
    v = model.init(jax.random.PRNGKey(5))
    wav = _wav(3000, zero_head=True, seed=9)
    streamer = StreamingEnhancer(cfg, cfg, v, v, chunk_frames=10,
                                 model="supervised", datanorm=dn)
    out_stream = streamer.stream(wav)
    shift = (cfg.stft.n_fft - cfg.stft.hop) - cfg.stft.n_fft // 2
    wav_shifted = np.pad(wav, ((0, 0), (shift, 0)))
    (out_offline, _), _ = model.apply(v, jnp.asarray(wav_shifted),
                                      train=False)
    delay = cfg.stft.n_fft // 2
    a = out_stream[:, delay:]
    b = np.asarray(out_offline)[:, : a.shape[1]]
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)
