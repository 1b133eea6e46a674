"""Streaming (chunked, stateful) causal enhancement.

The reference's causal configuration exists precisely so the model CAN
run in real time, but the reference only ever evaluates full utterances
offline. This module turns the causal I-DCCRN-VAE pipeline into a true
streaming engine: one jitted `chunk_step` consumes N STFT frames
(N*hop samples) and emits N*hop enhanced samples, carrying ALL temporal
state explicitly:

  * the (n_fft - hop) padded-signal tail for STFT framing,
  * one input time-column per causal conv / transposed-conv layer
    (kernel_t = 2 needs exactly one frame of left context),
  * the complex-LSTM (h, c) carries per layer,
  * the overlap-add numerator/envelope tails for the ISTFT.

Latency = chunk duration + (n_fft - hop) samples (412 = 25.75 ms at
16 kHz): emitted sample q corresponds to input sample q - (n_fft - hop).
Differences from the offline path: the stream head is zero-padded
rather than reflect-padded, frames sit (n_fft - hop) rather than
n_fft/2 ahead of the signal (a constant sub-hop framing offset), and
the latent uses the posterior mean z = mu (what the reference's
sample-averaged decoding converges to).

Chunk-step outputs are bit-stable across chunk boundaries: streaming
output equals the offline causal forward except for those two
documented head effects (pinned by tests/test_streaming.py).
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from idccrn_vae_tpu.models.config import DccrnConfig, bottleneck_dims, freq_sizes
from idccrn_vae_tpu.models.modules import (
    apply_datanorm,
    cpack_concat,
    flatten_bottleneck,
    mask_reconstruct,
    prelu,
    undo_datanorm,
    unflatten_bottleneck,
)
from idccrn_vae_tpu.models.nsvae import split_noisy_skips
from idccrn_vae_tpu.models.vae import parse_sliced_head, apply_fc_head
from idccrn_vae_tpu.ops.batchnorm import complex_batch_norm
from idccrn_vae_tpu.ops.conv import complex_conv2d, complex_conv_transpose2d
from idccrn_vae_tpu.ops.dense import complex_dense
from idccrn_vae_tpu.ops.lstm import complex_lstm
from idccrn_vae_tpu.ops.stft import _padded_hann


class StreamState(NamedTuple):
    pad_tail: jnp.ndarray          # (B, n_fft - hop) padded-signal tail
    enc_tails: List[jnp.ndarray]   # per conv layer: (B, F_in, 1, 2C_in)
    lstm_state: list               # per layer: (h, c) with leading (2,)
    dec_tails: List[jnp.ndarray]   # per tconv layer input col (incl. skips)
    ola_num: jnp.ndarray           # (B, n_fft - hop)
    ola_env: jnp.ndarray           # (n_fft - hop,)


class StreamingEnhancer:
    """Real-time enhancement, chunk by chunk.

    model='nsvae': NSVAE noisy encoder + (pretrained/fine-tuned) decoder
    with z = mu. model='supervised': the supervised DCCRN (pass its full
    variables as enc_vars AND dec_vars — encoder/LSTM live under
    enc_vars['params'], dense/decoder under dec_vars['params'])."""

    def __init__(self, enc_cfg: DccrnConfig, dec_cfg: DccrnConfig,
                 enc_vars, dec_vars, chunk_frames: int = 10,
                 model: str = "nsvae", datanorm=None,
                 pad_mode: str = "sig"):
        assert enc_cfg.causal and dec_cfg.causal, "streaming needs causal"
        self.enc_cfg = enc_cfg
        self.dec_cfg = dec_cfg
        self.enc_vars = enc_vars
        self.dec_vars = dec_vars
        self.model = model
        # matches apply_decoder_stack's use_zeros rule: 'zero'-skip
        # ("spadd") checkpoints and runtime decoders called with
        # pad_mode='zero' must see ZERO skip content — feeding real
        # encoder skips through the skip-half weights would diverge
        # from the offline forward (pinned by test_streaming.py)
        self.pad_mode = pad_mode
        self.zero_skips = (
            dec_cfg.skip_mode == "zero"
            or (dec_cfg.skip_mode == "runtime" and pad_mode == "zero"))
        # (mean, std) per-bin stats for datanorm-trained supervised/VAE
        # checkpoints (models/backbone.py applies them offline; NSVAE
        # noisy encoders never use datanorm, matching the reference)
        self.datanorm = None
        if datanorm is not None:
            self.datanorm = (jnp.asarray(datanorm[0]),
                             jnp.asarray(datanorm[1]))
        self.n = chunk_frames
        s = enc_cfg.stft
        self.hop, self.n_fft = s.hop, s.n_fft
        self.chunk_samples = chunk_frames * s.hop
        self.window = jnp.asarray(
            _padded_hann(s.win_length, s.n_fft), jnp.float32)
        self._step = jax.jit(self._chunk_step)

    # -- state -------------------------------------------------------------
    def init_state(self, batch: int) -> StreamState:
        cfg = self.enc_cfg
        tail = self.n_fft - self.hop
        freqs = (cfg.stft.freq_bins,) + freq_sizes(cfg)
        enc_params = self.enc_vars["params"]["encoder"]
        enc_tails = [
            jnp.zeros((batch, freqs[i], 1, p["conv"]["wr"].shape[2] * 2))
            for i, p in enumerate(enc_params)
        ]
        hidden = self.enc_vars["params"]["lstm"]["re"][0]["w_hh"].shape[0]
        lstm_state = [
            (jnp.zeros((2, 2 * batch, hidden)),
             jnp.zeros((2, 2 * batch, hidden)))
            for _ in range(cfg.lstm_layers)
        ]
        dcfg = self.dec_cfg
        dec_freqs = tuple(reversed(freqs))[:-1]  # input F per decoder stage
        dec_params = self.dec_vars["params"]["decoder"]
        dec_tails = [
            jnp.zeros((batch, dec_freqs[i], 1, p["conv"]["wr"].shape[2] * 2))
            for i, p in enumerate(dec_params)
        ]
        return StreamState(
            pad_tail=jnp.zeros((batch, tail)),
            enc_tails=enc_tails,
            lstm_state=lstm_state,
            dec_tails=dec_tails,
            ola_num=jnp.zeros((batch, tail)),
            ola_env=jnp.zeros((tail,)),
        )

    # -- one chunk ---------------------------------------------------------
    def _chunk_step(self, enc_vars, dec_vars, state: StreamState,
                    chunk: jnp.ndarray):
        cfg, dcfg = self.enc_cfg, self.dec_cfg
        n, hop, n_fft = self.n, self.hop, self.n_fft
        b = chunk.shape[0]

        # 1. frame + STFT
        buf = jnp.concatenate([state.pad_tail, chunk], axis=1)
        idx = np.arange(n)[:, None] * hop + np.arange(n_fft)[None, :]
        frames = buf[:, idx] * self.window  # (B, N, n_fft)
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
        stft_x = jnp.stack([jnp.real(spec), jnp.imag(spec)],
                           axis=-1)  # (B, N, F, 2)
        stft_x = jnp.swapaxes(stft_x, 1, 2)  # (B, F, N, 2)
        if self.datanorm is not None:
            stft_x = apply_datanorm(stft_x, *self.datanorm)
        new_pad_tail = buf[:, -(n_fft - hop):]

        # 2. encoder conv stack with carried time columns
        x = stft_x
        enc_params = enc_vars["params"]["encoder"]
        enc_stats = enc_vars["stats"]["encoder"]
        new_enc_tails = []
        skips = []
        for p, s, tail in zip(enc_params, enc_stats, state.enc_tails):
            xin = jnp.concatenate([tail, x], axis=2)  # (B, F, 1+N, 2C)
            new_enc_tails.append(xin[:, :, -1:, :])
            x = complex_conv2d(xin, p["conv"], cfg.stride,
                               (cfg.freq_pad, 0), causal=False)
            x, _ = complex_batch_norm(x, p["bn"], s, train=False)
            x = prelu(x, p["prelu"])
            skips.append(x)

        # double/adapt noisy encoders emit doubled skip channels; the
        # pretrained-geometry decoder consumes the speech half (same
        # split as the offline Enhancer.forward).
        if self.model == "nsvae":
            skips = split_noisy_skips(skips, cfg, "speech")

        # 3. LSTM with carried state -> latent (posterior mean) or, for
        # the supervised model, the bottleneck features directly
        seq = flatten_bottleneck(x)
        lstm_out, new_lstm_state = complex_lstm(
            seq, enc_vars["params"]["lstm"], backend="scan",
            state=state.lstm_state, return_state=True)
        if self.model == "supervised":
            z = lstm_out
        elif cfg.latent == "fc":
            gauss = apply_fc_head(lstm_out, enc_vars["params"]["speech_heads"])
            z = jnp.concatenate([gauss.mu_r, gauss.mu_i], axis=-1)
        else:
            gauss = parse_sliced_head(lstm_out, cfg.zdim, offset=0)
            z = jnp.concatenate([gauss.mu_r, gauss.mu_i], axis=-1)

        # 4. decoder with carried time columns
        c, f = bottleneck_dims(dcfg)
        dense_out = complex_dense(z, dec_vars["params"]["dense"])
        p_map = unflatten_bottleneck(dense_out, c, f)
        dec_params = dec_vars["params"]["decoder"]
        dec_stats = dec_vars["stats"]["decoder"]
        nst = dcfg.num_stages
        new_dec_tails = []
        for i, (p, s, tail) in enumerate(
                zip(dec_params, dec_stats, state.dec_tails)):
            if dcfg.skip_mode != "none" and i in dcfg.skip_to_use:
                sk = skips[nst - 1 - i]
                if self.zero_skips:
                    sk = jnp.zeros_like(sk)
                p_map = cpack_concat(p_map, sk)
            xin = jnp.concatenate([tail, p_map], axis=2)
            new_dec_tails.append(xin[:, :, -1:, :])
            p_map = complex_conv_transpose2d(
                xin, p["conv"], dcfg.stride, (dcfg.freq_pad, 0),
                causal=False)
            # non-causal tconv on (1+N) cols yields (1+N)+1 cols; the
            # streaming-aligned outputs are columns 1..N (col 0 needs the
            # dropped pre-tail context, the last is the causal trim).
            p_map = p_map[:, :, 1 : n + 1, :]
            p_map, _ = complex_batch_norm(p_map, p["bn"], s, train=False)
            p_map = prelu(p_map, p["prelu"])

        # 5. mask / real_imag reconstruction on this chunk's frames
        if dcfg.recon_type == "mask":
            est = mask_reconstruct(p_map, stft_x)
        else:
            est = p_map
        if self.datanorm is not None:
            est = undo_datanorm(est, *self.datanorm)

        # 6. streaming inverse STFT with carried OLA tails
        cplx = jnp.swapaxes(est[..., 0] + 1j * est[..., 1], 1, 2)
        oframes = jnp.fft.irfft(cplx, n=n_fft, axis=-1) * self.window
        total = n * hop + (n_fft - hop)
        flat_idx = jnp.asarray(idx.reshape(-1))
        num = jnp.zeros((b, total))
        num = num.at[:, : n_fft - hop].add(state.ola_num)
        num = num.at[:, flat_idx].add(oframes.reshape(b, -1))
        env = jnp.zeros((total,))
        env = env.at[: n_fft - hop].add(state.ola_env)
        env = env.at[flat_idx].add(
            jnp.broadcast_to(self.window**2, (n, n_fft)).reshape(-1))
        m = n * hop
        out = num[:, :m] / jnp.maximum(env[:m], 1e-8)

        new_state = StreamState(
            pad_tail=new_pad_tail,
            enc_tails=new_enc_tails,
            lstm_state=new_lstm_state,
            dec_tails=new_dec_tails,
            ola_num=num[:, m:],
            ola_env=env[m:],
        )
        return out, new_state

    # -- public ------------------------------------------------------------
    def process_chunk(self, state: StreamState, chunk):
        """chunk: (B, chunk_samples) -> (enhanced (B, chunk_samples), state)."""
        return self._step(self.enc_vars, self.dec_vars, state,
                          jnp.asarray(chunk, jnp.float32))

    def stream(self, wav: np.ndarray):
        """Convenience: run a full (B, L) signal through chunked calls.

        The final partial chunk (L % chunk_samples) is zero-padded,
        processed, and the output trimmed back to L — no trailing
        samples are silently dropped."""
        b, total = wav.shape
        m = self.chunk_samples
        n_chunks = -(-total // m)
        state = self.init_state(b)
        outs = []
        for k in range(n_chunks):
            chunk = wav[:, k * m:(k + 1) * m]
            if chunk.shape[1] < m:
                chunk = np.pad(chunk, ((0, 0), (0, m - chunk.shape[1])))
            out, state = self.process_chunk(state, chunk)
            outs.append(np.asarray(out))
        return np.concatenate(outs, axis=1)[:, :total]
