"""Shared encode backbone: STFT -> (datanorm) -> conv stack -> complex LSTM.

Factored once; every encoder in the zoo (VAE, NSVAE variants, supervised
DCCRN, discriminator) reuses it. Mirrors the flow of
pvae_module.py:363-394 / :174-189 in cpack layout.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from idccrn_vae_tpu.models.config import DccrnConfig, bottleneck_dims
from idccrn_vae_tpu.models.modules import (
    apply_datanorm,
    apply_encoder_stack,
    flatten_bottleneck,
    init_encoder_stack,
)
from idccrn_vae_tpu.ops.lstm import complex_lstm, init_complex_lstm
from idccrn_vae_tpu.ops.stft import stft


def init_backbone(key, cfg: DccrnConfig, lstm_out_dim: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    enc_params, enc_stats = init_encoder_stack(k1, cfg, dtype)
    c, f = bottleneck_dims(cfg)
    lstm_params = init_complex_lstm(k2, c * f, lstm_out_dim, cfg.lstm_layers,
                                    dtype)
    return {"encoder": enc_params, "lstm": lstm_params}, {"encoder": enc_stats}


def apply_backbone(
    params,
    stats,
    wav: jnp.ndarray,
    cfg: DccrnConfig,
    train: bool,
    datanorm: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    dis_mode: bool = False,
):
    """wav (B, L) -> (lstm_out (B,T,2H), skips, stft_x (B,F,T,2), stats').

    stft_x is post-datanorm when datanorm=(mean, std) is given, matching
    what the reference's encoders return for the decoder/loss path.
    """
    s = cfg.stft
    stft_x = stft(wav, s.n_fft, s.hop, s.win_length)  # (B, F, T, 2)
    if datanorm is not None:
        stft_x = apply_datanorm(stft_x, datanorm[0], datanorm[1])
    x = stft_x  # cpack with C=1: last axis [re, im]
    x, skips, enc_stats = apply_encoder_stack(
        params["encoder"], stats["encoder"], x, cfg, train, dis_mode=dis_mode
    )
    seq = flatten_bottleneck(x)  # (B, T', 2*C*F)
    cdt = None if cfg.compute == "f32" else cfg.compute_dtype
    lstm_out = complex_lstm(seq, params["lstm"], compute_dtype=cdt)
    return lstm_out, skips, stft_x, {"encoder": enc_stats}
