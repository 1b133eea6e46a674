"""LSGAN discriminator for phase-2 adversarial fine-tuning.

distinguisher (pvae_module.py:2271-2351): dis-mode complex-BN conv
encoder stack -> real 2-layer nn.LSTM(input=2*1280, hidden=1) over the
interleaved re/im bottleneck features -> per-frame score (B, T, 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from idccrn_vae_tpu.models.config import DccrnConfig, bottleneck_dims
from idccrn_vae_tpu.models.modules import (
    apply_encoder_stack,
    flatten_bottleneck,
    init_encoder_stack,
)
from idccrn_vae_tpu.ops.lstm import init_lstm, lstm
from idccrn_vae_tpu.ops.stft import stft


class Discriminator:
    def __init__(self, cfg: DccrnConfig):
        self.cfg = cfg

    def init(self, key, dtype=jnp.float32):
        cfg = self.cfg
        c, f = bottleneck_dims(cfg)
        k1, k2 = jax.random.split(key)
        enc_params, enc_stats = init_encoder_stack(k1, cfg, dtype)
        params = {
            "encoder": enc_params,
            # real LSTM over interleaved (re, im) features -> scalar score
            "lstm": init_lstm(k2, 2 * c * f, 1, cfg.lstm_layers, dtype),
        }
        return {"params": params, "stats": {"encoder": enc_stats}}

    def apply(self, variables, wav, *, train: bool):
        """wav (B, L) -> (score (B, T, 1), new_stats)."""
        cfg = self.cfg
        s = cfg.stft
        params, stats = variables["params"], variables["stats"]
        x = stft(wav, s.n_fft, s.hop, s.win_length)
        # dis_mode=True: discriminator CBN re-copies batch stats every
        # step (complex_progress.py:144-151 with dis_cbn=True).
        x, _, enc_stats = apply_encoder_stack(
            params["encoder"], stats["encoder"], x, cfg, train, dis_mode=True
        )
        # Interleave re/im per (c, f) feature to match the reference's
        # reshape(T, B, C*F*2) on a (..., C*F, 2) tensor. The C-major
        # CF ordering itself is flatten_bottleneck — the one source of
        # truth for the checkpoint-interop flattening convention.
        b, _f, t, _c2 = x.shape
        re, im = jnp.split(flatten_bottleneck(x), 2, axis=-1)
        seq = jnp.stack([re, im], axis=-1).reshape(b, t, -1)
        score = lstm(seq, params["lstm"])  # (B, T, 1)
        return score, {"encoder": enc_stats}
