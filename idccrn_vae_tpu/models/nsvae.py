"""NSVAE noisy encoder — emits one or two complex-Gaussian latents.

Replaces nsvae_dccrn_encoder_original / _fc_latent / _double_channel /
_adapt_channel and the twophase encoders (pvae_module.py:930-1550,
2131-2501): channel_mode / latent / latent_num are DccrnConfig flags.
NSVAE encoders never apply datanorm (reference foward has none).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from idccrn_vae_tpu.models.backbone import apply_backbone, init_backbone
from idccrn_vae_tpu.models.config import DccrnConfig
from idccrn_vae_tpu.models.reparam import CGauss, reparameterize
from idccrn_vae_tpu.models.vae import (
    apply_fc_head,
    init_fc_heads,
    parse_sliced_head,
)


class NsvaeOut(NamedTuple):
    z_speech: jnp.ndarray
    gauss_speech: CGauss
    z_noise: Optional[jnp.ndarray]
    gauss_noise: Optional[CGauss]
    skips: list
    stft_x: jnp.ndarray


class NsvaeEncoder:
    def __init__(self, cfg: DccrnConfig):
        self.cfg = cfg
        self.guard = "clamp" if cfg.latent == "fc" else "eps"

    def init(self, key, dtype=jnp.float32):
        cfg = self.cfg
        k1, k2, k3 = jax.random.split(key, 3)
        if cfg.latent == "fc":
            lstm_out = cfg.zdim
        else:
            lstm_out = 3 * cfg.zdim * cfg.latent_num
        params, stats = init_backbone(k1, cfg, lstm_out, dtype)
        if cfg.latent == "fc":
            params["speech_heads"] = init_fc_heads(k2, cfg.zdim, dtype)
            if cfg.latent_num == 2:
                params["noise_heads"] = init_fc_heads(k3, cfg.zdim, dtype)
        return {"params": params, "stats": stats}

    def apply(self, variables, wav, *, train: bool, rng,
              num_samples: Optional[int] = None):
        cfg = self.cfg
        ns = cfg.num_samples if num_samples is None else num_samples
        lstm_out, skips, stft_x, new_stats = apply_backbone(
            variables["params"], variables["stats"], wav, cfg, train,
        )
        k1, k2 = jax.random.split(rng)
        if cfg.latent == "fc":
            g_s = apply_fc_head(lstm_out, variables["params"]["speech_heads"])
            g_n = (
                apply_fc_head(lstm_out, variables["params"]["noise_heads"])
                if cfg.latent_num == 2 else None
            )
        else:
            g_s = parse_sliced_head(lstm_out, cfg.zdim, offset=0)
            g_n = (
                parse_sliced_head(lstm_out, cfg.zdim, offset=3)
                if cfg.latent_num == 2 else None
            )
        z_s = reparameterize(k1, g_s, ns, guard=self.guard)
        z_n = (
            reparameterize(k2, g_n, ns, guard=self.guard)
            if g_n is not None else None
        )
        return NsvaeOut(z_s, g_s, z_n, g_n, skips, stft_x), new_stats


def split_noisy_skips(skips, cfg: DccrnConfig, which: str = "speech"):
    """Half-split the double/adapt noisy encoder's skip channels.

    The first half of each (doubled) stage's channels represents speech,
    the second noise (nsvae_loss.py:372, test_nsvae_se.py:333-348).
    For 'adapt' only the doubled stages split; others pass through.
    Returns skips with nominal (pretrain-geometry) channel counts, ready
    to feed the pretrained clean/noise decoder.
    """
    if cfg.channel_mode == "normal":
        return list(skips)
    out = []
    n = cfg.num_stages
    for i, s in enumerate(skips):
        doubled = cfg.channel_mode == "double" or (
            cfg.channel_mode == "adapt" and (n - 1 - i) in cfg.skip_to_use
        )
        if not doubled:
            out.append(s)
            continue
        c = s.shape[-1] // 2  # complex channels (already doubled)
        half = c // 2
        re, im = s[..., :c], s[..., c:]
        if which == "speech":
            out.append(jnp.concatenate([re[..., :half], im[..., :half]], -1))
        else:
            out.append(jnp.concatenate([re[..., half:], im[..., half:]], -1))
    return out
