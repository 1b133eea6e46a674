"""VAE encoder/decoder pair (CVAE / NVAE pretraining models).

One configurable class each replaces the reference's
pvae_dccrn_encoder{,_no_skip,_no_skip_fc_latent,_skip_prepare,
_skip_prepare_fc_latent,_prob_skip} and the matching decoders
(pvae_module.py:259-926, 1556-2122): skip handling and latent-head
style are DccrnConfig flags.

Encoder output mirrors the reference tuple contract
``(z, mu, log_sigma, delta, skiper, C, F, stft_x)`` as a NamedTuple;
decoder returns ``(recon_sig, predict_spec)``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from idccrn_vae_tpu.models.backbone import apply_backbone, init_backbone
from idccrn_vae_tpu.models.config import DccrnConfig, bottleneck_dims
from idccrn_vae_tpu.models.modules import (
    apply_decoder_stack,
    init_decoder_stack,
    mask_reconstruct,
    undo_datanorm,
    unflatten_bottleneck,
)
from idccrn_vae_tpu.models.reparam import CGauss, reparameterize
from idccrn_vae_tpu.ops.dense import complex_dense, init_complex_dense
from idccrn_vae_tpu.ops.stft import istft, stft


class EncoderOut(NamedTuple):
    z: jnp.ndarray          # (B*S, T, 2*zdim) cpack
    gauss: CGauss           # posterior parameters, each (B, T, zdim)
    skips: list             # encoder skips (cpack maps)
    stft_x: jnp.ndarray     # (B, F, T, 2), post-datanorm if enabled


def parse_sliced_head(lstm_out: jnp.ndarray, zdim: int, offset: int = 0):
    """Slice (mu, log_sigma, delta) from a 3*zdim (or 6*zdim) cpack
    sequence (pvae_module.py:384-386). offset in zdim units selects the
    speech (0) or noise (3) triplet for dual-latent heads."""
    h = lstm_out.shape[-1] // 2
    re, im = lstm_out[..., :h], lstm_out[..., h:]
    o = offset * zdim
    return CGauss(
        mu_r=re[..., o : o + zdim],
        mu_i=im[..., o : o + zdim],
        log_sigma=re[..., o + zdim : o + 2 * zdim],
        log_sigma_i=im[..., o + zdim : o + 2 * zdim],
        delta_r=re[..., o + 2 * zdim : o + 3 * zdim],
        delta_i=im[..., o + 2 * zdim : o + 3 * zdim],
    )


def apply_fc_head(lstm_out: jnp.ndarray, heads: dict) -> CGauss:
    """Three ComplexDense heads (fc-latent family, pvae_module.py:792-794)."""
    mu = complex_dense(lstm_out, heads["mean"])
    ls = complex_dense(lstm_out, heads["logvar"])
    dl = complex_dense(lstm_out, heads["delta"])
    z = mu.shape[-1] // 2
    return CGauss(
        mu_r=mu[..., :z], mu_i=mu[..., z:],
        log_sigma=ls[..., :z], log_sigma_i=ls[..., z:],
        delta_r=dl[..., :z], delta_i=dl[..., z:],
    )


def init_fc_heads(key, zdim: int, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "mean": init_complex_dense(k1, zdim, zdim, dtype),
        "logvar": init_complex_dense(k2, zdim, zdim, dtype),
        "delta": init_complex_dense(k3, zdim, zdim, dtype),
    }


class VaeEncoder:
    """Pretrain VAE encoder (CVAE on clean speech / NVAE on noise)."""

    def __init__(self, cfg: DccrnConfig,
                 datanorm: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None):
        self.cfg = cfg
        self.datanorm = datanorm
        self.guard = "clamp" if cfg.latent == "fc" else "eps"

    def init(self, key, dtype=jnp.float32):
        cfg = self.cfg
        k1, k2 = jax.random.split(key)
        lstm_out = cfg.zdim if cfg.latent == "fc" else 3 * cfg.zdim
        params, stats = init_backbone(k1, cfg, lstm_out, dtype)
        if cfg.latent == "fc":
            params["heads"] = init_fc_heads(k2, cfg.zdim, dtype)
        return {"params": params, "stats": stats}

    def apply(self, variables, wav, *, train: bool, rng,
              num_samples: Optional[int] = None):
        cfg = self.cfg
        ns = cfg.num_samples if num_samples is None else num_samples
        lstm_out, skips, stft_x, new_stats = apply_backbone(
            variables["params"], variables["stats"], wav, cfg, train,
            datanorm=self.datanorm,
        )
        if cfg.latent == "fc":
            gauss = apply_fc_head(lstm_out, variables["params"]["heads"])
        else:
            gauss = parse_sliced_head(lstm_out, cfg.zdim)
        z = reparameterize(rng, gauss, ns, guard=self.guard)
        return EncoderOut(z, gauss, skips, stft_x), new_stats


class VaeDecoder:
    """Pretrain VAE decoder; skip handling per cfg.skip_mode."""

    def __init__(self, cfg: DccrnConfig,
                 datanorm: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None):
        self.cfg = cfg
        self.datanorm = datanorm

    def init(self, key, dtype=jnp.float32):
        cfg = self.cfg
        k1, k2 = jax.random.split(key)
        c, f = bottleneck_dims(cfg)
        dec_params, dec_stats = init_decoder_stack(k1, cfg, dtype)
        params = {
            "dense": init_complex_dense(k2, cfg.zdim, c * f, dtype),
            "decoder": dec_params,
        }
        return {"params": params, "stats": {"decoder": dec_stats}}

    def apply(self, variables, stft_x, z, skips, *, train: bool,
              num_samples: Optional[int] = None, pad_mode: str = "sig",
              rng=None):
        """Returns (recon_sig (B*S, L), predict_spec (B*S, F, T, 2)).

        Mirrors pvae_dccrn_decoder.forward (pvae_module.py:448-517):
        dense -> unflatten -> deconv stack (skips repeated per sample) ->
        recon_type branch -> ISTFT (+ optional resynthesis STFT).
        """
        cfg = self.cfg
        ns = cfg.num_samples if num_samples is None else num_samples
        params, stats = variables["params"], variables["stats"]
        c, f = bottleneck_dims(cfg)

        dense_out = complex_dense(
            z, params["dense"],
            compute_dtype=None if cfg.compute == "f32" else cfg.compute_dtype,
        )  # (B*S, T, 2*C*F)
        p = unflatten_bottleneck(dense_out, c, f)      # (B*S, F, T, 2C)
        out, dec_stats = apply_decoder_stack(
            params["decoder"], stats["decoder"], p, skips, cfg, train,
            num_samples=ns, pad_mode=pad_mode, skip_rng=rng,
        )  # (B*S, F0, T, 2)

        recon_sig, predict = finish_reconstruction(
            out, stft_x, cfg, ns, self.datanorm
        )
        return (recon_sig, predict), {"decoder": dec_stats}


def finish_reconstruction(out, stft_x, cfg: DccrnConfig, num_samples: int,
                          datanorm):
    """recon_type branch + datanorm undo + ISTFT (+ resynthesis).

    out: decoder output (B*S, F, T, 2); stft_x: (B, F, T, 2).
    """
    s = cfg.stft
    out = out.astype(jnp.float32)  # leave reduced precision at the edge
    if cfg.recon_type == "mask":
        tiled = jnp.repeat(stft_x, num_samples, axis=0)
        predict = mask_reconstruct(out, tiled)
    else:  # 'real_imag'
        predict = out
    if datanorm is not None:
        predict = undo_datanorm(predict, datanorm[0], datanorm[1])
    recon_sig = istft(predict, s.n_fft, s.hop, s.win_length)
    if cfg.resynthesis:
        predict = stft(recon_sig, s.n_fft, s.hop, s.win_length)
    return recon_sig, predict
