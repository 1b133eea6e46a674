"""Shared DCCRN building blocks (functional, cpack layout).

Mirrors the reference's Encoder/Decoder sub-blocks (conv → complex BN →
PReLU; pvae_module.py:45-93) and the bottleneck reshape conventions
(pvae_module.py:174-198), re-laid-out for TPU:

  * feature maps are (B, F, T, 2*C) cpack (NHWC) — see ops/complex.py,
  * the CF flattening order matches the reference's reshape(B, C*F, T)
    so torch checkpoints import weight-for-weight,
  * PReLU is the reference's single-shared-alpha nn.PReLU() applied to
    the stacked real/imag tensor (pvae_module.py:58 — NOT per-channel).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from idccrn_vae_tpu.models.config import DccrnConfig, encoder_plan, decoder_plan
from idccrn_vae_tpu.ops.batchnorm import (
    complex_batch_norm,
    init_cbn_params,
    init_cbn_stats,
)
from idccrn_vae_tpu.ops.conv import (
    complex_conv2d,
    complex_conv_transpose2d,
    init_complex_conv2d,
    init_complex_conv_transpose2d,
)


def prelu(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Single-shared-alpha PReLU (torch nn.PReLU() default).

    alpha is cast to x's dtype: the f32 parameter would otherwise
    promote every bf16 stage output (and all skip maps) to f32 through
    jnp.where, doubling the HBM traffic the bf16 path exists to halve
    (ops/conv.py keeps activations bf16 between stages by design)."""
    return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


# ---------------------------------------------------------------------------
# encoder / decoder stacks
# ---------------------------------------------------------------------------


def init_encoder_stack(key, cfg: DccrnConfig, dtype=jnp.float32):
    plan = encoder_plan(cfg)
    params, stats = [], []
    for i, (cin, cout) in enumerate(plan):
        key, k1, k2 = jax.random.split(key, 3)
        params.append({
            "conv": init_complex_conv2d(k1, cin, cout, cfg.kernel, dtype),
            "bn": init_cbn_params(k2, cout, dtype),
            "prelu": jnp.full((), 0.25, dtype),
        })
        stats.append(init_cbn_stats(cout))
    return params, stats


def apply_encoder_stack(params, stats, x, cfg: DccrnConfig, train: bool,
                        dis_mode: bool = False):
    """x: (B, F, T, 2*Cin) -> (bottleneck, skips list, new_stats)."""
    time_pad = 1 if cfg.causal else 0
    cdt = cfg.compute_dtype
    skips = []
    new_stats = []

    def stage(p, s, x):
        x = complex_conv2d(
            x, p["conv"], cfg.stride, (cfg.freq_pad, time_pad),
            causal=cfg.causal, compute_dtype=cdt,
            quant=cfg.conv_quant and not train,
            quant_min_ch=cfg.quant_min_ch,
        )
        x, s2 = complex_batch_norm(x, p["bn"], s, train=train,
                                   dis_mode=dis_mode)
        return prelu(x, p["prelu"]), s2

    if cfg.remat:
        stage = jax.checkpoint(stage)
    for p, s in zip(params, stats):
        x, s2 = stage(p, s, x)
        skips.append(x)
        new_stats.append(s2)
    return x, skips, new_stats


def init_decoder_stack(key, cfg: DccrnConfig, dtype=jnp.float32):
    plan = decoder_plan(cfg)
    params, stats = [], []
    for i, (cin, cout) in enumerate(plan):
        key, k1, k2 = jax.random.split(key, 3)
        params.append({
            "conv": init_complex_conv_transpose2d(k1, cin, cout, cfg.kernel, dtype),
            "bn": init_cbn_params(k2, cout, dtype),
            "prelu": jnp.full((), 0.25, dtype),
        })
        stats.append(init_cbn_stats(cout))
    return params, stats


def cpack_concat(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Channel-concat two cpack maps: [a_re, b_re, a_im, b_im]."""
    ca, cb = a.shape[-1] // 2, b.shape[-1] // 2
    return jnp.concatenate(
        [a[..., :ca], b[..., :cb], a[..., ca:], b[..., cb:]], axis=-1
    )


def apply_decoder_stack(
    params,
    stats,
    x,
    skips,
    cfg: DccrnConfig,
    train: bool,
    num_samples: int = 1,
    pad_mode: str = "sig",
    skip_rng: Optional[jax.Array] = None,
):
    """Decoder with configurable skip handling.

    Args:
      x: (B*S, F_bottleneck, T, 2*C) cpack.
      skips: encoder skip list, each (B, F_i, T_i, 2*C_i); repeated over
        the sample dim here (matches pvae_module.py:459-462 ordering).
      pad_mode: for skip_mode=='runtime' ('zero' or 'sig', the twophase
        decoder's call-time choice, pvae_module.py:2561-2566).
      skip_rng: rng for skip_mode=='prob' (p=0.5 real-vs-zero at train,
        pvae_module.py:1681-1781).
    Returns:
      (out (B*S, F0, T', 2), new_stats).
    """
    n = cfg.num_stages
    new_stats = []
    # prob mode: ONE coin per forward (pvae_module.py:1731-1737), real
    # skips when it lands true (always at eval), zeros or a self-copy of
    # the running feature map otherwise (skip_prob 1 / 2).
    if cfg.skip_mode == "prob" and train:
        assert skip_rng is not None
        use_real_skips = jax.random.bernoulli(skip_rng, 0.5)
    else:
        use_real_skips = None
    def _tconv(x, par):
        return complex_conv_transpose2d(
            x, par, cfg.stride, (cfg.freq_pad, 0), causal=cfg.causal,
            compute_dtype=cfg.compute_dtype,
            quant=(cfg.conv_quant and not train
                   and cfg.quant_scope == "all"),
            quant_min_ch=cfg.quant_min_ch,
        )

    def _split_params(p, cx):
        wr, wi = p["conv"]["wr"], p["conv"]["wi"]
        par_x = {"wr": wr[:, :, :cx], "wi": wi[:, :, :cx],
                 "br": p["conv"]["br"], "bi": p["conv"]["bi"]}
        zb = jnp.zeros_like(p["conv"]["br"])
        par_s = {"wr": wr[:, :, cx:], "wi": wi[:, :, cx:],
                 "br": zb, "bi": zb}
        return par_x, par_s

    def stage(p, s, x, skip, skip_kind):
        # Skip handling: mathematically cat([x, skip]) @ W, computed as
        # x @ W[:Cx] + skip @ W[Cx:] — two summed convs avoid
        # materializing the concatenated tensor (HBM win). skip_kind:
        #   'none'   — stage has no skip channels
        #   'zero'   — skip channels are zeros ("spadd"): their conv
        #              contributes nothing, so it is skipped entirely
        #   'shared' — skip is (B, …) identical across the S samples:
        #              its conv runs ONCE at batch B and the result is
        #              repeated (exact, saves S× of the skip-half FLOPs)
        #   'full'   — skip already matches x's batch (prob mode)
        cx = x.shape[-1] // 2
        if skip_kind == "none":
            y = _tconv(x, p["conv"])
        else:
            par_x, par_s = _split_params(p, cx)
            y = _tconv(x, par_x)
            if skip_kind == "shared":
                ys = _tconv(skip, par_s)
                y = y + jnp.repeat(ys, num_samples, axis=0)
            elif skip_kind == "full":
                y = y + _tconv(skip, par_s)
            # 'zero': nothing to add
        # Last stage keeps BN+PReLU too (if_bn=True at all reference call
        # sites — pvae_module.py:424-437).
        y, s2 = complex_batch_norm(y, p["bn"], s, train=train)
        return prelu(y, p["prelu"]), s2

    if cfg.remat:
        stage = jax.checkpoint(stage, static_argnums=(4,))
    for i, (p, s) in enumerate(zip(params, stats)):
        skip, skip_kind = None, "none"
        if cfg.skip_mode != "none" and i in cfg.skip_to_use:
            raw = skips[n - 1 - i]
            use_zeros = (
                cfg.skip_mode == "zero"
                or (cfg.skip_mode == "runtime" and pad_mode == "zero")
            )
            if use_real_skips is not None:
                rep = jnp.repeat(raw, num_samples, axis=0)
                alt = jnp.zeros_like(rep) if cfg.skip_prob == 1 else x
                skip = jnp.where(use_real_skips, rep, alt)
                skip_kind = "full"
            elif use_zeros:
                skip_kind = "zero"
            elif num_samples > 1:
                skip, skip_kind = raw, "shared"
            else:
                skip, skip_kind = raw, "full"
        x, s2 = stage(p, s, x, skip, skip_kind)
        new_stats.append(s2)
    return x, new_stats


# ---------------------------------------------------------------------------
# bottleneck reshapes (match reference's C-major CF flattening)
# ---------------------------------------------------------------------------


def flatten_bottleneck(x: jnp.ndarray) -> jnp.ndarray:
    """(B, F, T, 2C) cpack -> (B, T, 2*C*F) cpack sequence.

    Flattening index is c*F + f to match reshape(B, C*F, T) on the
    reference's (B, C, F, T) maps — required for checkpoint interop.
    """
    b, f, t, c2 = x.shape
    c = c2 // 2
    re = jnp.transpose(x[..., :c], (0, 2, 3, 1)).reshape(b, t, c * f)
    im = jnp.transpose(x[..., c:], (0, 2, 3, 1)).reshape(b, t, c * f)
    return jnp.concatenate([re, im], axis=-1)


def unflatten_bottleneck(x: jnp.ndarray, c: int, f: int) -> jnp.ndarray:
    """(B, T, 2*C*F) cpack sequence -> (B, F, T, 2C) cpack map."""
    b, t, _ = x.shape
    re, im = jnp.split(x, 2, axis=-1)
    re = jnp.transpose(re.reshape(b, t, c, f), (0, 3, 1, 2))
    im = jnp.transpose(im.reshape(b, t, c, f), (0, 3, 1, 2))
    return jnp.concatenate([re, im], axis=-1)


# ---------------------------------------------------------------------------
# spectrogram normalization + mask reconstruction
# ---------------------------------------------------------------------------


def apply_datanorm(stft_x: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray):
    """Per-bin mean/std normalization, zeroing imag at DC and Nyquist
    (pvae_module.py:217-221). stft_x: (B, F, T, 2); mean/std: (F, 2)."""
    out = (stft_x - mean[None, :, None, :]) / (std[None, :, None, :] + 1e-6)
    out = out.at[:, 0, :, 1].set(0.0)
    out = out.at[:, -1, :, 1].set(0.0)
    return out


def undo_datanorm(spec: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray):
    return std[None, :, None, :] * spec + mean[None, :, None, :]


def mask_reconstruct(mask: jnp.ndarray, stft_x: jnp.ndarray) -> jnp.ndarray:
    """Polar bounded-magnitude mask (pvae_module.py:493-507).

    mask, stft_x: (B, F, T, 2). Returns masked spec (B, F, T, 2):
      |Y| = |X| * tanh(|M|),  ∠Y = ∠X + ∠M.
    """
    mask_mag = jnp.sqrt(mask[..., 0] ** 2 + mask[..., 1] ** 2)
    bounded = jnp.tanh(mask_mag)
    real_ph = mask[..., 0] / (bounded + 1e-8)
    imag_ph = mask[..., 1] / (bounded + 1e-8)
    mask_phase = jnp.arctan2(imag_ph, real_ph)
    in_mag = jnp.sqrt(stft_x[..., 0] ** 2 + stft_x[..., 1] ** 2)
    in_phase = jnp.arctan2(stft_x[..., 1], stft_x[..., 0])
    out_mag = in_mag * bounded
    phase = in_phase + mask_phase
    return jnp.stack([out_mag * jnp.cos(phase), out_mag * jnp.sin(phase)],
                     axis=-1)
