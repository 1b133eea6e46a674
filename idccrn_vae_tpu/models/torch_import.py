"""Import reference PyTorch checkpoints into this framework's pytrees.

The reference saves torch state_dicts (train.py:402-414 etc.) whose
module names follow pvae_module.py / complex_progress.py. This module
maps them weight-for-weight onto our param/stat trees:

  encoders.{i}.conv.conv_re.weight (Co,Ci,kh,kw) -> encoder[i].conv.wr (kh,kw,Ci,Co)
  encoders.{i}.bn.gamma_rr / running_mean_real   -> encoder[i].bn.* / stats
  encoders.{i}.prelu.weight (1,)                 -> encoder[i].prelu ()
  lstms.0.lstm_re.weight_ih_l{k} (4H,In)         -> lstm.re[k].w_ih (In,4H)
  dense.linear_read.weight (O,I)                 -> dense.wr (I,O)
  decoders.{i}.transconv.tconv_re.weight (Ci,Co,kh,kw)
                                                 -> decoder[i].conv.wr (kh,kw,Ci,Co)

Transposed-conv note: torch tconv weights are (Cin, Cout, kh, kw) and
our ops flip them spatially at apply time, so the import is a pure
transpose. Running-stat buffers (1,C,1,1) flatten to (C,); the import
marks stats as initialized (count=1) since a trained torch checkpoint
has live running stats (init_flag consumed).

Loading .pt files requires torch (CPU build is fine); everything
downstream is numpy/jax.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load a checkpoint (or state_dict) -> numpy dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    if not all(hasattr(v, "numpy") for v in obj.values()):
        raise ValueError(f"not a state_dict-like checkpoint: {path}")
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}


def _j(a: np.ndarray) -> jnp.ndarray:
    # NB: np.ascontiguousarray would promote 0-d arrays to 1-d.
    return jnp.asarray(np.asarray(a, np.float32))


def convert_conv(sd, prefix: str, transposed: bool = False) -> dict:
    re_w = sd[f"{prefix}.conv_re.weight" if not transposed
              else f"{prefix}.tconv_re.weight"]
    im_w = sd[f"{prefix}.conv_im.weight" if not transposed
              else f"{prefix}.tconv_im.weight"]
    re_b = sd[f"{prefix}.conv_re.bias" if not transposed
              else f"{prefix}.tconv_re.bias"]
    im_b = sd[f"{prefix}.conv_im.bias" if not transposed
              else f"{prefix}.tconv_im.bias"]
    if transposed:  # (Ci, Co, kh, kw) -> (kh, kw, Ci, Co)
        perm = (2, 3, 0, 1)
    else:           # (Co, Ci, kh, kw) -> (kh, kw, Ci, Co)
        perm = (2, 3, 1, 0)
    return {
        "wr": _j(np.transpose(re_w, perm)),
        "wi": _j(np.transpose(im_w, perm)),
        "br": _j(re_b),
        "bi": _j(im_b),
    }


def convert_bn(sd, prefix: str):
    params = {k: _j(sd[f"{prefix}.{k}"]) for k in
              ("gamma_rr", "gamma_ri", "gamma_ii", "beta_r", "beta_i")}
    stats = {
        "mean_r": _j(sd[f"{prefix}.running_mean_real"].reshape(-1)),
        "mean_i": _j(sd[f"{prefix}.running_mean_imag"].reshape(-1)),
        "Vrr": _j(sd[f"{prefix}.Vrr"].reshape(-1)),
        "Vri": _j(sd[f"{prefix}.Vri"].reshape(-1)),
        "Vii": _j(sd[f"{prefix}.Vii"].reshape(-1)),
        "count": jnp.ones((), jnp.int32),
    }
    return params, stats


def convert_real_lstm(sd, prefix: str, num_layers: int):
    layers = []
    for k in range(num_layers):
        layers.append({
            "w_ih": _j(sd[f"{prefix}.weight_ih_l{k}"].T),
            "w_hh": _j(sd[f"{prefix}.weight_hh_l{k}"].T),
            "b_ih": _j(sd[f"{prefix}.bias_ih_l{k}"]),
            "b_hh": _j(sd[f"{prefix}.bias_hh_l{k}"]),
        })
    return layers


def convert_complex_lstm(sd, prefix: str, num_layers: int):
    return {
        "re": convert_real_lstm(sd, f"{prefix}.lstm_re", num_layers),
        "im": convert_real_lstm(sd, f"{prefix}.lstm_im", num_layers),
    }


def convert_dense(sd, prefix: str):
    return {
        "wr": _j(sd[f"{prefix}.linear_read.weight"].T),
        "wi": _j(sd[f"{prefix}.linear_imag.weight"].T),
        "br": _j(sd[f"{prefix}.linear_read.bias"]),
        "bi": _j(sd[f"{prefix}.linear_imag.bias"]),
    }


def _convert_stage(sd, prefix: str, transposed: bool):
    conv_name = "transconv" if transposed else "conv"
    conv = convert_conv(sd, f"{prefix}.{conv_name}", transposed)
    bn_params, bn_stats = convert_bn(sd, f"{prefix}.bn")
    stage = {
        "conv": conv,
        "bn": bn_params,
        "prelu": _j(sd[f"{prefix}.prelu.weight"].reshape(())),
    }
    return stage, bn_stats


def convert_encoder_stack(sd, prefix: str, num_stages: int):
    params, stats = [], []
    for i in range(num_stages):
        p, s = _convert_stage(sd, f"{prefix}.{i}", transposed=False)
        params.append(p)
        stats.append(s)
    return params, stats


def convert_decoder_stack(sd, prefix: str, num_stages: int):
    params, stats = [], []
    for i in range(num_stages):
        p, s = _convert_stage(sd, f"{prefix}.{i}", transposed=True)
        params.append(p)
        stats.append(s)
    return params, stats


def _fc_heads(sd, names: Dict[str, str]):
    return {ours: convert_dense(sd, theirs) for ours, theirs in names.items()}


def import_vae_encoder(sd, cfg) -> dict:
    """pvae_dccrn_encoder* state_dict -> VaeEncoder variables."""
    n = cfg.num_stages
    enc_params, enc_stats = convert_encoder_stack(sd, "encoders", n)
    params = {
        "encoder": enc_params,
        "lstm": convert_complex_lstm(sd, "lstms.0", cfg.lstm_layers),
    }
    if cfg.latent == "fc":
        params["heads"] = _fc_heads(sd, {
            "mean": "dense_mean", "logvar": "dense_logvar",
            "delta": "dense_delta"})
    return {"params": params, "stats": {"encoder": enc_stats}}


def import_vae_decoder(sd, cfg) -> dict:
    n = cfg.num_stages
    dec_params, dec_stats = convert_decoder_stack(sd, "decoders", n)
    return {
        "params": {"dense": convert_dense(sd, "dense"),
                   "decoder": dec_params},
        "stats": {"decoder": dec_stats},
    }


def import_nsvae_encoder(sd, cfg) -> dict:
    n = cfg.num_stages
    enc_params, enc_stats = convert_encoder_stack(sd, "encoders", n)
    params = {
        "encoder": enc_params,
        "lstm": convert_complex_lstm(sd, "lstms.0", cfg.lstm_layers),
    }
    if cfg.latent == "fc":
        params["speech_heads"] = _fc_heads(sd, {
            "mean": "speech_dense_mean", "logvar": "speech_dense_logvar",
            "delta": "speech_dense_delta"})
        if cfg.latent_num == 2:
            params["noise_heads"] = _fc_heads(sd, {
                "mean": "noise_dense_mean", "logvar": "noise_dense_logvar",
                "delta": "noise_dense_delta"})
    return {"params": params, "stats": {"encoder": enc_stats}}


def import_legacy_dccrn(sd, cfg) -> dict:
    """Legacy module.py DCCRN_ state_dict -> LegacyDccrn vars.

    Identical layer layout to the pvae DCCRN_ except the inner model
    attribute is named `DCCRN` (module.py:196) instead of `std_DCCRN`,
    and the dead 1x1 `linear` conv (module.py:143) is skipped like the
    pvae one."""
    return import_supervised_dccrn(sd, cfg, prefix="DCCRN")


def import_supervised_dccrn(sd, cfg, prefix: str = "std_DCCRN") -> dict:
    """DCCRN_ (pvae_module.py:200) state_dict -> SupervisedDccrn vars.
    The unused 1x1 `linear` conv (pvae_module.py:158) is skipped."""
    p = prefix
    n = cfg.num_stages
    enc_params, enc_stats = convert_encoder_stack(sd, f"{p}.encoders", n)
    dec_params, dec_stats = convert_decoder_stack(sd, f"{p}.decoders", n)
    return {
        "params": {
            "encoder": enc_params,
            "lstm": convert_complex_lstm(sd, f"{p}.lstms.0", cfg.lstm_layers),
            "dense": convert_dense(sd, f"{p}.dense"),
            "decoder": dec_params,
        },
        "stats": {"encoder": enc_stats, "decoder": dec_stats},
    }


def import_discriminator(sd, cfg) -> dict:
    n = cfg.num_stages
    enc_params, enc_stats = convert_encoder_stack(sd, "encoders", n)
    return {
        "params": {
            "encoder": enc_params,
            "lstm": convert_real_lstm(sd, "lstms.0", cfg.lstm_layers),
        },
        "stats": {"encoder": enc_stats},
    }
