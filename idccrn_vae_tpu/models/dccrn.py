"""Supervised DCCRN enhancement model (the reference baseline).

standard_DCCRN + DCCRN_ (pvae_module.py:96-255) as one class: STFT ->
(datanorm) -> conv encoder -> complex LSTM -> complex dense -> deconv
decoder with skip concat -> mask|real_imag recon -> ISTFT.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from idccrn_vae_tpu.models.backbone import apply_backbone, init_backbone
from idccrn_vae_tpu.models.config import DccrnConfig, bottleneck_dims
from idccrn_vae_tpu.models.modules import (
    apply_decoder_stack,
    init_decoder_stack,
    unflatten_bottleneck,
)
from idccrn_vae_tpu.models.vae import finish_reconstruction
from idccrn_vae_tpu.ops.dense import complex_dense, init_complex_dense


class SupervisedDccrn:
    def __init__(self, cfg: DccrnConfig,
                 datanorm: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None):
        self.cfg = cfg
        self.datanorm = datanorm

    def init(self, key, dtype=jnp.float32):
        cfg = self.cfg
        c, f = bottleneck_dims(cfg)
        k1, k2, k3 = jax.random.split(key, 3)
        params, stats = init_backbone(k1, cfg, cfg.lstm_hidden, dtype)
        params["dense"] = init_complex_dense(k2, cfg.lstm_hidden, c * f, dtype)
        dec_params, dec_stats = init_decoder_stack(k3, cfg, dtype)
        params["decoder"] = dec_params
        stats["decoder"] = dec_stats
        return {"params": params, "stats": stats}

    def apply(self, variables, wav, *, train: bool,
              return_latent: bool = False):
        """wav (B, L) -> ((clean (B, L'), predict_spec (B, F, T, 2)), stats').

        return_latent additionally returns the LSTM bottleneck features
        (B, T, 2H) — the reference's `self.latent` eval-time exposure
        used for latent covariance analysis (pvae_module.py:186-189,
        supervised_dccrn/test.py)."""
        cfg = self.cfg
        params, stats = variables["params"], variables["stats"]
        c, f = bottleneck_dims(cfg)
        lstm_out, skips, stft_x, new_stats = apply_backbone(
            params, stats, wav, cfg, train, datanorm=self.datanorm,
        )
        dense_out = complex_dense(
            lstm_out, params["dense"],
            compute_dtype=None if cfg.compute == "f32" else cfg.compute_dtype,
        )
        p = unflatten_bottleneck(dense_out, c, f)
        out, dec_stats = apply_decoder_stack(
            params["decoder"], stats["decoder"], p, skips, cfg, train,
            num_samples=1,
        )
        new_stats["decoder"] = dec_stats
        recon_sig, predict = finish_reconstruction(
            out, stft_x, cfg, 1, self.datanorm
        )
        if return_latent:
            return (recon_sig, predict, lstm_out), new_stats
        return (recon_sig, predict), new_stats

    def stft_clean(self, wav):
        """Raw target spectrogram (no datanorm) — the reference computes
        the supervised target via the bare STFT module while the model's
        prediction is de-normalized before the loss
        (supervised_dccrn/train.py:234, pvae_module.py:235-238)."""
        from idccrn_vae_tpu.ops.stft import stft

        s = self.cfg.stft
        return stft(wav, s.n_fft, s.hop, s.win_length)


class LegacyDccrn(SupervisedDccrn):
    """The reference's legacy polar-mask DCCRN (model/module.py:87-221).

    Dead code upstream — the supervised scripts import pvae_module's
    DCCRN_ instead (supervised_dccrn/train.py:22) — kept here for
    inventory completeness and old-checkpoint interop. Numerically the
    legacy model IS SupervisedDccrn pinned to the legacy choices:
    non-causal blocks, skip concat at EVERY decoder stage (the first
    "skip" being the bottleneck output itself, module.py:175-178),
    tanh-polar mask reconstruction (module.py:182-189 ==
    pvae_module.py:226-230 == modules.mask_reconstruct), no datanorm,
    no resynthesis; forward returns the waveform only (module.py:221).
    The dead 1x1 `linear` conv (module.py:143, never applied) holds
    torch parameters the importer drops
    (torch_import.import_legacy_dccrn). Parity vs the reference's own
    module.DCCRN_ is pinned in tests/test_oracle_legacy.py.
    """

    def __init__(self, cfg: DccrnConfig):
        cfg = dataclasses.replace(
            cfg,
            causal=False,
            recon_type="mask",
            skip_mode="real",
            skip_to_use=tuple(range(cfg.num_stages)),
        )
        super().__init__(cfg, datanorm=None)

    def apply(self, variables, wav, *, train: bool):  # type: ignore[override]
        """wav (B, L) -> (clean (B, L'), stats')."""
        (clean, _predict), stats = super().apply(variables, wav,
                                                 train=train)
        return clean, stats
