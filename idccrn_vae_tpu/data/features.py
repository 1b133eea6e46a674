"""Spectral feature helpers (dataset/featurelib_r.py equivalents).

The reference ships a numpy feature library (featurelib_r.py:7-202)
whose STFT/iSTFT path is vestigial (only `calcFeat` is imported and
never called); the feature types themselves (log-power, magnitude,
complex) are reproduced here against this framework's STFT for any
downstream tooling that wants framed features instead of waveforms.
"""

from __future__ import annotations

import numpy as np

from idccrn_vae_tpu.ops.stft import stft


def spec_features(
    x: np.ndarray,
    feattype: str = "LogPow",
    n_fft: int = 512,
    hop: int = 100,
    win_length: int = 400,
    min_gain_db: float = -80.0,
):
    """Framed features of a waveform.

    feattype: 'LogPow' (log power with a floor at min_gain_db under the
    peak), 'MagSpec' (linear magnitude), or 'Complex' ((F, T, 2)).
    Returns (F, T) or (F, T, 2).
    """
    spec = np.asarray(stft(np.asarray(x, np.float32)[None],
                           n_fft, hop, win_length))[0]  # (F, T, 2)
    if feattype == "Complex":
        return spec
    power = spec[..., 0] ** 2 + spec[..., 1] ** 2
    if feattype == "MagSpec":
        return np.sqrt(power)
    if feattype == "LogPow":
        p_min = power.max() * 10.0 ** (min_gain_db / 10.0)
        return 10.0 * np.log10(np.maximum(power, max(p_min, 1e-12)))
    raise ValueError(f"unknown feattype {feattype}")
