"""DNSMOS feature pipeline tests (ONNX inference itself is gated on
onnxruntime, absent in this image — the scorer raises informatively)."""

import numpy as np
import pytest

from idccrn_vae_tpu.eval.dnsmos import (
    ComputeScore,
    _POLY,
    audio_melspec,
    mel_filterbank,
)


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(16000, 321, 120)
    assert fb.shape == (120, 161)
    # filters have mass (the first triangle can fall between the coarse
    # 50 Hz bins — librosa produces the same empty filter there)
    assert (fb.sum(axis=1)[1:] > 0).all()
    covered = fb.sum(axis=0)
    assert (covered[3:-3] > 0).all()


def test_audio_melspec_shape():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(16000 * 9).astype(np.float32) * 0.1
    mel = audio_melspec(x)
    # hop 160, odd n_fft=321 centered -> 1 + (L + 320 - 321)//160 = 900
    assert mel.shape == (900, 120)
    # dB mapping (x+40)/40 with ref=max -> values in [-1, 1]
    assert mel.max() <= 1.0 + 1e-6
    assert mel.min() >= -1.0 - 1e-6


def test_polynomial_mapping_values():
    # sanity: raw score 3.0 maps into a plausible MOS range
    for personalized in (False, True):
        for key in ("sig", "bak", "ovr"):
            val = np.polyval(_POLY[personalized][key], 3.0)
            assert 1.0 < val < 5.0


def test_scorer_requires_onnxruntime():
    try:
        import onnxruntime  # noqa: F401

        pytest.skip("onnxruntime installed; gating not exercised")
    except ImportError:
        pass
    with pytest.raises((ImportError, Exception)):
        ComputeScore("missing.onnx", "missing.onnx")
