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


def test_onnx_parser_reads_dnsmos_graphs():
    """The native ONNX executor parses the bundled model files into the
    expected graph structure."""
    from idccrn_vae_tpu.eval.dnsmos import default_model_paths
    from idccrn_vae_tpu.eval.onnx_exec import parse_model

    primary, p808 = default_model_paths(False)
    nodes, inits, ins, outs = parse_model(primary)
    assert ins == ["input_1"] and outs == ["Identity:0"]
    assert len(nodes) == 48 and len(inits) == 35
    ops = {n.op for n in nodes}
    assert {"Conv", "MatMul", "Relu", "MaxPool", "Slice"} <= ops
    # weights parse to real arrays
    conv_w = [v for k, v in inits.items() if v.ndim == 4]
    assert conv_w and all(np.isfinite(w).all() for w in conv_w)


def test_onnx_exec_op_primitives():
    """Unit-check the executor's Conv/MaxPool/Slice against numpy."""
    from idccrn_vae_tpu.eval.onnx_exec import _conv, _maxpool, _slice

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 2, 6, 5)).astype(np.float32)
    w = rng.standard_normal((3, 2, 3, 3)).astype(np.float32)
    b = rng.standard_normal(3).astype(np.float32)
    out = _conv(x, w, b, {"pads": [1, 1, 1, 1], "strides": [2, 1]})
    assert out.shape == (1, 3, 3, 5)
    # reference value at one location by direct summation
    xp = np.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1)])
    want = (xp[0, :, 2:5, 1:4] * w[1]).sum() + b[1]
    assert out[0, 1, 1, 1] == pytest.approx(want, rel=1e-5)

    mp = _maxpool(x, {"kernel_shape": [2, 2], "strides": [2, 2]})
    assert mp.shape == (1, 2, 3, 2)
    assert mp[0, 0, 0, 0] == x[0, 0, :2, :2].max()

    sl = _slice(x, starts=[1], ends=[2**63 - 1], axes=[2], steps=[2])
    np.testing.assert_array_equal(sl, x[:, :, 1::2])


def test_conv_torch_fast_path_matches_numpy_oracle():
    """The torch (oneDNN) Conv fast path must agree with the numpy
    reference implementation across the attribute space the ONNX models
    can use: strides, dilations, ASYMMETRIC pads, bias/no-bias, 1-D."""
    from idccrn_vae_tpu.eval.onnx_exec import _conv_numpy, _conv_torch, _torch

    if _torch is None:
        pytest.skip("torch unavailable")
    rng = np.random.default_rng(7)
    cases = [
        # (x_shape, w_shape, attrs)
        ((2, 3, 9, 8), (4, 3, 3, 3), {"pads": [1, 1, 1, 1]}),
        ((1, 2, 10, 7), (3, 2, 3, 2), {"strides": [2, 3],
                                       "pads": [0, 1, 2, 0]}),
        ((1, 4, 12, 6), (2, 4, 3, 3), {"dilations": [2, 1],
                                       "pads": [2, 1, 2, 1]}),
        ((2, 3, 20), (5, 3, 4), {"strides": [2], "pads": [1, 2]}),  # 1-D
    ]
    for xs, ws, attrs in cases:
        x = rng.standard_normal(xs).astype(np.float32)
        w = rng.standard_normal(ws).astype(np.float32)
        for b in (None, rng.standard_normal(ws[0]).astype(np.float32)):
            ref = _conv_numpy(x, w, b, attrs)
            got = _conv_torch(x, w, b, attrs)
            assert got.shape == ref.shape and got.dtype == np.float32
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_dnsmos_end_to_end_native():
    """Full DNSMOS scoring in THIS image (no onnxruntime): bundled
    models through the native executor, melspec features, polynomial
    mapping. Golden-pinned (AM tone + noise, seed 42)."""
    from idccrn_vae_tpu.eval.dnsmos import ComputeScore, default_model_paths

    rng = np.random.default_rng(42)
    fs = 16000
    t = np.arange(int(9.01 * fs)) / fs
    sig = (0.4 * np.sin(2 * np.pi * 300 * t)
           * (1 + 0.8 * np.sin(2 * np.pi * 2 * t))
           + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    scorer = ComputeScore(*default_model_paths(False))
    out = scorer.score_array(sig, fs)
    assert out["num_hops"] == 1
    assert out["OVRL_raw"] == pytest.approx(1.612839, abs=1e-4)
    assert out["SIG_raw"] == pytest.approx(1.693456, abs=1e-4)
    assert out["BAK_raw"] == pytest.approx(2.387266, abs=1e-4)
    assert out["P808_MOS"] == pytest.approx(2.182581, abs=1e-4)
    for k in ("OVRL", "SIG", "BAK"):
        assert 1.0 <= out[k] <= 5.0


# ---------------------------------------------------------------------------
# numeric goldens for the native librosa-equivalent melspec (VERDICT r1 #10)
# ---------------------------------------------------------------------------


def test_slaney_mel_scale_anchors():
    """Exact anchor points of the slaney mel scale (librosa htk=False):
    the linear/log break at 1000 Hz <-> 15 mel, slope 200/3 Hz per mel
    below it, and log spacing ln(6.4)/27 above it."""
    from idccrn_vae_tpu.eval.dnsmos import _hz_to_mel, _mel_to_hz

    assert float(_hz_to_mel(1000.0)) == pytest.approx(15.0, abs=1e-12)
    assert float(_mel_to_hz(15.0)) == pytest.approx(1000.0, abs=1e-9)
    assert float(_hz_to_mel(200.0 / 3)) == pytest.approx(1.0, abs=1e-12)
    assert float(_mel_to_hz(15.0 + 27.0)) == pytest.approx(6400.0, rel=1e-9)
    # roundtrip
    f = np.linspace(0, 8000, 101)
    np.testing.assert_allclose(_mel_to_hz(_hz_to_mel(f)), f, atol=1e-6)


def test_mel_filterbank_numeric_goldens():
    """Pin the DNSMOS-geometry filterbank (sr=16k, n_fft=321, 120 mels)
    numerically: total mass, the exact support + weights of band 60,
    slaney area normalization, and the empty low bands that librosa
    also produces at this (sub-bin mel spacing) geometry."""
    from idccrn_vae_tpu.eval.dnsmos import mel_filterbank

    fb = mel_filterbank(16000, 321, 120)
    assert fb.shape == (120, 161)
    assert float(fb.sum()) == pytest.approx(2.3899003830, abs=1e-9)
    nz = np.nonzero(fb[60])[0]
    np.testing.assert_array_equal(nz, [34, 35])
    assert fb[60, 34] == pytest.approx(0.0171017313, abs=1e-9)
    assert fb[60, 35] == pytest.approx(0.0027093462, abs=1e-9)
    # slaney normalization: each non-empty triangle integrates to ~area
    # bounded by 2/base * base/2 = 1 x discretization error
    df = 8000.0 / 160
    areas = fb.sum(axis=1) * df
    assert areas.max() <= 2.0
    # DNSMOS's n_fft=321 makes the first band (peak ~25 Hz) narrower
    # than the 49.8 Hz bin grid -> band 0 is empty, as librosa warns
    np.testing.assert_array_equal(np.nonzero(fb.sum(axis=1) == 0)[0], [0])


def test_audio_melspec_numeric_goldens():
    """Recorded goldens for the full melspec feature path (the P.808
    model input): 1 s of 440 Hz + noise, seed 3."""
    from idccrn_vae_tpu.eval.dnsmos import audio_melspec

    rng = np.random.default_rng(3)
    t = np.arange(16000) / 16000
    sig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(
        len(t))
    m = audio_melspec(sig)
    assert m.shape == (100, 120) and m.dtype == np.float32
    # power_to_db(ref=max): the max of the normalized output is exactly
    # (0 + 40) / 40 = 1.0
    assert float(m.max()) == pytest.approx(1.0, abs=1e-6)
    assert float(np.abs(m).sum()) == pytest.approx(2157.908203, rel=1e-5)
    np.testing.assert_allclose(
        m[0, :3], [-1.0, 0.41788393, -0.14218053], atol=1e-6)
    np.testing.assert_allclose(
        m[50, 40:43], [-0.01792842, 0.32763714, 0.08502478], atol=1e-6)
    raw = audio_melspec(sig, to_db=False)
    assert float(raw.sum()) == pytest.approx(9872.28417969, rel=1e-6)
    assert float(raw[10, 20]) == pytest.approx(0.4651077986, rel=1e-6)


def test_empty_audio_raises_not_hangs():
    """np.append(empty, empty) never grows — score_array must reject
    zero-length audio instead of looping forever."""
    from idccrn_vae_tpu.eval.dnsmos import ComputeScore, default_model_paths

    primary, p808 = default_model_paths()
    scorer = ComputeScore(primary, p808)
    with pytest.raises(ValueError, match="empty audio"):
        scorer.score_array(np.zeros(0, np.float32), 16000)
