"""STFT/ISTFT parity vs torch.stft/torch.istft (the reference's oracle).

The reference delegates featurization to torch.stft/istft
(/root/reference/model/pvae_module.py:12-42); these tests pin our XLA
implementation to the same numerics.
"""

import numpy as np
import pytest
import torch

from idccrn_vae_tpu.ops.stft import stft, istft, hann_window

N_FFT, HOP, WIN = 512, 100, 400


def _torch_stft(x: np.ndarray) -> np.ndarray:
    window = torch.hann_window(WIN)
    out = torch.stft(
        torch.from_numpy(x), n_fft=N_FFT, hop_length=HOP, win_length=WIN,
        window=window, return_complex=True,
    )
    return torch.view_as_real(out).numpy()  # (B, F, T, 2)


def _torch_istft(spec: np.ndarray, length=None) -> np.ndarray:
    window = torch.hann_window(WIN)
    cplx = torch.complex(torch.from_numpy(spec[..., 0]),
                         torch.from_numpy(spec[..., 1]))
    return torch.istft(
        cplx, n_fft=N_FFT, hop_length=HOP, win_length=WIN, window=window,
        return_complex=False, length=length,
    ).numpy()


@pytest.mark.parametrize("seq_len", [48000, 16000, 7777])
def test_stft_matches_torch(seq_len):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, seq_len)).astype(np.float32)
    ours = np.asarray(stft(x, N_FFT, HOP, WIN))
    ref = _torch_stft(x)
    assert ours.shape == ref.shape
    assert ref.shape[1] == N_FFT // 2 + 1
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_stft_frame_count():
    # 3 s at 16 kHz with hop 100 -> 481 frames, like the reference's
    # sequence_len=481 dataset windows.
    x = np.zeros((1, 48000), np.float32)
    assert stft(x, N_FFT, HOP, WIN).shape == (1, 257, 481, 2)


@pytest.mark.parametrize("seq_len", [48000, 12345])
def test_istft_matches_torch(seq_len):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, seq_len)).astype(np.float32)
    spec = _torch_stft(x)
    ours = np.asarray(istft(spec, N_FFT, HOP, WIN))
    ref = _torch_istft(spec)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_roundtrip_reconstruction():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 48000)).astype(np.float32)
    y = np.asarray(istft(stft(x)))
    np.testing.assert_allclose(y[0], x[0, : y.shape[1]], atol=1e-4)


def test_window_matches_torch():
    ours = np.asarray(hann_window(WIN))
    ref = torch.hann_window(WIN).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_istft_length_beyond_coverage_yields_zeros():
    """length past the OLA envelope span must give torch-compatible
    zeros, not 0/0 NaNs (env == 0 there)."""
    from idccrn_vae_tpu.ops.stft import istft, stft

    x = np.random.default_rng(0).standard_normal(2000).astype(np.float32)
    spec = stft(x, 512, 100, 400)
    out = np.asarray(istft(spec, 512, 100, 400, length=2600))
    assert out.shape[-1] == 2600
    assert np.isfinite(out).all()
    assert np.allclose(out[..., -100:], 0.0)
