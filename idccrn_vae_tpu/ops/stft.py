"""STFT / ISTFT with torch.stft/istft-compatible semantics, in pure XLA.

The reference featurizes with ``torch.stft(n_fft=512, hop=100,
win_length=400, window=hann, center=True)`` and inverts with
``torch.istft`` (see /root/reference/model/pvae_module.py:12-42). Metric
parity (PESQ drifts if the OLA normalization is off) requires matching:

  * center=True reflect padding of n_fft//2 samples on both sides,
  * the win_length=400 Hann window zero-padded centered to n_fft=512,
  * frame count ``1 + L // hop`` for L a hop multiple,
  * ISTFT overlap-add divided by the squared-window envelope, then the
    center padding trimmed so the output length is ``(T - 1) * hop``.

TPU notes: framing is a gather (HBM-bandwidth bound, trivially fused);
the DFT runs through XLA's rfft. Everything is jit-compatible with
static shapes.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _padded_hann(win_length: int, n_fft: int) -> np.ndarray:
    """Periodic Hann of win_length, zero-padded centered to n_fft.

    Matches torch.hann_window(win_length) (periodic=True) and
    torch.stft's centered zero-padding of the window to n_fft.
    """
    n = np.arange(win_length)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    left = (n_fft - win_length) // 2
    out = np.zeros(n_fft, dtype=np.float64)
    out[left : left + win_length] = w
    return out


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (torch.hann_window equivalent)."""
    n = np.arange(win_length)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    return jnp.asarray(w, dtype=dtype)


def frame_signal(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Center-pad (reflect) and slice into overlapping frames.

    Args:
      x: (..., L) time signal.
    Returns:
      (..., T, n_fft) frames with T = 1 + L // hop.
    """
    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    length = x.shape[-1]
    num_frames = 1 + (length - n_fft) // hop
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[..., idx]


def stft(
    signal: jnp.ndarray,
    n_fft: int = 512,
    hop: int = 100,
    win_length: int = 400,
) -> jnp.ndarray:
    """torch.stft-compatible STFT.

    Args:
      signal: (B, L) or (L,) waveform.
    Returns:
      (B, F, T, 2) with F = n_fft//2 + 1 — the reference's
      view_as_real layout (pvae_module.py:21-27). Model code converts to
      cpack with `ops.complex.pair_to_cpack` where needed.
    """
    squeeze = signal.ndim == 1
    if squeeze:
        signal = signal[None]
    window = jnp.asarray(_padded_hann(win_length, n_fft), dtype=signal.dtype)
    frames = frame_signal(signal, n_fft, hop) * window  # (B, T, n_fft)
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # (B, T, F) complex
    out = jnp.stack(
        [jnp.real(spec), jnp.imag(spec)], axis=-1
    ).astype(signal.dtype)  # (B, T, F, 2)
    out = jnp.swapaxes(out, 1, 2)  # (B, F, T, 2)
    if squeeze:
        out = out[0]
    return out


def istft(
    spec: jnp.ndarray,
    n_fft: int = 512,
    hop: int = 100,
    win_length: int = 400,
    length: int | None = None,
) -> jnp.ndarray:
    """torch.istft-compatible inverse STFT with OLA normalization.

    Args:
      spec: (B, F, T, 2) real/imag stacked (or (F, T, 2)).
      length: output length; defaults to (T - 1) * hop like torch.
    Returns:
      (B, length) waveform.
    """
    squeeze = spec.ndim == 3
    if squeeze:
        spec = spec[None]
    dtype = spec.dtype
    b, f, t, _ = spec.shape
    window = jnp.asarray(_padded_hann(win_length, n_fft), dtype=dtype)

    cplx = jnp.swapaxes(spec[..., 0] + 1j * spec[..., 1], 1, 2)  # (B, T, F)
    frames = jnp.fft.irfft(cplx, n=n_fft, axis=-1).astype(dtype)  # (B, T, n_fft)
    frames = frames * window

    pad = n_fft // 2
    if length is None:
        length = (t - 1) * hop
    full = length + 2 * pad

    idx = np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]  # (T, n_fft)
    flat_idx = jnp.asarray(idx.reshape(-1))
    sig = jnp.zeros((b, full), dtype=dtype)
    sig = sig.at[:, flat_idx].add(frames.reshape(b, -1), mode="drop")

    env = jnp.zeros((full,), dtype=dtype)
    env = env.at[flat_idx].add(
        jnp.broadcast_to(window * window, (t, n_fft)).reshape(-1), mode="drop"
    )

    sig = sig[:, pad : pad + length]
    env = env[pad : pad + length]
    # positions past the last frame's windowed span have env == 0 (and
    # sig == 0); the clamp yields torch.istft-compatible zeros there
    # instead of 0/0 NaNs when length exceeds the OLA coverage
    out = sig / jnp.maximum(env, 1e-11)
    if squeeze:
        out = out[0]
    return out
