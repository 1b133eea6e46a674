"""Offline corpus spectrogram statistics (cal_mean_std equivalent).

Computes per-(freq-bin, re/im) mean and std over a corpus's STFT frames
and writes the reference's 257x2 whitespace text format
(dataset/cal_mean_std.py:51-103, loaded by train.py:505-511).

TPU-first shape discipline: framing/windowing happens on host (cheap,
variable length), frames accumulate into a fixed-size buffer, and a
single jitted fixed-shape rfft+reduce flushes each full buffer — one
compiled program regardless of file lengths (no retrace storm).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from idccrn_vae_tpu.data.audio_io import read_wav, trim_silence
from idccrn_vae_tpu.ops.stft import _padded_hann

_CHUNK = 4096  # frames per device flush


def _frames_of(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    pad = n_fft // 2
    x = np.pad(x, (pad, pad), mode="reflect")
    n = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[idx]


def corpus_mean_std(
    file_list: Sequence[str],
    n_fft: int = 512,
    hop: int = 100,
    win_length: int = 400,
    trim: bool = True,
    fs: int = 16000,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (mean, std), each (F, 2)."""
    f_bins = n_fft // 2 + 1
    window = _padded_hann(win_length, n_fft).astype(np.float32)

    @jax.jit
    def flush(frames, mask):
        spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
        s = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)  # (N,F,2)
        s = s * mask[:, None, None]
        return jnp.sum(s, axis=0), jnp.sum(s * s, axis=0)

    s1 = np.zeros((f_bins, 2), np.float64)
    s2 = np.zeros((f_bins, 2), np.float64)
    count = 0
    buf = np.zeros((_CHUNK, n_fft), np.float32)
    fill = 0

    def drain(n):
        nonlocal s1, s2, count
        mask = np.zeros(_CHUNK, np.float32)
        mask[:n] = 1.0
        a, b = flush(jnp.asarray(buf), jnp.asarray(mask))
        s1 += np.asarray(a, np.float64)
        s2 += np.asarray(b, np.float64)
        count += n

    for path in file_list:
        x, fs_x = read_wav(path)
        if x.ndim > 1:
            x = x[:, 0]
        if fs_x != fs:
            raise ValueError(f"unexpected fs {fs_x} for {path}")
        if trim:
            b, e = trim_silence(x, 30.0)
            x = x[b:e]
        if len(x) < n_fft:
            continue
        frames = _frames_of(x.astype(np.float32), n_fft, hop)
        i = 0
        while i < len(frames):
            take = min(_CHUNK - fill, len(frames) - i)
            buf[fill : fill + take] = frames[i : i + take]
            fill += take
            i += take
            if fill == _CHUNK:
                drain(_CHUNK)
                fill = 0
    if fill:
        buf[fill:] = 0.0
        drain(fill)

    if count == 0:
        # all files empty/too short after trimming: all-zero stats would
        # be silently written to disk and later blow up training through
        # the 1/(std+1e-6) datanorm — fail where the cause is visible
        raise ValueError(
            "corpus_mean_std accumulated 0 frames "
            f"({len(list(file_list))} files, n_fft={n_fft}, trim={trim})")
    mean = s1 / count
    var = s2 / count - mean**2
    std = np.sqrt(np.maximum(var, 0.0))
    return mean.astype(np.float32), std.astype(np.float32)


def save_stats_txt(path: str, arr: np.ndarray) -> None:
    np.savetxt(path, arr)


def load_stats_txt(mean_path: str, std_path: str):
    """Load the reference's 257x2 text files -> ((F,2), (F,2)) float32."""
    mean = np.loadtxt(mean_path).astype(np.float32)
    std = np.loadtxt(std_path).astype(np.float32)
    return mean, std
