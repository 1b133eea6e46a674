"""Harness for parity tests against the reference's OWN torch modules.

Round-1 golden tests re-implemented the oracle by hand; these helpers
instead import /root/reference/model/pvae_module.py directly (torch CPU
is in the image), instantiate the real classes at tiny geometry, run a
train-mode warmup to populate the ComplexBatchNormal running buffers
(init_flag first-batch copy, complex_progress.py:144-159), and export
the live state_dict for our torch-import mapping. Eval-mode forwards
are then compared bit-for-bit-ish (fp32, atol 1e-4).

Tiny geometry: n_fft=32 (F=17), 2 conv stages (1->2->4), zdim=2,
num_samples=2 — every architectural quirk exercised, compiles in
seconds on CPU.
"""

from __future__ import annotations

import dataclasses
import sys

import numpy as np

REF_ROOT = "/root/reference"

N_FFT, HOP, WIN = 32, 8, 16
CHANNELS = (1, 2, 4)
ZDIM = 2
NS = 2  # num_samples
B, L = 2, 160  # -> T = 21 frames (torch.stft center=True)


def ref_models():
    """Import the reference model package (namespace package)."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from model import pvae_module  # noqa: PLC0415

    return pvae_module


def freq_plan(channels=CHANNELS, f0=N_FFT // 2 + 1):
    """Per-stage freq sizes for kernel 5 / stride 2 / pad 2."""
    fs, f = [], f0
    for _ in range(len(channels) - 1):
        f = (f + 4 - 5) // 2 + 1
        fs.append(f)
    return fs


def tiny_net_params(causal: bool, channels=CHANNELS, zdim=ZDIM,
                    lstm_hidden=None):
    """net_config.get_net_params()-shaped dict at tiny geometry.

    lstm_hidden: for the supervised standard_DCCRN, whose LSTM width is
    lstm_dim[1] and dense is (lstm_dim[1] -> C*F) (pvae_module.py:
    101-103, 125-128); VAE models ignore these and derive from zdim.
    Callers pass a fresh dict per model (the adapt encoder mutates it
    in place).
    """
    n = len(channels) - 1
    fs = freq_plan(channels)
    ch = list(channels)
    de = list(reversed(channels[1:])) + [1]
    cf = channels[-1] * fs[-1]
    h = lstm_hidden if lstm_hidden is not None else 3 * zdim
    return {
        "encoder_channels": ch,
        "encoder_kernel_sizes": [(5, 2)] * n,
        "encoder_strides": [(2, 1)] * n,
        "encoder_paddings": [(2, 1) if causal else (2, 0)] * n,
        "lstm_dim": [cf, h],
        "dense": [h, cf] if lstm_hidden is not None else [zdim, cf],
        "lstm_layer_num": 2,
        "decoder_channels": de,
        "decoder_kernel_sizes": [(5, 2)] * n,
        "decoder_strides": [(2, 1)] * n,
        "decoder_paddings": [(2, 0)] * n,
        "encoder_chw": [(ch[i + 1], fs[i], 0) for i in range(n)],
        "decoder_chw": [(de[i + 1], 0, 0) for i in range(n)],
    }


def our_cfg(causal: bool, **over):
    from idccrn_vae_tpu.models.config import DccrnConfig, StftConfig

    base = DccrnConfig(
        stft=StftConfig(n_fft=N_FFT, hop=HOP, win_length=WIN),
        encoder_channels=CHANNELS,
        zdim=ZDIM,
        num_samples=NS,
        causal=causal,
        skip_to_use=tuple(range(len(CHANNELS) - 1)),
        lstm_hidden=ZDIM,
    )
    return dataclasses.replace(base, **over)


def sd_numpy(module) -> dict:
    return {k: v.detach().cpu().numpy().copy()
            for k, v in module.state_dict().items()}


def wav_batch(seed=0, b=B, n=L):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, n)).astype(np.float32) * 0.1


def t2np(x):
    return x.detach().cpu().numpy()


def tstack_to_cpack(x):
    """torch (..., re/im 2) stacked-last -> cpack concat-last numpy."""
    a = t2np(x)
    return np.concatenate([a[..., 0], a[..., 1]], axis=-1)


def map_to_cpack(x):
    """torch feature map (B, C, F, T, 2) -> cpack (B, F, T, 2C)."""
    a = t2np(x)
    re = np.transpose(a[..., 0], (0, 2, 3, 1))
    im = np.transpose(a[..., 1], (0, 2, 3, 1))
    return np.concatenate([re, im], axis=-1)


def complex_to_ri(x):
    """torch complex (B, F, T) -> numpy (B, F, T, 2)."""
    a = t2np(x)
    return np.stack([a.real, a.imag], axis=-1)


def assert_close(ours, theirs, atol=1e-4, rtol=1e-4, what=""):
    ours = np.asarray(ours, np.float64)
    theirs = np.asarray(theirs, np.float64)
    assert ours.shape == theirs.shape, (
        f"{what}: shape {ours.shape} vs {theirs.shape}")
    np.testing.assert_allclose(ours, theirs, atol=atol, rtol=rtol,
                               err_msg=what)
