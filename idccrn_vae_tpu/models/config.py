"""Frozen model configuration spanning the reference's network zoo.

The reference hardcodes one geometry (net_config.py / causal_netconfig.py:
channels 1-32-64-128-128-256-256, kernels (5,2), strides (2,1), freq pad
2, time pad 0 non-causal / 1 causal) and then forks ~18 model classes
over {skip mode, latent head, latent count, channel mode, causality}.
Here those axes are fields on ONE immutable config; `encoder_plan` /
`decoder_plan` derive the exact per-stage channel plans, including the
`double` and `adapt` NSVAE channel modes (pvae_module.py:1236-1550 —
note the reference's adapt encoder mutates net_params in place; we
reproduce the *resulting* plan from an immutable config).
"""

from __future__ import annotations

import dataclasses
from typing import Literal, Tuple


@dataclasses.dataclass(frozen=True)
class StftConfig:
    n_fft: int = 512
    hop: int = 100
    win_length: int = 400
    fs: int = 16000

    @property
    def freq_bins(self) -> int:
        return self.n_fft // 2 + 1


@dataclasses.dataclass(frozen=True)
class DccrnConfig:
    stft: StftConfig = StftConfig()
    encoder_channels: Tuple[int, ...] = (1, 32, 64, 128, 128, 256, 256)
    kernel: Tuple[int, int] = (5, 2)
    stride: Tuple[int, int] = (2, 1)
    freq_pad: int = 2
    causal: bool = True
    lstm_layers: int = 2
    # standard-DCCRN bottleneck width (net_config.py "lstm_dim"/"dense");
    # VAE models override with zdim-derived sizes.
    lstm_hidden: int = 128
    zdim: int = 128
    num_samples: int = 5
    # decoder stages receiving skip connections (reference skip_to_use)
    skip_to_use: Tuple[int, ...] = (0, 1, 2, 3, 4, 5)
    # 'sliced': LSTM emits 3*zdim (or 6*zdim) complex, sliced into
    #   (mu, log_sigma, delta) — pvae_dccrn_encoder family.
    # 'fc': LSTM emits zdim; separate ComplexDense heads per moment —
    #   *_fc_latent family.
    latent: Literal["sliced", "fc"] = "sliced"
    latent_num: int = 1
    # 'normal' | 'double' (all channels x2, skips split speech/noise) |
    # 'adapt' (x2 only at stages feeding skip_to_use) — NSVAE encoders.
    channel_mode: Literal["normal", "double", "adapt"] = "normal"
    # decoder skip handling:
    # 'real'  — concat true encoder skips (pvae_dccrn_decoder)
    # 'none'  — no skip path at all (…_no_skip)
    # 'zero'  — declare skip channels but concat zeros ("spadd",
    #           …_skip_prepare; phase-2 decoder with pad='zero')
    # 'prob'  — p=0.5 real vs zeros at train time (…_prob_skip)
    # 'runtime' — twophase decoder: pad mode chosen per call ('zero'|'sig')
    skip_mode: Literal["real", "none", "zero", "prob", "runtime"] = "real"
    # for skip_mode='prob': when the per-forward coin says "no real
    # skips", 1 concatenates zeros, 2 duplicates the running feature map
    # (pvae_module.py:1691-1694, 1753-1758).
    skip_prob: int = 1
    recon_type: Literal["mask", "real_imag"] = "real_imag"
    resynthesis: bool = False
    # 'f32' | 'bf16' | 'int8': dtype for conv/LSTM/dense compute (MXU
    # path). Parameters, BN statistics, STFT/ISTFT, and the latent head
    # math stay fp32; bf16 roughly doubles MXU throughput on v5e.
    # 'int8' is a SERVING-ONLY mode (trainers reject it — rounding has
    # no useful gradient): convs with min(Cin, Cout) >= quant_min_ch
    # run as int8 MXU ops (dynamic per-tensor activation scale,
    # per-output-channel weight scales, int32 accumulation); everything
    # else runs exactly as 'bf16'. MEASURED VERDICT (v5e, bench.py +
    # INT8_PROBE.json, r4): end-to-end PARITY at best — see quant_scope
    # below. Kept (small, tested, numerically pinned) for hardware
    # generations where the int8 path pays.
    compute: Literal["f32", "bf16", "int8"] = "f32"
    # int8 mode: stages narrower than this on either side keep bf16
    # (the first encoder conv sees the raw un-normalized spectrum whose
    # dynamic range a per-tensor int8 scale cannot cover, and edge
    # stages carry negligible FLOPs anyway).
    quant_min_ch: int = 16
    # int8 mode scope. MEASURED (INT8_PROBE.json + bench.py, v5e): int8
    # wins 1.63x on REGULAR convs (encoder) but only reaches PARITY on
    # the lhs-dilated transposed convs (decoder) — XLA's bf16 dilated
    # lowering already skips the inserted zeros (162 useful-TOPS, near
    # bf16 peak), and its int8 lowering has no faster path — while the
    # dynamic quantize/dequant adds ~2 ms of HBM passes per stage.
    # End-to-end RTFx: bf16 2006x, int8 scope='enc' 1996x (parity),
    # scope='all' 1858x (-7%). 'enc' stays the default scope so the
    # mode is never worse than parity where int8 hardware pays more.
    quant_scope: Literal["enc", "all"] = "enc"
    # rematerialize each conv/deconv stage in the backward pass
    # (jax.checkpoint): trades ~1 extra forward of FLOPs for dropping
    # the stage activations from HBM — raises the trainable batch size.
    remat: bool = False

    @property
    def compute_dtype(self):
        """Operand dtype for non-quantized MXU ops (LSTM/dense, and the
        convs int8 mode leaves un-quantized): int8 mode rides bf16."""
        import jax.numpy as jnp

        return (jnp.bfloat16 if self.compute in ("bf16", "int8")
                else jnp.float32)

    @property
    def conv_quant(self) -> bool:
        return self.compute == "int8"

    def reject_int8_training(self, who: str) -> None:
        """Trainers call this: int8 is serving-only (activation/weight
        rounding has no useful gradient, and a train-mode forward would
        silently fall back to bf16 while validation quantized)."""
        if self.compute == "int8":
            raise ValueError(
                f"{who}: compute='int8' is a serving-only mode — train "
                "with 'bf16' (or 'f32') and pass --compute int8 at "
                "evaluation/serving time instead.")

    @property
    def num_stages(self) -> int:
        return len(self.encoder_channels) - 1

    @property
    def decoder_channels(self) -> Tuple[int, ...]:
        return tuple(reversed(self.encoder_channels[1:])) + (1,)


def encoder_plan(cfg: DccrnConfig) -> Tuple[Tuple[int, int], ...]:
    """Per-stage (in_ch, out_ch) for the encoder, honoring channel_mode.

    double: every conv channel count x2 except the 1-channel input
    (pvae_module.py:1255-1261). adapt: stage i doubled iff decoder index
    (num_stages-1-i) is in skip_to_use (pvae_module.py:1410-1413).
    """
    ch = list(cfg.encoder_channels)
    n = cfg.num_stages
    if cfg.channel_mode == "double":
        ch = [ch[0]] + [2 * c for c in ch[1:]]
    elif cfg.channel_mode == "adapt":
        ch = list(ch)
        for i in range(1, n + 1):
            # stage (i-1) output feeds decoder index n - i
            if (n - i) in cfg.skip_to_use:
                ch[i] = 2 * ch[i]
    return tuple((ch[i], ch[i + 1]) for i in range(n))


def decoder_plan(cfg: DccrnConfig) -> Tuple[Tuple[int, int], ...]:
    """Per-stage (in_ch, out_ch) for the decoder including skip concat.

    Skip concat at stage i adds the *pretrain-geometry* encoder channel
    count encoder_channels[n - i] (pvae_module.py:419-423) — the
    NSVAE double/adapt widths only affect the noisy encoder, whose skips
    are split back to nominal width before decoding.
    """
    de = cfg.decoder_channels
    en = cfg.encoder_channels
    n = cfg.num_stages
    plan = []
    for i in range(n):
        in_ch = de[i]
        if cfg.skip_mode != "none" and i in cfg.skip_to_use:
            in_ch += en[n - i]
        plan.append((in_ch, de[i + 1]))
    return tuple(plan)


def freq_sizes(cfg: DccrnConfig) -> Tuple[int, ...]:
    """Frequency-bin count after each encoder stage (257→129→…→5)."""
    f = cfg.stft.freq_bins
    sizes = []
    for _ in range(cfg.num_stages):
        f = (f + 2 * cfg.freq_pad - cfg.kernel[0]) // cfg.stride[0] + 1
        sizes.append(f)
    return tuple(sizes)


def bottleneck_dims(cfg: DccrnConfig) -> Tuple[int, int]:
    """(C, F) at the bottleneck; C*F is the LSTM input width (1280)."""
    plan = encoder_plan(cfg)
    return plan[-1][1], freq_sizes(cfg)[-1]
