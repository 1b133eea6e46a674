"""Convert a reference PyTorch checkpoint into this framework's format.

Takes a reference .pt state_dict (pvae encoder/decoder, NSVAE encoder,
or supervised DCCRN_) plus the architecture flags the reference encodes
in its directory names, and writes a CheckpointManager directory
(meta.json + orbax 'best') that every CLI here consumes directly.

Example:
  python -m idccrn_vae_tpu.cli.convert_torch \\
      --kind vae --encoder complex_CVAE_encoder_best_epoch.pt \\
      --decoder complex_CVAE_decoder_best_epoch.pt \\
      --out /ckpts/cvae --causal --zdim 128 --skip_padding
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import asdict

from idccrn_vae_tpu.models import torch_import as ti
from idccrn_vae_tpu.models.config import DccrnConfig, StftConfig
from idccrn_vae_tpu.train.checkpoint import CheckpointManager


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kind", required=True,
                   choices=["vae", "nsvae_encoder", "supervised"])
    p.add_argument("--encoder", type=str, default=None,
                   help=".pt for the encoder (vae/nsvae) or the full "
                        "model (supervised)")
    p.add_argument("--decoder", type=str, default=None,
                   help=".pt for the decoder (vae kind)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--model_name", type=str, default="converted")
    # architecture flags (the reference parses these from dir names)
    p.add_argument("--causal", action="store_true")
    p.add_argument("--zdim", type=int, default=128)
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--skipc", action="store_true")
    p.add_argument("--skip_padding", action="store_true")
    p.add_argument("--fclatent", action="store_true")
    p.add_argument("--skip_to_use", type=str, default="012345")
    p.add_argument("--latent_num", type=int, default=1)
    p.add_argument("--nsvae_model", type=str, default="original",
                   choices=["original", "double", "adapt"])
    p.add_argument("--recon_type", type=str, default="real_imag")
    p.add_argument("--encoder_dim_start", type=int, default=32)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    d = args.encoder_dim_start
    skip_mode = ("real" if args.skipc
                 else "zero" if args.skip_padding else "none")
    cfg = DccrnConfig(
        stft=StftConfig(),
        encoder_channels=(1, d, 2 * d, 4 * d, 4 * d, 8 * d, 8 * d),
        causal=args.causal,
        zdim=args.zdim,
        num_samples=args.num_samples,
        skip_to_use=tuple(int(c) for c in args.skip_to_use),
        latent="fc" if args.fclatent else "sliced",
        latent_num=args.latent_num,
        channel_mode={"original": "normal", "double": "double",
                      "adapt": "adapt"}[args.nsvae_model],
        skip_mode=skip_mode,
        recon_type=args.recon_type,
    )
    ckpt = CheckpointManager(args.out)
    if args.kind == "vae":
        best = {}
        if args.encoder:
            best["enc"] = ti.import_vae_encoder(
                ti.load_state_dict(args.encoder), cfg)
        if args.decoder:
            best["dec"] = ti.import_vae_decoder(
                ti.load_state_dict(args.decoder), cfg)
        ckpt.save_best(best)
        ckpt.save_meta({"model_name": args.model_name, "config": asdict(cfg),
                        "epoch": -1, "best_val": float("nan"), "patience": 0,
                        "sched_en": {"best": float("inf"), "num_bad": 0},
                        "sched_de": {"best": float("inf"), "num_bad": 0},
                        "converted_from": [args.encoder, args.decoder]})
    elif args.kind == "nsvae_encoder":
        best = {"noisy_enc": ti.import_nsvae_encoder(
            ti.load_state_dict(args.encoder), cfg)}
        ckpt.save_best(best)
        # pre_config is the PRETRAIN geometry the phase-1 decoder was
        # trained at (load_enhancement_checkpoints builds VaeDecoder
        # from it): single latent, nominal channels — NOT the noisy
        # encoder's double/adapt dual-latent config.
        pre_cfg = dataclasses.replace(cfg, latent_num=1,
                                      channel_mode="normal")
        ckpt.save_meta({"model_name": args.model_name,
                        "noisy_config": asdict(cfg),
                        "pre_config": asdict(pre_cfg),
                        "epoch": -1, "best_val": float("nan"), "patience": 0,
                        "sched": {"best": float("inf"), "num_bad": 0},
                        "converted_from": [args.encoder]})
    else:  # supervised
        variables = ti.import_supervised_dccrn(
            ti.load_state_dict(args.encoder), cfg)
        ckpt.save_best(variables)
        ckpt.save_meta({"model_name": args.model_name, "config": asdict(cfg),
                        "epoch": -1, "best_val": float("nan"), "patience": 0,
                        "sched": {"best": float("inf"), "num_bad": 0},
                        "converted_from": [args.encoder]})
    print(f"converted -> {args.out}")


if __name__ == "__main__":
    main()
