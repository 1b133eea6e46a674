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

With --from_dirname the architecture is auto-parsed from the
reference's save-directory naming scheme (the reference reconstructs
models this way: train_nsvae.py:94-121, test_nsvae_se.py:668-727), so
a reference checkpoint tree converts with zero manual flags:

  python -m idccrn_vae_tpu.cli.convert_torch --kind vae \\
      --encoder .../2024-05-01_complex_CVAE_causal=True_zdim=128_\\
numsamples=1_klw=0.010_miw=0_skipc=False_skipuse=[0, 1, 2, 3, 4, 5]_\\
spadd=True_recon=real_reconweight=1_prior=normal/..._encoder.pt \\
      --out /ckpts/cvae --from_dirname

Explicit flags still override anything parsed.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from dataclasses import asdict

from idccrn_vae_tpu.models import torch_import as ti
from idccrn_vae_tpu.models.config import DccrnConfig, StftConfig
from idccrn_vae_tpu.train.checkpoint import CheckpointManager


def parse_pretrain_dirname(name: str) -> dict:
    """Parse a pretrained-VAE save-dir NAME (one path component) into
    convert-flag values, replicating the reference's token grammar
    (test_nsvae_se.py:668-700; the name format is pretrained_vaes/
    train.py:148-149: ..._causal={}_zdim={}_numsamples={}_klw={}_miw={}
    _skipc={}_skipuse={list}_spadd={}_recon={}_...). Substring-match
    semantics (`'skipc' in s`) and the 'real'->'real_imag' recon alias
    are kept exactly; defaults match the reference's pre-loop defaults.
    """
    out = {"skip_to_use": "012345", "causal": False, "skip_padding": False,
           "fclatent": False, "skipc": False, "recon_type": "real_imag"}
    for s in name.split("_"):
        if "skipc" in s:
            out["skipc"] = s.split("=")[-1] == "True"
        elif "skipuse" in s:
            nums = s.split("=")[-1][1:-1].split(", ")
            out["skip_to_use"] = "".join(nums)
        elif "recon=" in s:
            recon = s.split("=")[-1]
            out["recon_type"] = "real_imag" if recon == "real" else recon
        elif "causal=" in s:
            out["causal"] = s.split("=")[-1].lower() == "true"
        elif "spadd" in s:
            out["skip_padding"] = s.split("=")[-1].lower() == "true"
        elif "fcl=" in s:
            out["fclatent"] = s.split("=")[-1].lower() == "true"
        elif "zdim" in s:
            out["zdim"] = int(s.split("=")[-1])
        elif "numsamples" in s:
            out["num_samples"] = int(s.split("=")[-1])
    return out


def parse_nsvae_dirname(name: str) -> dict:
    """Parse an NSVAE save-dir NAME (train_nsvae.py:231 format:
    ..._causal={}_zdim={}_alpha={}_wresi={}_wkl={}_wdismiu={}_
    numsamples={}_nsvae={}_latentnum={}_match={}) exactly as
    test_nsvae_se.py:705-727 does, plus the causal/numsamples tokens
    the reference takes from elsewhere (its test config points back at
    the pretrain dir for those; the tokens carry the same values, so
    parsing them here lets a lone NSVAE dir convert standalone).
    Non-architecture tokens (alpha/wresi/wkl/wdismiu/match) are
    returned under 'loss_params' for the meta record only."""
    out = {"loss_params": {"matching": "speech", "w_resi": 0.0}}
    for s in name.split("_"):
        if "zdim" in s:
            out["zdim"] = int(s.split("=")[-1])
        elif "wresi" in s:
            out["loss_params"]["w_resi"] = float(s.split("=")[-1])
        elif "nsvae=" in s:
            out["nsvae_model"] = s.split("=")[-1]
        elif "latentnum" in s:
            out["latent_num"] = int(s.split("=")[-1])
        elif "match" in s:
            out["loss_params"]["matching"] = s.split("=")[-1]
        elif "alpha" in s:
            out["loss_params"]["alpha"] = float(s.split("=")[-1])
        elif "causal" in s:
            out["causal"] = s.split("=")[-1].lower() == "true"
        elif "numsamples" in s:
            out["num_samples"] = int(s.split("=")[-1])
    return out


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kind", required=True,
                   choices=["vae", "nsvae_encoder", "supervised",
                            "legacy"])
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
    p.add_argument("--from_dirname", nargs="?", const="", default=None,
                   help="auto-parse architecture flags from the "
                        "reference save-dir name (the parent dir of "
                        "--encoder when no value given, or an explicit "
                        "dir name/path). kind=vae parses the pretrain "
                        "grammar; kind=nsvae_encoder the NSVAE grammar. "
                        "Explicit flags override parsed values.")
    p.add_argument("--pretrain_dirname", type=str, default=None,
                   help="with --from_dirname and kind=nsvae_encoder: "
                        "the PRETRAIN save-dir name for the skip/recon "
                        "setups (the reference reads it from its "
                        "config.ini pre_clean_encoder path, "
                        "test_nsvae_se.py:668-700)")
    return p


def _apply_dirname(args, argv):
    """Fill args with dirname-parsed values, explicit argv flags winning
    (detected via a SUPPRESS-defaults re-parse)."""
    name = args.from_dirname or os.path.basename(
        os.path.dirname(os.path.abspath(args.encoder or args.decoder)))
    name = os.path.basename(os.path.normpath(name))  # accept full paths
    if args.kind == "nsvae_encoder":
        parsed = parse_nsvae_dirname(name)
        if args.pretrain_dirname:
            pre = parse_pretrain_dirname(os.path.basename(
                os.path.normpath(args.pretrain_dirname)))
            pre.pop("zdim", None)  # NSVAE dir's zdim governs
            pre.pop("num_samples", None)
            parsed = {**pre, **parsed}
    else:
        parsed = parse_pretrain_dirname(name)
    loss_params = parsed.pop("loss_params", None)
    explicit = build_parser()
    for a in explicit._actions:
        a.default = argparse.SUPPRESS
    user_set = vars(explicit.parse_args(argv))
    for k, v in parsed.items():
        if k not in user_set:
            setattr(args, k, v)
    return loss_params


def main(argv=None):
    import sys

    argv = list(sys.argv[1:]) if argv is None else list(argv)
    args = build_parser().parse_args(argv)
    parsed_loss = (_apply_dirname(args, argv)
                   if args.from_dirname is not None else None)
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
    # parsed loss hyper-params (alpha/w_resi/matching) are not
    # architecture; recorded in meta for provenance only
    extra = {"dirname_loss_params": parsed_loss} if parsed_loss else {}
    if args.kind == "vae":
        best = {}
        if args.encoder:
            best["enc"] = ti.import_vae_encoder(
                ti.load_state_dict(args.encoder), cfg)
        if args.decoder:
            best["dec"] = ti.import_vae_decoder(
                ti.load_state_dict(args.decoder), cfg)
        ckpt.save_best(best)
        ckpt.save_meta({**extra, "model_name": args.model_name, "config": asdict(cfg),
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
        ckpt.save_meta({**extra, "model_name": args.model_name,
                        "noisy_config": asdict(cfg),
                        "pre_config": asdict(pre_cfg),
                        "epoch": -1, "best_val": float("nan"), "patience": 0,
                        "sched": {"best": float("inf"), "num_bad": 0},
                        "converted_from": [args.encoder]})
    else:  # supervised | legacy
        if args.kind == "legacy":
            # the legacy model/module.py DCCRN_ pins its own choices;
            # record the PINNED config so downstream rebuilds match
            from idccrn_vae_tpu.models.dccrn import LegacyDccrn

            cfg = LegacyDccrn(cfg).cfg
            variables = ti.import_legacy_dccrn(
                ti.load_state_dict(args.encoder), cfg)
        else:
            variables = ti.import_supervised_dccrn(
                ti.load_state_dict(args.encoder), cfg)
        ckpt.save_best(variables)
        ckpt.save_meta({**extra, "model_name": args.model_name, "config": asdict(cfg),
                        "epoch": -1, "best_val": float("nan"), "patience": 0,
                        "sched": {"best": float("inf"), "num_bad": 0},
                        "converted_from": [args.encoder]})
    print(f"converted -> {args.out}")


if __name__ == "__main__":
    main()
