"""Phase-2 decoder fine-tuning (classical or --adversarial LSGAN) —
train_second_phase_decoder.py / train_second_phase_adversarial.py."""

from __future__ import annotations

import argparse
import dataclasses
import os

from idccrn_vae_tpu.cli.common import (
    add_common_train_flags,
    config_from_meta,
    loaders_from_ini,
    resolve_save_dir,
    parse_weights,
)
from idccrn_vae_tpu.losses.phase2 import TwoPhaseLoss
from idccrn_vae_tpu.parallel.mesh import auto_mesh
from idccrn_vae_tpu.train.checkpoint import CheckpointManager
from idccrn_vae_tpu.train.phase2 import Phase2Trainer
from idccrn_vae_tpu.utils.config import load_ini
from idccrn_vae_tpu.utils.logger import get_logger


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    add_common_train_flags(p)
    p.add_argument("--first_phase_folder", type=str, required=True,
                   help="NSVAE checkpoint dir (meta.json supplies configs)")
    p.add_argument("--use_sc_phase2", action="store_true")
    p.add_argument("--load_de", action="store_true",
                   help="initialize decoder from the pretrained CVAE "
                        "decoder checkpoint")
    p.add_argument("--pre_decoder_dir", type=str, default=None)
    p.add_argument("--decode_update", type=str, default="all_decode",
                   choices=["all_decode", "skip_layer"])
    p.add_argument("--latent_num", type=int, default=1)
    p.add_argument("--adversarial", action="store_true")
    p.add_argument("--dlr", type=float, default=1e-4)
    p.add_argument("--d_step", type=int, default=1)
    p.add_argument("--alpha", type=float, default=1.0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    ini = load_ini(args.cfg_file)

    if args.load_de and not args.pre_decoder_dir:
        raise SystemExit("--load_de requires --pre_decoder_dir (the "
                         "pretrained CVAE decoder to initialize from); "
                         "without it the fine-tune would silently start "
                         "from a random decoder")
    # guard BEFORE CheckpointManager: its constructor mkdirs, so a
    # typo'd path would otherwise litter an empty dir and fail deep
    # inside orbax instead of here
    if not os.path.exists(
            os.path.join(args.first_phase_folder, "meta.json")):
        raise SystemExit(f"--first_phase_folder {args.first_phase_folder} "
                         "holds no NSVAE checkpoint (meta.json missing)")
    nsvae_ckpt = CheckpointManager(args.first_phase_folder)
    if not nsvae_ckpt.has_best():
        raise SystemExit(f"{args.first_phase_folder} has no best snapshot "
                         "— refusing to fine-tune from nothing")
    nsvae_meta = nsvae_ckpt.load_meta()
    enc_cfg = config_from_meta(nsvae_meta, "noisy_config")
    dec_cfg = dataclasses.replace(
        config_from_meta(nsvae_meta, "pre_config"),
        skip_mode="runtime" if args.use_sc_phase2 else "none",
        recon_type=args.recon_type,
        resynthesis=args.resynthesis,
        num_samples=args.num_samples,
        latent_num=args.latent_num,
    )
    enc_cfg = dataclasses.replace(enc_cfg, num_samples=args.num_samples)

    loss = TwoPhaseLoss(parse_weights(args.recon_loss_weight),
                        alpha=args.alpha, latent_num=args.latent_num)
    mesh = auto_mesh(ini.getint("DataFrame", "batch_size"), args.n_devices)
    trainer = Phase2Trainer(
        enc_cfg, dec_cfg, loss,
        learning_rate=float(ini.get("Training", "lr")),
        adversarial=args.adversarial, dis_lr=args.dlr, d_step=args.d_step,
        decode_update=args.decode_update, mesh=mesh, seed=args.seed,
        donate=args.donate,
    )

    from idccrn_vae_tpu.cli.common import load_pretrained_variables

    pretrained = {}
    best = nsvae_ckpt.load_best()
    pretrained["encoder"] = best["noisy_enc"]
    if args.load_de and args.pre_decoder_dir:
        pretrained["decoder"] = load_pretrained_variables(
            args.pre_decoder_dir, "vae_decoder", dec_cfg, "dec")

    train_loader, val_loader, n_train, n_val = loaders_from_ini(
        ini, "triplet", args.first_use_dataset)
    model_name = ini.get("User", "model_name")
    save_dir = resolve_save_dir(args, ini, model_name)
    logger = get_logger(f"{save_dir}/train.log", 1)
    logger.info("train %d, val %d segments -> %s", n_train, n_val, save_dir)
    trainer.fit(
        train_loader, val_loader,
        epochs=ini.getint("Training", "epochs"),
        save_dir=save_dir,
        early_stop_patience=ini.getint("Training", "early_stop_patience"),
        save_frequency=ini.getint("Training", "save_frequency"),
        model_name=model_name, resume=args.reload, logger=logger,
        pretrained=pretrained,
    )


if __name__ == "__main__":
    main()
