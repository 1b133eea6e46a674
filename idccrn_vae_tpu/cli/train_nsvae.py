"""NSVAE training — the reference's train_nsvae.py surface.

Pretrained VAE checkpoints are referenced via [User] pre_clean_encoder/
pre_noise_encoder paths pointing at our CheckpointManager directories
(meta.json supplies the architecture — no dir-name parsing)."""

from __future__ import annotations

import argparse
import dataclasses

from idccrn_vae_tpu.cli.common import (
    add_common_train_flags,
    config_from_meta,
    loaders_from_ini,
    resolve_save_dir,
    model_config,
)
from idccrn_vae_tpu.losses.nsvae_loss import NsvaeTrueKlLoss
from idccrn_vae_tpu.parallel.mesh import auto_mesh
from idccrn_vae_tpu.train.checkpoint import CheckpointManager
from idccrn_vae_tpu.train.nsvae import NsvaeTrainer
from idccrn_vae_tpu.utils.config import load_ini
from idccrn_vae_tpu.utils.logger import get_logger


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    add_common_train_flags(p)
    p.add_argument("--nsvae_model", type=str, default="original",
                   choices=["original", "double", "adapt"])
    p.add_argument("--latent_num", type=int, default=2)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--w_resi", type=float, default=0.0)
    p.add_argument("--w_kl", type=float, default=1.0)
    p.add_argument("--w_dismiu", type=float, default=0.0)
    p.add_argument("--matching", type=str, default="speech",
                   choices=["speech", "both"])
    p.add_argument("--fclatent", action="store_true")
    # pretrained-VAE architecture flags for the torch-import (.pt) path,
    # where no meta.json exists to supply skip_mode — without them a
    # skipc/spadd-trained reference checkpoint would silently get
    # pre_cfg.skip_mode='none' persisted into the NSVAE meta and the
    # later phase-2 decoder rebuild would fail on param structure
    p.add_argument("--skipc", action="store_true",
                   help="pretrained VAEs use real skip connections "
                        "(only needed with .pt checkpoints)")
    p.add_argument("--skip_padding", action="store_true",
                   help="pretrained VAEs are the 'spadd' zero-skip "
                        "family (only needed with .pt checkpoints)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    ini = load_ini(args.cfg_file)

    # pretrained VAE geometry comes from its meta.json; reference .pt
    # checkpoints are also accepted (torch-import path) but then the
    # architecture flags must be passed on the command line.
    clean_dir = ini.get("User", "pre_clean_encoder")
    noise_dir = ini.get("User", "pre_noise_encoder")

    def _ckpt_or_none(path):
        # .pt/.pth files go through the torch-import path; only real
        # checkpoint DIRS get a CheckpointManager (whose constructor
        # mkdirs — never hand it a file path)
        return (None if path.endswith((".pt", ".pth"))
                else CheckpointManager(path))

    clean_ckpt = _ckpt_or_none(clean_dir)
    noise_ckpt = _ckpt_or_none(noise_dir)
    if clean_ckpt is not None:
        pre_cfg = config_from_meta(clean_ckpt.load_meta())
    else:
        pre_cfg = model_config(args, ini)

    channel_mode = {"original": "normal", "double": "double",
                    "adapt": "adapt"}[args.nsvae_model]
    noisy_cfg = dataclasses.replace(
        model_config(args, ini, latent_num=args.latent_num,
                     channel_mode=channel_mode),
        skip_to_use=pre_cfg.skip_to_use,
    )

    loss = NsvaeTrueKlLoss(
        alpha=args.alpha, w_resi=args.w_resi, w_kl=args.w_kl,
        w_dismiu=args.w_dismiu, cfg=noisy_cfg, matching=args.matching,
        use_skips=pre_cfg.skip_mode == "real",
    )
    trainable = {
        "clean_enc": ini.getboolean("Network", "clean_encoder"),
        "noise_enc": ini.getboolean("Network", "noise_encoder"),
    }
    mesh = auto_mesh(ini.getint("DataFrame", "batch_size"), args.n_devices)
    trainer = NsvaeTrainer(
        pre_cfg, noisy_cfg, loss,
        learning_rate=float(ini.get("Training", "lr")),
        trainable=trainable, mesh=mesh, seed=args.seed,
        donate=args.donate,
    )

    from idccrn_vae_tpu.cli.common import load_pretrained_variables

    pretrained = {}
    for key, ck, path in (("clean_enc", clean_ckpt, clean_dir),
                          ("noise_enc", noise_ckpt, noise_dir)):
        if ck is not None and not ck.has_best():
            raise SystemExit(
                f"{path} has no 'best' snapshot — refusing to train "
                "NSVAE posterior matching against randomly initialized "
                "frozen encoders (check pre_clean_encoder / "
                "pre_noise_encoder in the ini)")
        pretrained[key] = load_pretrained_variables(
            path, "vae_encoder", pre_cfg, "enc")

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
        pretrained=pretrained or None,
    )


if __name__ == "__main__":
    main()
