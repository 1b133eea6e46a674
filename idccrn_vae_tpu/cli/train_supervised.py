"""Supervised DCCRN baseline training — supervised_dccrn/train.py."""

from __future__ import annotations

import argparse

from idccrn_vae_tpu.cli.common import (
    add_common_train_flags,
    datanorm_from_ini,
    loaders_from_ini,
    resolve_save_dir,
    model_config,
    parse_weights,
)
from idccrn_vae_tpu.losses.phase2 import EteTrainSeLoss
from idccrn_vae_tpu.parallel.mesh import auto_mesh
from idccrn_vae_tpu.train.supervised import SupervisedTrainer
from idccrn_vae_tpu.utils.config import load_ini
from idccrn_vae_tpu.utils.logger import get_logger


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    add_common_train_flags(p)
    p.add_argument("--data_norm", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    ini = load_ini(args.cfg_file)
    cfg = model_config(args, ini, skip_mode="real")
    datanorm = datanorm_from_ini(ini, args.data_norm)
    loss = EteTrainSeLoss(parse_weights(args.recon_loss_weight))
    mesh = auto_mesh(ini.getint("DataFrame", "batch_size"), args.n_devices)
    trainer = SupervisedTrainer(
        cfg, loss, learning_rate=float(ini.get("Training", "lr")),
        datanorm=datanorm, mesh=mesh, seed=args.seed,
        donate=args.donate,
    )
    train_loader, val_loader, n_train, n_val = loaders_from_ini(
        ini, "pair", args.first_use_dataset)
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
    )


if __name__ == "__main__":
    main()
