"""Supervised DCCRN evaluation — supervised_dccrn/test.py surface
(without the reference's debug 5-file truncation)."""

from __future__ import annotations

import argparse

from idccrn_vae_tpu.cli.common import (
    add_bucket_args,
    bucket_kwargs,
    config_from_meta,
    match_clean_paths,
)
from idccrn_vae_tpu.data.segments import find_wavs
from idccrn_vae_tpu.eval.runners import run_supervised_eval
from idccrn_vae_tpu.models.dccrn import SupervisedDccrn
from idccrn_vae_tpu.train.checkpoint import (
    CheckpointManager,
    datanorm_from_meta,
)


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_dir", type=str, required=True)
    p.add_argument("--model_type", type=str, default="checkpoint",
                   choices=["checkpoint", "final"],
                   help="'checkpoint' = best-val snapshot, 'final' = last "
                        "training state")
    p.add_argument("--noisy_dir", type=str, required=True)
    p.add_argument("--clean_dir", type=str, required=True)
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--write_wavs", action="store_true",
                   help="save the enhanced outputs (the reference's "
                        "supervised_dccrn/test.py --save_output)")
    add_bucket_args(p)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    ckpt = CheckpointManager(args.model_dir)
    meta = ckpt.load_meta()
    cfg = config_from_meta(meta)
    if args.model_type == "checkpoint":
        variables = ckpt.load_best()
    else:
        variables = ckpt.load_state()["model"]
    # rebuild the training-time datanorm from meta (the reference
    # re-parses it from the dir name + config mean_file,
    # supervised_dccrn/test.py:404-413)
    model = SupervisedDccrn(cfg, datanorm_from_meta(meta))
    noisy_paths = find_wavs(args.noisy_dir)
    clean_paths = match_clean_paths(noisy_paths, args.clean_dir)
    run_supervised_eval(model, variables, noisy_paths, clean_paths,
                        args.out_dir, cfg, batch_size=args.batch_size,
                        write_wavs=args.write_wavs, **bucket_kwargs(args))


if __name__ == "__main__":
    main()
