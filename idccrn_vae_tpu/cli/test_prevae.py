"""Pretrained-VAE reconstruction evaluation — test_prevae.py surface."""

from __future__ import annotations

import argparse

from idccrn_vae_tpu.cli.common import config_from_meta
from idccrn_vae_tpu.data.segments import find_wavs
from idccrn_vae_tpu.eval.runners import run_vae_reconstruction_eval
from idccrn_vae_tpu.models.vae import VaeDecoder, VaeEncoder
from idccrn_vae_tpu.train.checkpoint import (
    CheckpointManager,
    datanorm_from_meta,
)


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_dir", type=str, required=True)
    p.add_argument("--test_dir", type=str, required=True,
                   help="directory of wavs to reconstruct (the reference "
                        "hardcodes dns/wsj0/demand/dnsoff lists)")
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--num_samples", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--write_wavs", action="store_true",
                   help="save the reconstructions (the reference's "
                        "test_prevae.py --save_outfiles)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    ckpt = CheckpointManager(args.model_dir)
    meta = ckpt.load_meta()
    cfg = config_from_meta(meta)
    best = ckpt.load_best()
    # rebuild the training-time datanorm (the reference's test_prevae
    # silently omits data_mean/std — :549-555 — and so evaluates
    # datanorm-trained models un-normalized; meta.json fixes that)
    dn = datanorm_from_meta(meta)
    enc, dec = VaeEncoder(cfg, dn), VaeDecoder(cfg, dn)
    run_vae_reconstruction_eval(
        enc, dec, best["enc"], best["dec"], find_wavs(args.test_dir),
        args.out_dir, cfg, num_samples=args.num_samples,
        batch_size=args.batch_size, write_wavs=args.write_wavs,
    )


if __name__ == "__main__":
    main()
