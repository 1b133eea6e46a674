"""Speech-enhancement evaluation — test_nsvae_se.py / test_se_cvaefinetune.py.

--phase 1: pretrained CVAE decoder + NSVAE noisy encoder.
--phase 2: phase-2 fine-tuned decoder (classical or adversarial dir).
"""

from __future__ import annotations

import argparse
import dataclasses
import os

from idccrn_vae_tpu.cli.common import (
    add_bucket_args,
    bucket_kwargs,
    load_enhancement_checkpoints,
    match_clean_paths,
)
from idccrn_vae_tpu.data.segments import find_wavs
from idccrn_vae_tpu.eval.enhance import Enhancer
from idccrn_vae_tpu.eval.runners import run_enhancement_eval


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--nsvae_dir", type=str, required=True,
                   help="NSVAE checkpoint dir (phase 1) or phase-2 dir")
    p.add_argument("--decoder_dir", type=str, default=None,
                   help="pretrained CVAE dir (phase 1) — defaults to the "
                        "decoder stored in nsvae_dir for phase 2")
    p.add_argument("--noise_decoder_dir", type=str, default=None,
                   help="pretrained NVAE decoder dir — enables the "
                        "latent_num=2 out-types in phase 1 "
                        "(test_nsvae_se.py --latent_to_use 2)")
    p.add_argument("--phase", type=int, default=1, choices=[1, 2])
    p.add_argument("--noisy_dir", type=str, required=True)
    p.add_argument("--clean_dir", type=str, required=True)
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--num_samples", type=int, default=10)
    p.add_argument("--latent_to_use", type=int, default=1)
    p.add_argument("--outtype", type=str, default="clean_direct",
                   choices=["clean_direct", "real_imag_mask", "complex_mask",
                            "phase_mask"])
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--write_wavs", action="store_true")
    p.add_argument("--latent_diag", action="store_true",
                   help="collect mu covariance + speech/noise silhouette "
                        "diagnostics (test_nsvae_se.py latent analysis)")
    p.add_argument("--n_devices", type=int, default=None,
                   help="shard eval batches over a data mesh")
    p.add_argument("--compute", type=str, default="bf16",
                   choices=["f32", "bf16", "int8"],
                   help="int8 = serving-only quantized convs (dynamic "
                        "per-tensor activation + per-channel weight "
                        "scales, int8 MXU). MEASURED AT PARITY with "
                        "bf16 end-to-end on v5e (INT8_PROBE.json: the "
                        "decoder's dilated convs gain nothing and the "
                        "quant passes offset the encoder's 1.63x conv "
                        "win) — kept for hardware where int8 pays")
    p.add_argument("--sample_chunks", type=int, default=1,
                   help="decode num_samples in this many sequential "
                        "chunks — same outputs, peak decoder memory "
                        "divided by the chunk count (f32 S=10 exceeds "
                        "one chip's HBM at batch>=16 in one shot)")
    add_bucket_args(p)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    enc_cfg, dec_cfg, enc_vars, dec_vars, noise_dec_vars, pad_mode = \
        load_enhancement_checkpoints(args.nsvae_dir, args.decoder_dir,
                                     args.noise_decoder_dir, args.phase)

    enc_cfg = dataclasses.replace(enc_cfg, compute=args.compute)
    dec_cfg = dataclasses.replace(dec_cfg, compute=args.compute)

    mesh = None
    if args.n_devices:
        from idccrn_vae_tpu.parallel.mesh import auto_mesh

        mesh = auto_mesh(args.batch_size, args.n_devices)
    enhancer = Enhancer(
        enc_cfg, dec_cfg, enc_vars, dec_vars, noise_dec_vars,
        num_samples=args.num_samples, outtype=args.outtype,
        latent_to_use=args.latent_to_use, pad_mode=pad_mode, mesh=mesh,
        sample_chunks=args.sample_chunks,
    )
    noisy_paths = find_wavs(args.noisy_dir)
    clean_paths = match_clean_paths(noisy_paths, args.clean_dir)
    run_enhancement_eval(
        enhancer, noisy_paths, clean_paths, args.out_dir,
        batch_size=args.batch_size, write_wavs=args.write_wavs,
        latent_diagnostics=args.latent_diag, **bucket_kwargs(args),
    )


if __name__ == "__main__":
    main()
