#!/usr/bin/env python
"""Quickstart: the full I-DCCRN-VAE pipeline on a synthetic mini-corpus.

Generates a few seconds of tone+noise audio, then runs every stage
end-to-end at tiny geometry (finishes in a few minutes on CPU):

  1. CVAE + NVAE pretraining        (cli.train_vae)
  2. NSVAE posterior matching       (cli.train_nsvae)
  3. phase-2 adversarial fine-tune  (cli.train_phase2 --adversarial)
  4. enhancement eval + metrics     (cli.test_enhance)
  5. streaming inference demo       (eval.streaming)

Swap the synthetic corpus for DNS/VB-DMD/WSJ0-QUT directories and drop
the tiny flags (--encoder_dim_start 2 --zdim 4) for real runs.

Usage:  python examples/quickstart.py [workdir]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The demo runs at tiny geometry, where CPU compiles in seconds; force
# it (env vars don't beat this image's sitecustomize TPU plugin). TPU
# would also work — the old tiny-batch XLA backward failure is cornered
# and worked around (XLA_DENSE_REPRO.json, parallel/mesh.py
# pad_small_tpu_batch) — but each remote TPU compile takes ~minutes,
# wrong for a quick demo.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from idccrn_vae_tpu.data.audio_io import write_wav  # noqa: E402

FS = 16000
TINY = ["--zdim", "4", "--encoder_dim_start", "2", "--num_samples", "1",
        "--causal", "--first_use_dataset"]


def make_corpus(root):
    rng = np.random.default_rng(0)
    dirs = {}
    for name in ("clean_train", "clean_val", "noise_train", "noise_val",
                 "noisy_train", "noisy_val"):
        d = os.path.join(root, name)
        os.makedirs(d, exist_ok=True)
        dirs[name] = d
    for i in range(4):
        t = np.arange(8000) / FS
        clean = 0.3 * np.sin(2 * np.pi * (180 + 60 * i) * t) * (
            1 + 0.5 * np.sin(2 * np.pi * 3 * t))
        noise = 0.12 * rng.standard_normal(len(t))
        for split in ("train", "val"):
            write_wav(f"{dirs[f'clean_{split}']}/clean_fileid_{i}.wav",
                      clean.astype(np.float32), FS)
            write_wav(f"{dirs[f'noise_{split}']}/noise_fileid_{i}.wav",
                      noise.astype(np.float32), FS)
            write_wav(f"{dirs[f'noisy_{split}']}/noisy_fileid_{i}.wav",
                      (clean + noise).astype(np.float32), FS)
    return dirs


def write_ini(root, dirs, name, model_name, extra=""):
    path = os.path.join(root, f"{name}.ini")
    with open(path, "w") as f:
        f.write(f"""[User]
logger_type = 2
saved_root = {root}/models_{name}
train_data_dir = {dirs['clean_train'] if 'cvae' in name else dirs['noise_train']}
val_data_dir = {dirs['clean_val'] if 'cvae' in name else dirs['noise_val']}
noisy_train_data_dir = {dirs['noisy_train']}
clean_train_data_dir = {dirs['clean_train']}
noise_train_data_dir = {dirs['noise_train']}
noisy_val_data_dir = {dirs['noisy_val']}
clean_val_data_dir = {dirs['clean_val']}
noise_val_data_dir = {dirs['noise_val']}
model_name = {model_name}
{extra}
[STFT]
winlen = 400
nfft = 512
hopfrac = 100
fs = 16000
trim = False
[Network]
z_dim = 4
clean_encoder = False
clean_decoder = False
noise_encoder = False
noise_decoder = False
[Training]
optimization = adam
lr = 1e-3
epochs = 2
early_stop_patience = 5
save_frequency = 1
[DataFrame]
dataset_name = quickstart_{name}
suffix = wav
num_workers = 1
batch_size = 2
shuffle = True
sequence_len = 17
""")
    return path


def latest(root, name):
    d = os.path.join(root, f"models_{name}")
    return os.path.join(d, sorted(os.listdir(d))[-1])


def main():
    # honor JAX_PLATFORMS even on images whose sitecustomize pre-pins a
    # TPU plugin (env alone does not win once jax is initialized there)
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat and "axon" not in plat:
        import jax

        jax.config.update("jax_platforms", plat)
    root = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else
                           "quickstart_out")
    os.makedirs(root, exist_ok=True)
    os.chdir(root)
    dirs = make_corpus(root)

    print("== 1/5 pretraining CVAE + NVAE ==")
    from idccrn_vae_tpu.cli.train_vae import main as train_vae

    train_vae(["--cfg_file", write_ini(root, dirs, "cvae", "complex_CVAE"),
               *TINY, "--skip_padding", "--kl_weight", "0.01"])
    train_vae(["--cfg_file", write_ini(root, dirs, "nvae", "complex_NVAE"),
               *TINY, "--skip_padding", "--kl_weight", "0.01"])
    cvae, nvae = latest(root, "cvae"), latest(root, "nvae")

    print("== 2/5 NSVAE posterior matching ==")
    from idccrn_vae_tpu.cli.train_nsvae import main as train_nsvae

    train_nsvae(["--cfg_file", write_ini(
        root, dirs, "nsvae", "complex_NSVAE",
        extra=f"pre_clean_encoder = {cvae}\npre_noise_encoder = {nvae}\n"),
        *TINY, "--nsvae_model", "original", "--latent_num", "2",
        "--alpha", "1.0", "--w_kl", "1.0", "--w_dismiu", "0.1"])
    nsvae = latest(root, "nsvae")

    print("== 3/5 phase-2 adversarial decoder fine-tune ==")
    from idccrn_vae_tpu.cli.train_phase2 import main as train_phase2

    train_phase2(["--cfg_file", write_ini(root, dirs, "p2", "phase2_adv"),
                  *TINY, "--first_phase_folder", nsvae, "--use_sc_phase2",
                  "--recon_type", "mask", "--latent_num", "1",
                  "--adversarial", "--dlr", "1e-4", "--d_step", "2"])
    p2 = latest(root, "p2")

    print("== 4/5 enhancement evaluation ==")
    from idccrn_vae_tpu.cli.test_enhance import main as test_enhance

    out_dir = os.path.join(root, "eval")
    test_enhance(["--nsvae_dir", p2, "--phase", "2",
                  "--noisy_dir", dirs["noisy_val"],
                  "--clean_dir", dirs["clean_val"], "--out_dir", out_dir,
                  "--num_samples", "2", "--batch_size", "2",
                  "--compute", "f32", "--write_wavs"])
    with open(os.path.join(out_dir, "per_utterance.json")) as f:
        print(json.dumps(json.load(f), indent=1)[:400], "…")

    print("== 5/5 streaming demo ==")
    import jax

    from idccrn_vae_tpu.cli.common import config_from_meta
    from idccrn_vae_tpu.eval.streaming import StreamingEnhancer
    from idccrn_vae_tpu.train.checkpoint import CheckpointManager

    ck = CheckpointManager(p2)
    meta, best = ck.load_meta(), ck.load_best()
    streamer = StreamingEnhancer(
        config_from_meta(meta, "enc_config"),
        config_from_meta(meta, "dec_config"),
        best["encoder"], best["decoder"], chunk_frames=10)
    wav = np.random.default_rng(1).standard_normal((1, 3000)).astype(
        np.float32) * 0.1
    out = streamer.stream(wav)
    print(f"streamed {wav.shape[1]/FS:.2f}s in "
          f"{wav.shape[1]//streamer.chunk_samples} chunks -> {out.shape}")
    print(f"done — artifacts in {root}")


if __name__ == "__main__":
    main()
