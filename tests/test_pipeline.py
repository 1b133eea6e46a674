"""Full-pipeline integration: CVAE + NVAE pretrain -> NSVAE -> phase-2
(classical and adversarial) -> enhancement eval, all through the CLIs
with checkpoints chained via meta.json."""

import json
import os

import numpy as np
import pytest

from idccrn_vae_tpu.data.audio_io import write_wav

FS = 16000
SEQ_LEN = 17

TINY_FLAGS = ["--zdim", "4", "--encoder_dim_start", "2", "--num_samples",
              "1", "--causal", "--first_use_dataset"]


@pytest.fixture
def corpus(tmp_path):
    rng = np.random.default_rng(0)
    dirs = {}
    for name in ("clean_train", "clean_val", "noise_train", "noise_val",
                 "noisy_train", "noisy_val"):
        d = tmp_path / name
        d.mkdir()
        dirs[name] = str(d)
    for i in range(3):
        dur = 4000
        t = np.arange(dur) / FS
        clean = 0.3 * np.sin(2 * np.pi * (200 + 40 * i) * t)
        noise = 0.1 * rng.standard_normal(dur)
        noisy = clean + noise
        for split in ("train", "val"):
            write_wav(os.path.join(dirs[f"clean_{split}"],
                                   f"clean_fileid_{i}.wav"),
                      clean.astype(np.float32), FS)
            write_wav(os.path.join(dirs[f"noise_{split}"],
                                   f"noise_fileid_{i}.wav"),
                      noise.astype(np.float32), FS)
            write_wav(os.path.join(dirs[f"noisy_{split}"],
                                   f"noisy_fileid_{i}.wav"),
                      noisy.astype(np.float32), FS)
    return tmp_path, dirs


def _ini(tmp_path, dirs, name, model_name, extra=""):
    path = tmp_path / f"{name}.ini"
    path.write_text(f"""[User]
logger_type = 1
saved_root = {tmp_path}/models_{name}
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
epochs = 1
early_stop_patience = 5
save_frequency = 1

[DataFrame]
dataset_name = pipe_{name}
suffix = wav
num_workers = 1
batch_size = 2
shuffle = True
sequence_len = {SEQ_LEN}
""")
    return str(path)


def _model_dir(tmp_path, name):
    root = os.path.join(tmp_path, f"models_{name}")
    return os.path.join(root, sorted(os.listdir(root))[-1])


def test_full_pipeline(corpus, monkeypatch):
    tmp_path, dirs = corpus
    monkeypatch.chdir(tmp_path)

    # 1. pretrain CVAE + NVAE (skip-prepare "spadd" mode like the
    #    published configs)
    from idccrn_vae_tpu.cli.train_vae import main as train_vae

    train_vae(["--cfg_file", _ini(tmp_path, dirs, "cvae", "complex_CVAE"),
               *TINY_FLAGS, "--skip_padding", "--kl_weight", "0.01"])
    cvae_dir = _model_dir(tmp_path, "cvae")
    train_vae(["--cfg_file", _ini(tmp_path, dirs, "nvae", "complex_NVAE"),
               *TINY_FLAGS, "--skip_padding", "--kl_weight", "0.01"])
    nvae_dir = _model_dir(tmp_path, "nvae")

    # 2. NSVAE posterior matching against the frozen VAEs
    from idccrn_vae_tpu.cli.train_nsvae import main as train_nsvae

    nsvae_ini = _ini(
        tmp_path, dirs, "nsvae", "complex_NSVAE",
        extra=f"pre_clean_encoder = {cvae_dir}\n"
              f"pre_noise_encoder = {nvae_dir}\n")
    train_nsvae(["--cfg_file", nsvae_ini, *TINY_FLAGS,
                 "--nsvae_model", "original", "--latent_num", "2",
                 "--alpha", "1.0", "--w_kl", "1.0", "--w_dismiu", "0.1"])
    nsvae_dir = _model_dir(tmp_path, "nsvae")
    with open(os.path.join(nsvae_dir, "meta.json")) as f:
        meta = json.load(f)
    assert meta["noisy_config"]["latent_num"] == 2

    # 3. phase-1 enhancement eval (NSVAE encoder + pretrained CVAE dec)
    from idccrn_vae_tpu.cli.test_enhance import main as test_enhance

    out1 = str(tmp_path / "eval_phase1")
    test_enhance(["--nsvae_dir", nsvae_dir, "--decoder_dir", cvae_dir,
                  "--phase", "1", "--noisy_dir", dirs["noisy_val"],
                  "--clean_dir", dirs["clean_val"], "--out_dir", out1,
                  "--num_samples", "2", "--batch_size", "2",
                  "--compute", "f32"])
    assert os.path.exists(os.path.join(out1, "per_utterance.json"))

    # 3b. phase-1 latent_num=2 mask out-type through the CLI: NSVAE
    #     noisy encoder + CVAE speech decoder + NVAE noise decoder
    #     (test_nsvae_se.py --latent_to_use 2; the e2e driver's evalp1
    #     stage runs this exact flag set per out-type)
    out1b = str(tmp_path / "eval_phase1_mask")
    test_enhance(["--nsvae_dir", nsvae_dir, "--decoder_dir", cvae_dir,
                  "--noise_decoder_dir", nvae_dir,
                  "--latent_to_use", "2", "--outtype", "complex_mask",
                  "--phase", "1", "--noisy_dir", dirs["noisy_val"],
                  "--clean_dir", dirs["clean_val"], "--out_dir", out1b,
                  "--num_samples", "2", "--batch_size", "2",
                  "--compute", "f32"])
    with open(os.path.join(out1b, "per_utterance.json")) as f:
        for v in json.load(f).values():
            assert np.isfinite(v["sisdr"])

    # 4. phase-2 classical decoder fine-tune
    from idccrn_vae_tpu.cli.train_phase2 import main as train_phase2

    p2_ini = _ini(tmp_path, dirs, "p2", "phase2_decoder")
    train_phase2(["--cfg_file", p2_ini, *TINY_FLAGS,
                  "--first_phase_folder", nsvae_dir, "--use_sc_phase2",
                  "--recon_type", "mask", "--latent_num", "1"])
    p2_dir = _model_dir(tmp_path, "p2")
    assert os.path.exists(os.path.join(p2_dir, "meta.json"))

    # 5. phase-2 adversarial fine-tune
    p2a_ini = _ini(tmp_path, dirs, "p2adv", "phase2_adv")
    train_phase2(["--cfg_file", p2a_ini, *TINY_FLAGS,
                  "--first_phase_folder", nsvae_dir, "--use_sc_phase2",
                  "--recon_type", "mask", "--latent_num", "1",
                  "--adversarial", "--dlr", "1e-4", "--d_step", "2"])
    p2a_dir = _model_dir(tmp_path, "p2adv")

    # 6. phase-2 enhancement eval, with the per-SNR-bucket report path
    #    (--corpus_meta, the data/synth.py meta schema)
    meta_path = str(tmp_path / "corpus_meta.json")
    with open(meta_path, "w") as f:
        json.dump({"buckets": ["[0,5)", "[5,10)"],
                   "files": {f"val/noisy_fileid_{i}.wav":
                             {"snr_db": 2.0 + 5 * (i % 2),
                              "bucket": ["[0,5)", "[5,10)"][i % 2]}
                             for i in range(3)}}, f)
    out2 = str(tmp_path / "eval_phase2")
    test_enhance(["--nsvae_dir", p2a_dir, "--phase", "2",
                  "--noisy_dir", dirs["noisy_val"],
                  "--clean_dir", dirs["clean_val"], "--out_dir", out2,
                  "--num_samples", "2", "--batch_size", "2",
                  "--compute", "f32", "--corpus_meta", meta_path])
    with open(os.path.join(out2, "per_utterance.json")) as f:
        per = json.load(f)
    assert len(per) == 3
    with open(os.path.join(out2, "bucket_report.json")) as f:
        buckets = json.load(f)
    assert list(buckets) == ["[0,5)", "[5,10)"]
    assert buckets["[0,5)"]["n"] == 2 and buckets["[5,10)"]["n"] == 1
    assert "delta" in buckets["[0,5)"]["sisdr"]
    with open(os.path.join(out2, "summary.json")) as f:
        assert "per_snr_bucket" in json.load(f)
    for v in per.values():
        assert np.isfinite(v["sisdr"])
