"""End-to-end CLI tests: tiny synthetic corpus -> train 2 epochs ->
checkpoint with meta.json -> downstream CLI consumes it."""

import json
import os

import numpy as np
import pytest

from idccrn_vae_tpu.data.audio_io import write_wav

FS = 16000
SEQ_LEN = 17  # frames -> windows of 1600 samples


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
        clean = 0.3 * np.sin(2 * np.pi * (200 + 50 * i) * t)
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


def _write_ini(tmp_path, dirs, extra_user="", name="t"):
    path = tmp_path / f"{name}.ini"
    path.write_text(f"""[User]
logger_type = 1
saved_root = {tmp_path}/models
train_data_dir = {dirs['clean_train']}
val_data_dir = {dirs['clean_val']}
noisy_train_data_dir = {dirs['noisy_train']}
clean_train_data_dir = {dirs['clean_train']}
noise_train_data_dir = {dirs['noise_train']}
noisy_val_data_dir = {dirs['noisy_val']}
clean_val_data_dir = {dirs['clean_val']}
noise_val_data_dir = {dirs['noise_val']}
model_name = tiny_model
{extra_user}

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
dataset_name = tinytest
suffix = wav
num_workers = 1
batch_size = 2
shuffle = True
sequence_len = {SEQ_LEN}
""")
    return str(path)


TINY_FLAGS = ["--zdim", "4", "--encoder_dim_start", "2", "--num_samples",
              "1", "--causal", "--first_use_dataset"]


def _latest_model_dir(tmp_path):
    root = os.path.join(tmp_path, "models")
    subdirs = sorted(os.listdir(root))
    return os.path.join(root, subdirs[-1])


def test_train_vae_cli_and_meta(corpus, monkeypatch):
    tmp_path, dirs = corpus
    monkeypatch.chdir(tmp_path)
    from idccrn_vae_tpu.cli.train_vae import main

    ini = _write_ini(tmp_path, dirs)
    main(["--cfg_file", ini, *TINY_FLAGS, "--skipc", "--kl_weight", "0.01"])
    mdir = _latest_model_dir(tmp_path)
    with open(os.path.join(mdir, "meta.json")) as f:
        meta = json.load(f)
    assert meta["config"]["zdim"] == 4
    assert meta["config"]["skip_mode"] == "real"
    assert os.path.exists(os.path.join(mdir, "best"))
    assert os.path.exists(os.path.join(mdir, "loss_curves.json"))

    # downstream: reconstruction eval via the checkpoint
    from idccrn_vae_tpu.cli.test_prevae import main as test_main

    out_dir = str(tmp_path / "prevae_eval")
    test_main(["--model_dir", mdir, "--test_dir", dirs["clean_val"],
               "--out_dir", out_dir, "--num_samples", "1",
               "--batch_size", "2", "--write_wavs"])
    assert os.path.exists(os.path.join(out_dir, "per_utterance.json"))
    recon = os.path.join(out_dir, "recon")
    # compare wavs only: the segment-index cache now lives in the corpus dir
    assert sorted(os.listdir(recon)) == sorted(
        f for f in os.listdir(dirs["clean_val"]) if f.endswith(".wav"))


def test_supervised_cli(corpus, monkeypatch):
    tmp_path, dirs = corpus
    monkeypatch.chdir(tmp_path)
    from idccrn_vae_tpu.cli.train_supervised import main

    ini = _write_ini(tmp_path, dirs, name="sup")
    main(["--cfg_file", ini, *TINY_FLAGS])
    mdir = _latest_model_dir(tmp_path)

    from idccrn_vae_tpu.cli.test_supervised import main as test_main

    out_dir = str(tmp_path / "sup_eval")
    test_main(["--model_dir", mdir, "--noisy_dir", dirs["noisy_val"],
               "--clean_dir", dirs["clean_val"], "--out_dir", out_dir,
               "--batch_size", "2", "--write_wavs"])
    assert os.path.exists(os.path.join(out_dir, "summary.json"))
    assert os.path.exists(os.path.join(out_dir, "per_utterance.json"))
    enhanced = os.path.join(out_dir, "enhanced")
    assert sorted(os.listdir(enhanced)) == sorted(
        f for f in os.listdir(dirs["noisy_val"]) if f.endswith(".wav"))


def test_cal_mean_std_cli(corpus):
    tmp_path, dirs = corpus
    from idccrn_vae_tpu.cli.cal_mean_std import main

    mean_p = str(tmp_path / "mean.txt")
    std_p = str(tmp_path / "std.txt")
    main(["--data_dir", dirs["clean_train"], "--mean_out", mean_p,
          "--std_out", std_p, "--no_trim"])
    mean = np.loadtxt(mean_p)
    assert mean.shape == (257, 2)


def test_reload_requires_savedir(corpus):
    """--reload without --reload_savedir must fail fast: a silent fresh
    save dir would restart training at epoch 0 while the user believes
    they are resuming (shared guard, cli/common.py resolve_save_dir)."""
    import pytest

    from idccrn_vae_tpu.cli.train_vae import main as train_vae

    tmp_path, dirs = corpus
    ini = _write_ini(tmp_path, dirs, name='reload_guard')
    with pytest.raises(SystemExit, match="reload_savedir"):
        train_vae(["--cfg_file", ini, "--reload"])


def test_phase2_guards_bad_first_phase_folder(tmp_path):
    import pytest

    from idccrn_vae_tpu.cli.train_phase2 import main as train_phase2

    ini = tmp_path / "min.ini"
    ini.write_text("[User]\nmodel_name = x\n")
    with pytest.raises(SystemExit, match="meta.json missing"):
        train_phase2(["--cfg_file", str(ini),
                      "--first_phase_folder", str(tmp_path / "nope")])
    assert not (tmp_path / "nope").exists()  # no dir littered
