"""CLI surface test for the synthetic-corpus generator."""

import json
import os

import numpy as np

from idccrn_vae_tpu.cli.make_synth_corpus import main
from idccrn_vae_tpu.data.audio_io import read_wav


def test_make_synth_corpus_cli(tmp_path, capsys):
    root = str(tmp_path / "corpus")
    main(["--out", root, "--n_train", "2", "--n_val", "2",
          "--utt_seconds", "0.5", "--seed", "3"])
    out = capsys.readouterr().out
    assert "wrote 4 noisy utterances" in out
    meta = json.load(open(os.path.join(root, "corpus_meta.json")))
    assert len(meta["files"]) == 4
    for split in ("train", "val"):
        for kind in ("clean", "noise", "noisy"):
            d = os.path.join(root, f"{kind}_{split}")
            wavs = [f for f in os.listdir(d) if f.endswith(".wav")]
            assert len(wavs) == 2, (d, wavs)
    # noisy == clean + noise (the generator writes the scaled noise)
    c, fs = read_wav(os.path.join(root, "clean_val/clean_fileid_0.wav"))
    n, _ = read_wav(os.path.join(root, "noise_val/noise_fileid_0.wav"))
    y, _ = read_wav(os.path.join(root, "noisy_val/noisy_fileid_0.wav"))
    assert fs == 16000
    np.testing.assert_allclose(y, c + n, atol=2e-4)


def test_single_bucket_override(tmp_path):
    root = str(tmp_path / "corpus")
    main(["--out", root, "--n_train", "1", "--n_val", "1",
          "--utt_seconds", "0.5", "--snr_lo", "-5", "--snr_hi", "0"])
    meta = json.load(open(os.path.join(root, "corpus_meta.json")))
    assert len(meta["buckets"]) == 1
    for rec in meta["files"].values():
        assert -5.0 <= rec["snr_db"] < 0.0
