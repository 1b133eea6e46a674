"""Streaming-enhancement CLI: train a tiny causal supervised model,
stream a directory of wavs through it, check outputs + latency report."""

import json
import os

import numpy as np
import pytest

from tests.test_cli import TINY_FLAGS, _latest_model_dir, _write_ini, corpus  # noqa: F401


def test_stream_enhance_cli_supervised(corpus, monkeypatch):  # noqa: F811
    tmp_path, dirs = corpus
    monkeypatch.chdir(tmp_path)
    from idccrn_vae_tpu.cli.train_supervised import main as train_main

    ini = _write_ini(tmp_path, dirs, name="stream")
    train_main(["--cfg_file", ini, *TINY_FLAGS])
    mdir = _latest_model_dir(tmp_path)

    from idccrn_vae_tpu.cli.stream_enhance import main as stream_main

    out_dir = str(tmp_path / "streamed")
    report = stream_main(["--model", "supervised", "--model_dir", mdir,
                          "--in_dir", dirs["noisy_val"],
                          "--out_dir", out_dir, "--chunk_frames", "8"])
    assert report["files"] == 3
    assert report["chunk_ms"] == 50.0  # 8 frames * 100 hop / 16 kHz
    assert report["algorithmic_latency_ms"] == pytest.approx(75.75)
    assert report["chunk_p95_ms"] > 0
    # every input got an equal-length enhanced wav
    from idccrn_vae_tpu.data.audio_io import read_wav

    # wavs only: the corpus dir also holds the segment-index cache json
    for name in (f for f in os.listdir(dirs["noisy_val"])
                 if f.endswith(".wav")):
        enhanced, fs = read_wav(os.path.join(out_dir, name))
        original, _ = read_wav(os.path.join(dirs["noisy_val"], name))
        assert fs == 16000
        assert len(enhanced) == len(original)
        assert np.isfinite(enhanced).all()


def test_stream_enhance_cli_rejects_bad_args(tmp_path):
    from idccrn_vae_tpu.cli.stream_enhance import main as stream_main
    from idccrn_vae_tpu.data.audio_io import write_wav

    with pytest.raises(SystemExit):  # neither --in_dir nor --in_wav
        stream_main(["--model", "supervised", "--model_dir", str(tmp_path),
                     "--out_dir", str(tmp_path / "o")])
    # an empty --in_dir fails fast with a clear message BEFORE any model
    # is loaded or warmed (ADVICE r2)
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(SystemExit, match="no wav files"):
        stream_main(["--model", "supervised", "--model_dir", str(tmp_path),
                     "--in_dir", str(empty),
                     "--out_dir", str(tmp_path / "o")])
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    write_wav(str(wav_dir / "a.wav"),
              np.zeros(1600, np.float32), 16000)
    with pytest.raises(SystemExit):  # supervised without --model_dir
        stream_main(["--model", "supervised", "--in_dir", str(wav_dir),
                     "--out_dir", str(tmp_path / "o")])
    with pytest.raises(SystemExit):  # nsvae without --nsvae_dir
        stream_main(["--in_dir", str(wav_dir),
                     "--out_dir", str(tmp_path / "o")])
