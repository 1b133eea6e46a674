"""Eval runner integration tests with synthetic wavs + tiny models."""

import dataclasses
import json
import os

import jax
import numpy as np

from idccrn_vae_tpu.data.audio_io import write_wav
from idccrn_vae_tpu.eval.enhance import Enhancer
from idccrn_vae_tpu.eval.runners import (
    run_enhancement_eval,
    run_supervised_eval,
    run_vae_reconstruction_eval,
)
from idccrn_vae_tpu.models.config import DccrnConfig
from idccrn_vae_tpu.models.dccrn import SupervisedDccrn
from idccrn_vae_tpu.models.nsvae import NsvaeEncoder
from idccrn_vae_tpu.models.vae import VaeDecoder, VaeEncoder

FS = 16000
TINY = DccrnConfig(
    encoder_channels=(1, 2, 2, 4, 4, 4, 4),
    zdim=4,
    num_samples=2,
    causal=True,
)


def _mk_pairs(tmp_path, n=3):
    rng = np.random.default_rng(0)
    noisy_paths, clean_paths = [], []
    for i in range(n):
        dur = 1500 + 700 * i
        t = np.arange(dur) / FS
        clean = 0.3 * np.sin(2 * np.pi * 300 * t).astype(np.float32)
        noisy = clean + 0.1 * rng.standard_normal(dur).astype(np.float32)
        cp = str(tmp_path / f"clean_fileid_{i}.wav")
        npth = str(tmp_path / f"noisy_fileid_{i}.wav")
        write_wav(cp, clean, FS)
        write_wav(npth, noisy, FS)
        clean_paths.append(cp)
        noisy_paths.append(npth)
    return noisy_paths, clean_paths


def test_run_enhancement_eval(tmp_path):
    noisy_paths, clean_paths = _mk_pairs(tmp_path)
    enc = NsvaeEncoder(TINY)
    dec = VaeDecoder(TINY)
    e = Enhancer(TINY, TINY, enc.init(jax.random.PRNGKey(0)),
                 dec.init(jax.random.PRNGKey(1)), num_samples=2,
                 bucket_frames=20)
    out_dir = str(tmp_path / "eval_out")
    res = run_enhancement_eval(e, noisy_paths, clean_paths, out_dir,
                               batch_size=2, write_wavs=True)
    assert "summary" in res and "delta" in res
    # metric provenance is tagged in the result AND the written summary
    # (native vs package scores must never be conflated across images)
    assert res["provenance"]["pesq_impl"] in ("native", "itu")
    assert res["provenance"]["stoi_impl"] in ("native", "pystoi")
    assert os.path.exists(os.path.join(out_dir, "per_utterance.json"))
    assert os.path.exists(os.path.join(out_dir, "summary.json"))
    with open(os.path.join(out_dir, "summary.json")) as f:
        assert "provenance" in json.load(f)
    assert len(os.listdir(os.path.join(out_dir, "enhanced"))) == 3
    with open(os.path.join(out_dir, "per_utterance.json")) as f:
        per = json.load(f)
    assert len(per) == 3
    for v in per.values():
        assert np.isfinite(v["sisdr"])


def test_run_vae_reconstruction_eval(tmp_path):
    _noisy, clean_paths = _mk_pairs(tmp_path)
    enc, dec = VaeEncoder(TINY), VaeDecoder(TINY)
    out_dir = str(tmp_path / "prevae_out")
    res = run_vae_reconstruction_eval(
        enc, dec, enc.init(jax.random.PRNGKey(0)),
        dec.init(jax.random.PRNGKey(1)), clean_paths, out_dir, TINY,
        num_samples=2, batch_size=2,
    )
    assert "latent_diag" in res
    assert res["provenance"]["pesq_impl"] in ("native", "itu")
    with open(os.path.join(out_dir, "summary.json")) as f:
        assert "provenance" in json.load(f)
    assert os.path.exists(os.path.join(out_dir, "cov_mu_diag.png"))


def test_run_supervised_eval(tmp_path):
    noisy_paths, clean_paths = _mk_pairs(tmp_path)
    model = SupervisedDccrn(TINY)
    v = model.init(jax.random.PRNGKey(0))
    out_dir = str(tmp_path / "sup_out")
    res = run_supervised_eval(model, v, noisy_paths, clean_paths, out_dir,
                              TINY, batch_size=2)
    assert len(res["per_utterance"]) == 3
    assert res["provenance"]["stoi_impl"] in ("native", "pystoi")
    with open(os.path.join(out_dir, "summary.json")) as f:
        assert "provenance" in json.load(f)


def test_posterior_distance():
    from idccrn_vae_tpu.eval.diagnostics import posterior_distance

    rng = np.random.default_rng(0)
    a = rng.standard_normal((5, 4, 2))
    assert posterior_distance(a, a) == 0.0
    b = a + 1.0
    d = posterior_distance(a, b)
    # each (H,2) entry differs by exactly 1 -> sqrt(sum over 8 ones)
    np.testing.assert_allclose(d, np.sqrt(8.0))
    # log-sigma mode exponentiates real part only
    d2 = posterior_distance(a, a, is_logsigma=True)
    assert d2 == 0.0


def test_score_pairs_threaded_matches_serial():
    from idccrn_vae_tpu.eval.runners import score_pairs

    rng = np.random.default_rng(0)
    fs = 16000
    t = np.arange(2 * fs) / fs
    refs = [(0.3 * np.sin(2 * np.pi * (200 + 9 * i) * t)).astype(np.float32)
            for i in range(6)]
    ests = [(r + 0.05 * rng.standard_normal(len(r))).astype(np.float32)
            for r in refs]
    names = [f"u{i}" for i in range(6)]
    serial = score_pairs(ests, refs, names, fs, workers=1)
    threaded = score_pairs(ests, refs, names, fs, workers=4)
    assert serial == threaded
    assert list(threaded) == names  # insertion order preserved


def test_utt_names_disambiguates_duplicates():
    """Recursive corpora can repeat basenames across subdirs; per-utt
    keys and enhanced-wav names must not silently collide."""
    from idccrn_vae_tpu.eval.runners import utt_names

    assert utt_names(["a/x.wav", "b/y.wav"]) == ["x.wav", "y.wav"]
    names = utt_names(["spk1/x.wav", "spk2/x.wav", "spk1/y.wav"])
    assert len(set(names)) == 3
    assert names == ["spk1__x.wav", "spk2__x.wav", "y.wav"]
    # same basename AND same parent dir name -> index suffix fallback
    names = utt_names(["r/d/x.wav", "s/d/x.wav"])
    assert len(set(names)) == 2
