"""AOT serving export (eval/export.py): round-trip parity with the live
model, symbolic-batch reuse, and the CLI end to end."""

import json
import os

import numpy as np

import jax

from idccrn_vae_tpu.models.config import DccrnConfig
from tests.test_cli import corpus  # noqa: F401  (pytest fixture)

TINY = dict(encoder_channels=(1, 2, 2, 4, 4, 4, 4), zdim=4,
            num_samples=1, latent_num=1, causal=True)
LEN = 4800  # 0.3 s


def _tiny_enhancer():
    from idccrn_vae_tpu.eval.enhance import Enhancer

    cfg = DccrnConfig(**TINY)
    from idccrn_vae_tpu.models.nsvae import NsvaeEncoder
    from idccrn_vae_tpu.models.vae import VaeDecoder

    enc_vars = NsvaeEncoder(cfg).init(jax.random.PRNGKey(0))
    dec_vars = VaeDecoder(cfg).init(jax.random.PRNGKey(1))
    return Enhancer(cfg, cfg, enc_vars, dec_vars, num_samples=1,
                    outtype="clean_direct", latent_to_use=1, pad_mode="sig")


def test_export_round_trip_matches_live_model(tmp_path):
    from idccrn_vae_tpu.eval.export import (
        export_serving,
        load_artifact,
        save_artifact,
        serving_fn_nsvae,
    )

    enhancer = _tiny_enhancer()
    fn = serving_fn_nsvae(enhancer)
    exported = export_serving(fn, LEN)
    save_artifact(str(tmp_path), exported, {"fs": 16000, "length": LEN})

    call, meta = load_artifact(str(tmp_path))
    assert meta["length"] == LEN
    assert "cpu" in meta["platforms"] and "tpu" in meta["platforms"]

    wav = (np.random.default_rng(0)
           .standard_normal((3, LEN)).astype(np.float32) * 0.1)
    raw_key = np.asarray(jax.random.key_data(jax.random.PRNGKey(7)),
                         np.uint32)
    out_art = np.asarray(call(wav, raw_key))
    out_live = np.asarray(fn(wav, raw_key))
    np.testing.assert_allclose(out_art, out_live, atol=1e-6)

    # symbolic batch: same artifact serves a different batch size
    out_b1 = np.asarray(call(wav[:1], raw_key))
    assert out_b1.shape == (1, LEN)
    np.testing.assert_allclose(out_b1[0], out_art[0], atol=1e-5)


def test_export_supervised_round_trip(tmp_path):
    from idccrn_vae_tpu.eval.export import (
        export_serving,
        load_artifact,
        save_artifact,
        serving_fn_supervised,
    )
    from idccrn_vae_tpu.models.dccrn import SupervisedDccrn

    cfg = DccrnConfig(**{**TINY, "recon_type": "mask"})
    model = SupervisedDccrn(cfg)
    variables = model.init(jax.random.PRNGKey(0))
    fn = serving_fn_supervised(model, variables)
    exported = export_serving(fn, LEN)
    save_artifact(str(tmp_path), exported, {"fs": 16000, "length": LEN})
    call, _meta = load_artifact(str(tmp_path))

    wav = (np.random.default_rng(1)
           .standard_normal((2, LEN)).astype(np.float32) * 0.1)
    out_art = np.asarray(call(wav))  # raw_key optional for supervised
    (recon, _pred), _ = model.apply(variables, wav, train=False)
    np.testing.assert_allclose(out_art, np.asarray(recon), atol=1e-6)


def test_streaming_export_round_trip(tmp_path):
    from idccrn_vae_tpu.eval.export import (
        export_streaming,
        load_streaming_artifact,
        save_streaming_artifact,
    )
    from idccrn_vae_tpu.eval.streaming import StreamingEnhancer

    enhancer = _tiny_enhancer()
    streamer = StreamingEnhancer(enhancer.enc_cfg, enhancer.dec_cfg,
                                 enhancer.enc_vars, enhancer.dec_vars,
                                 chunk_frames=8)
    exported, spec = export_streaming(streamer, batch=1)
    save_streaming_artifact(str(tmp_path), exported, spec,
                            {"fs": 16000,
                             "chunk_samples": streamer.chunk_samples})

    step, init_state, meta = load_streaming_artifact(str(tmp_path))
    m = meta["chunk_samples"]
    assert m == streamer.chunk_samples

    wav = (np.random.default_rng(0)
           .standard_normal((1, 4 * m)).astype(np.float32) * 0.1)
    ref = streamer.stream(wav)
    state = init_state()
    outs = []
    for k in range(4):
        out, state = step(state, wav[:, k * m : (k + 1) * m])
        outs.append(np.asarray(out))
    got = np.concatenate(outs, axis=1)
    np.testing.assert_array_equal(got, ref)  # bit-exact


def test_export_model_cli(corpus, monkeypatch):  # noqa: F811
    from idccrn_vae_tpu.data.audio_io import write_wav
    from tests.test_cli import TINY_FLAGS, _latest_model_dir, _write_ini

    # minimal supervised checkpoint on the shared corpus fixture
    rng = np.random.default_rng(0)
    tmp_path, dirs = corpus
    monkeypatch.chdir(tmp_path)
    ini = _write_ini(tmp_path, dirs, name="exp")
    from idccrn_vae_tpu.cli.train_supervised import main as train_main

    train_main(["--cfg_file", ini, *TINY_FLAGS])
    mdir = _latest_model_dir(tmp_path)

    from idccrn_vae_tpu.cli.export_model import main as export_main

    # two bucket lengths; 0.13 s also proves the hop-multiple rounding
    # (2080 samples -> 2000)
    out_dir = str(tmp_path / "artifact")
    export_main(["--model", "supervised", "--model_dir", mdir,
                 "--out_dir", out_dir, "--seconds", "0.13,0.25"])
    assert os.path.exists(os.path.join(out_dir, "enhance_2000.jaxexp"))
    assert os.path.exists(os.path.join(out_dir, "enhance_4000.jaxexp"))
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    assert meta["length"] == 4000
    assert [b["length"] for b in meta["buckets"]] == [2000, 4000]

    from idccrn_vae_tpu.eval.export import load_artifact

    call, _ = load_artifact(out_dir)
    wav = rng.standard_normal((2, 4000)).astype(np.float32) * 0.1
    out = np.asarray(call(wav))
    assert out.shape == (2, 4000)
    assert np.isfinite(out).all()

    # intermediate length: padded to the smallest covering bucket (4000)
    # and trimmed back; short length: served by the 2000 bucket
    out_mid = np.asarray(call(wav[:, :3000]))
    assert out_mid.shape == (2, 3000)
    out_short = np.asarray(call(wav[:, :1500]))
    assert out_short.shape == (2, 1500)
    # over-long input must be rejected (run_artifact windows it instead)
    import pytest

    with pytest.raises(ValueError, match="largest artifact bucket"):
        call(np.zeros((1, 5000), np.float32))

    # streaming artifact via the CLI (supervised is causal here) — into
    # the SAME directory as the offline buckets: the split meta files
    # (meta.json / stream_meta.json) must coexist without clobbering
    export_main(["--model", "supervised", "--model_dir", mdir,
                 "--out_dir", out_dir, "--streaming",
                 "--chunk_frames", "8"])
    from idccrn_vae_tpu.eval.export import load_streaming_artifact

    step, init_state, smeta = load_streaming_artifact(out_dir)
    assert smeta["chunk_samples"] == 800
    state = init_state()
    out, state = step(state, np.zeros((1, 800), np.float32))
    assert np.asarray(out).shape == (1, 800)
    # the offline artifact set is still fully loadable after the
    # streaming export wrote into the same directory
    call2, meta2 = load_artifact(out_dir)
    assert [b["length"] for b in meta2["buckets"]] == [2000, 4000]
    assert np.asarray(call2(wav[:1])).shape == (1, 4000)

    # unsupported streaming flag combos fail fast instead of exporting
    # an artifact that silently computes something else
    with pytest.raises(SystemExit, match="clean_direct latent-1"):
        export_main(["--model", "nsvae", "--nsvae_dir", "unused",
                     "--out_dir", out_dir, "--streaming",
                     "--outtype", "complex_mask", "--latent_to_use", "2"])
    # --seconds shapes offline buckets only; combined with --streaming it
    # is rejected rather than silently dropped (ADVICE r2)
    with pytest.raises(SystemExit, match="offline bucket export"):
        export_main(["--model", "supervised", "--model_dir", mdir,
                     "--out_dir", out_dir, "--streaming",
                     "--chunk_frames", "8", "--seconds", "1,3,10"])

    # serve from the artifact alone (no checkpoint / model code);
    # include one wav LONGER than the max bucket -> windowed 4000+4000+
    # 1500, the 1500 tail riding the small bucket
    write_wav(os.path.join(dirs["noisy_val"], "noisy_fileid_long.wav"),
              (0.1 * rng.standard_normal(9500)).astype(np.float32), 16000)
    from idccrn_vae_tpu.cli.run_artifact import main as serve_main

    served = str(tmp_path / "served")
    serve_main(["--artifact_dir", out_dir, "--in_dir", dirs["noisy_val"],
                "--out_dir", served])
    from idccrn_vae_tpu.data.audio_io import read_wav

    # wavs only: the corpus dir also holds the segment-index cache json
    for name in (f for f in os.listdir(dirs["noisy_val"])
                 if f.endswith(".wav")):
        enhanced, fs = read_wav(os.path.join(served, name))
        original, _ = read_wav(os.path.join(dirs["noisy_val"], name))
        assert fs == 16000 and len(enhanced) == len(original)
        assert np.isfinite(enhanced).all()
