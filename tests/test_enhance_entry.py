"""Enhancer + graft entry smoke tests (tiny geometry, CPU)."""

import dataclasses

import jax
import numpy as np

from idccrn_vae_tpu.eval.enhance import Enhancer
from idccrn_vae_tpu.models.config import DccrnConfig
from idccrn_vae_tpu.models.nsvae import NsvaeEncoder
from idccrn_vae_tpu.models.vae import VaeDecoder

TINY = DccrnConfig(
    encoder_channels=(1, 2, 2, 4, 4, 4, 4),
    zdim=4,
    num_samples=2,
    causal=True,
)


def _enhancer(latent_num=1, outtype="clean_direct", channel_mode="normal",
              latent_to_use=None, num_samples=2, sample_chunks=1):
    enc_cfg = dataclasses.replace(TINY, latent_num=latent_num,
                                  channel_mode=channel_mode)
    enc = NsvaeEncoder(enc_cfg)
    dec = VaeDecoder(TINY)
    ev = enc.init(jax.random.PRNGKey(0))
    dv = dec.init(jax.random.PRNGKey(1))
    nv = dec.init(jax.random.PRNGKey(2)) if latent_num == 2 else None
    if latent_to_use is None:
        latent_to_use = latent_num
    return Enhancer(enc_cfg, TINY, ev, dv, nv, num_samples=num_samples,
                    outtype=outtype, latent_to_use=latent_to_use,
                    bucket_frames=10, sample_chunks=sample_chunks)


def test_bucket_length():
    e = _enhancer()
    assert e.bucket_length(999) == 1000  # 10 frames -> bucket 10
    assert e.bucket_length(1000) == 2000  # 11 frames -> bucket 20


def test_enhance_utterances_variable_length():
    e = _enhancer()
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(n).astype(np.float32) * 0.1
            for n in (1500, 2100, 900)]
    outs = e.enhance_utterances(wavs, batch_size=2)
    assert len(outs) == 3
    for w, o in zip(wavs, outs):
        assert o.ndim == 1 and len(o) <= len(w)
        assert np.isfinite(o).all()
    # bucketing keeps the compiled-shape count small (jax.jit caches one
    # executable per input shape on the single wrapper): sorted
    # 2-utterance chunks land in <=2 distinct buckets
    order = sorted(len(w) for w in wavs)
    sizes = {e.bucket_length(max(order[i:i + 2]))
             for i in range(0, len(order), 2)}
    assert len(sizes) <= 2


def test_outtypes_latent2():
    for outtype in ("clean_direct", "real_imag_mask", "complex_mask",
                    "phase_mask"):
        e = _enhancer(latent_num=2, outtype=outtype, channel_mode="double")
        wav = np.random.default_rng(1).standard_normal((2, 2000)).astype(
            np.float32) * 0.1
        out = e.enhance_batch(wav)
        assert out.shape[0] == 2
        assert np.isfinite(out).all()


def test_padded_bucket_vs_solo_equivalence():
    """Zero-padding an utterance up to a bucket length must not change
    the valid region (eval bucketing, enhance.py). Causal configs are
    exact up to the STFT reflect-pad tail; non-causal convs look one
    frame ahead per stage (kernel time 2, pad 0), so the deviation is
    confined to the last num_stages extra frames — pinned here with a
    deterministic SupervisedDccrn forward."""
    from idccrn_vae_tpu.models.dccrn import SupervisedDccrn

    hop, win, nfft = TINY.stft.hop, TINY.stft.win_length, TINY.stft.n_fft
    n_valid, n_pad = 4000, 8000
    wav = np.random.default_rng(7).standard_normal(n_valid).astype(
        np.float32) * 0.1
    padded = np.zeros(n_pad, np.float32)
    padded[:n_valid] = wav

    # frames touching the reflect-pad/window tail differ regardless of
    # causality; non-causal adds num_stages frames of conv lookahead.
    stft_tail = (nfft // 2 + win) // hop + 1
    for causal, extra in ((True, 0), (False, TINY.num_stages)):
        cfg = dataclasses.replace(TINY, causal=causal, recon_type="mask")
        model = SupervisedDccrn(cfg)
        variables = model.init(jax.random.PRNGKey(0))
        (solo, _), _ = model.apply(variables, wav[None], train=False)
        (pad, _), _ = model.apply(variables, padded[None], train=False)
        tail = (stft_tail + extra) * hop
        n_cmp = n_valid - tail
        np.testing.assert_allclose(
            np.asarray(pad)[0, :n_cmp], np.asarray(solo)[0, :n_cmp],
            atol=1e-5,
            err_msg=f"causal={causal}: padded bucket changed the valid "
                    f"region outside the {tail}-sample tail")


def test_latent_to_use_validation():
    """latent_to_use x outtype routing mirrors test_nsvae_se.py:333-412:
    masks need latent 2; latent 2 needs a dual-latent encoder AND a
    noise decoder — inconsistent combos error instead of silently
    re-keying on outtype."""
    import pytest

    # latent 1 + mask outtype: reference has no such branch
    with pytest.raises(ValueError, match="latent_to_use=2"):
        _enhancer(latent_num=2, outtype="complex_mask", latent_to_use=1,
                  channel_mode="double")
    # latent 2 on a single-latent encoder
    with pytest.raises(ValueError, match="dual-latent"):
        _enhancer(latent_num=1, outtype="clean_direct", latent_to_use=2)
    # latent 2 without noise decoder weights
    enc_cfg = dataclasses.replace(TINY, latent_num=2)
    enc = NsvaeEncoder(enc_cfg)
    dec = VaeDecoder(TINY)
    with pytest.raises(ValueError, match="noise decoder"):
        Enhancer(enc_cfg, TINY, enc.init(jax.random.PRNGKey(0)),
                 dec.init(jax.random.PRNGKey(1)), None,
                 outtype="clean_direct", latent_to_use=2)
    # valid: latent 1 clean_direct on a dual-latent encoder
    e = _enhancer(latent_num=2, outtype="clean_direct", latent_to_use=1,
                  channel_mode="double")
    wav = np.random.default_rng(3).standard_normal((1, 1000)).astype(
        np.float32) * 0.1
    assert np.isfinite(e.enhance_batch(wav)).all()


def test_graft_entry_compiles():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_latent_diag_and_mesh():
    from idccrn_vae_tpu.parallel.mesh import make_mesh

    e = _enhancer(latent_num=2, channel_mode="double")
    e.mesh = make_mesh(2)
    rng = np.random.default_rng(2)
    wavs = [rng.standard_normal(1500).astype(np.float32) * 0.1
            for _ in range(2)]
    speech, noise = e.encode_latents(wavs, batch_size=2)
    assert len(speech) == 2 and len(noise) == 2
    assert speech[0].shape[-1] == 2  # (T, zdim, 2)
    out = e.enhance_utterances(wavs, batch_size=2)
    assert len(out) == 2


def test_mesh_partial_batch_and_latent_trim():
    """(1) A final chunk smaller than the mesh pads with zero rows and
    trims them back (NamedSharding needs batch % mesh == 0); (2)
    encode_latents trims each mu to the utterance's real frame count so
    padded-silence frames can't bias the diagnostics."""
    from idccrn_vae_tpu.parallel.mesh import make_mesh

    e = _enhancer(latent_num=1)
    e.mesh = make_mesh(2)
    hop = e.enc_cfg.stft.hop
    rng = np.random.default_rng(3)
    # 3 utterances, batch_size 2 -> final chunk of 1 row on a 2-mesh
    wavs = [rng.standard_normal(n).astype(np.float32) * 0.1
            for n in (900, 1500, 2100)]
    out = e.enhance_utterances(wavs, batch_size=2)
    assert [len(o) for o in out] == [len(w) for w in wavs]
    speech, _ = e.encode_latents(wavs, batch_size=2)
    assert sorted(m.shape[0] for m in speech) == sorted(
        n // hop + 1 for n in (900, 1500, 2100))


def test_sample_chunked_decode_matches_unchunked():
    """sample_chunks decodes S samples in sequential chunks with the
    SAME outputs — the memory knob must not change the math, for both
    the clean_direct mean and the mask-combination out-types."""
    wav = np.random.default_rng(9).standard_normal((2, 2000)).astype(
        np.float32) * 0.1
    for outtype, latent_num, kw in (
            ("clean_direct", 1, {}),
            ("complex_mask", 2, {"latent_to_use": 2,
                                 "channel_mode": "double"})):
        full = _enhancer(latent_num=latent_num, outtype=outtype,
                         num_samples=4, **kw)
        chunked = _enhancer(latent_num=latent_num, outtype=outtype,
                            num_samples=4, sample_chunks=2, **kw)
        # identical weights: re-init with the same seeds
        chunked.enc_vars = full.enc_vars
        chunked.dec_vars = full.dec_vars
        chunked.noise_dec_vars = full.noise_dec_vars
        rng = jax.random.PRNGKey(3)
        np.testing.assert_allclose(
            full.enhance_batch(wav, rng), chunked.enhance_batch(wav, rng),
            atol=1e-5, rtol=1e-4)
    import pytest

    with pytest.raises(ValueError, match="sample_chunks"):
        _enhancer(latent_num=1, num_samples=4, sample_chunks=3)
