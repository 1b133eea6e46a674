"""Ahead-of-time model export for deployment (jax.export / StableHLO).

Beyond the reference surface: the reference deploys by shipping the
Python codebase plus a .pt state_dict and re-running the torch modules
(test_nsvae_se.py rebuilds the nn.Modules from config + dir-name
parsing). Here the ENTIRE serving program — STFT -> NSVAE encoder ->
latent -> decoder -> ISTFT, weights baked in as constants — exports to
one serialized StableHLO artifact that any JAX runtime can execute
without this package, the checkpoint, or the model code:

    exp = export_serving(fn, length)         # symbolic batch dim
    save_artifact(dir, exp, meta)            # enhance.jaxexp + meta.json
    call, meta = load_artifact(dir)          # no model code needed
    out = call(wav_batch, raw_key)

The batch dimension is symbolic (any B at runtime, no re-export); the
utterance length is fixed per artifact (the STFT frame indexing is
shape-specialized — export several lengths for bucketed serving, as
eval/enhance.py does with jit caches). Artifacts are lowered for BOTH
cpu and tpu platforms, so an artifact exported on a CPU host runs on
TPU serving nodes unchanged.

The exported callable takes a RAW uint32 key of shape (2,) rather than
a typed jax PRNG key, so consumers need no jax.random plumbing:
`jax.random.key_data(key)` on the producer side, any uint32 pair on the
consumer side.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

ARTIFACT_NAME = "enhance.jaxexp"
META_NAME = "meta.json"


def serving_fn_nsvae(enhancer):
    """Serving closure over an eval.enhance.Enhancer: (wav, raw_key) ->
    enhanced wav, with all weights captured as constants."""
    from idccrn_vae_tpu.eval.enhance import _sample_mean, combine_outputs
    from idccrn_vae_tpu.models.nsvae import split_noisy_skips
    from idccrn_vae_tpu.ops.stft import istft

    s = enhancer.enc_cfg.stft

    def fn(wav, raw_key):
        rng = jax.random.wrap_key_data(raw_key.astype(jnp.uint32))
        out, _ = enhancer.encoder.apply(
            enhancer.enc_vars, wav, train=False, rng=rng,
            num_samples=enhancer.num_samples)
        skips = split_noisy_skips(out.skips, enhancer.enc_cfg, "speech")
        (recon, pred_s), _ = enhancer.decoder.apply(
            enhancer.dec_vars, out.stft_x, out.z_speech, skips,
            train=False, num_samples=enhancer.num_samples,
            pad_mode=enhancer.pad_mode)
        if enhancer.outtype == "clean_direct":
            return _sample_mean(recon, enhancer.num_samples)
        nskips = split_noisy_skips(out.skips, enhancer.enc_cfg, "noise")
        (_rn, pred_n), _ = enhancer.noise_decoder.apply(
            enhancer.noise_dec_vars, out.stft_x, out.z_noise, nskips,
            train=False, num_samples=enhancer.num_samples,
            pad_mode=enhancer.pad_mode)
        est = combine_outputs(enhancer.outtype, pred_s, pred_n, out.stft_x,
                              enhancer.num_samples)
        return istft(est, s.n_fft, s.hop, s.win_length)

    return fn


def serving_fn_supervised(model, variables):
    """Serving closure over a SupervisedDccrn; the raw_key argument is
    accepted (uniform artifact signature) but unused."""

    def fn(wav, raw_key):
        del raw_key
        (recon, _pred), _ = model.apply(variables, wav, train=False)
        return recon

    return fn


def export_serving(fn, length: int, platforms=("cpu", "tpu")):
    """Export fn(wav (b, length) f32, raw_key (2,) u32) with a symbolic
    batch dimension, lowered for every platform in `platforms`."""
    (b,) = jexport.symbolic_shape("b")
    wav_spec = jax.ShapeDtypeStruct((b, length), jnp.float32)
    key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
    return jexport.export(jax.jit(fn), platforms=list(platforms))(
        wav_spec, key_spec)


def save_artifact(out_dir: str, exported, meta: dict) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, ARTIFACT_NAME)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    meta = dict(meta)
    meta["artifact"] = ARTIFACT_NAME
    meta["calling_convention"] = "(wav[b, length] f32, raw_key[2] u32)"
    meta["platforms"] = list(exported.platforms)
    with open(os.path.join(out_dir, META_NAME), "w") as f:
        json.dump(meta, f, indent=1)
    return path


def load_artifact(artifact_dir: str):
    """(callable, meta): callable(wav, raw_key) -> enhanced wavs.
    Needs only jax — no model code, config, or checkpoint."""
    with open(os.path.join(artifact_dir, META_NAME)) as f:
        meta = json.load(f)
    with open(os.path.join(artifact_dir, meta["artifact"]), "rb") as f:
        exported = jexport.deserialize(f.read())

    def call(wav, raw_key=None):
        if raw_key is None:
            raw_key = np.zeros((2,), np.uint32)
        return exported.call(jnp.asarray(wav, jnp.float32),
                             jnp.asarray(raw_key, jnp.uint32))

    return call, meta
