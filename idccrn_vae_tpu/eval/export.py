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
    enhanced wav, with all weights captured as constants. The math is
    Enhancer.forward — the live and exported programs share one body,
    so they cannot diverge."""

    def fn(wav, raw_key):
        rng = jax.random.wrap_key_data(raw_key.astype(jnp.uint32))
        return enhancer.forward(enhancer.enc_vars, enhancer.dec_vars,
                                enhancer.noise_dec_vars, wav, rng)

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


def export_streaming(streamer, batch: int = 1, platforms=("cpu", "tpu")):
    """Export a StreamingEnhancer's chunk step as a standalone artifact.

    The carried StreamState is passed as a FLAT LIST of arrays (packed/
    unpacked inside the exported program), so the consumer needs neither
    this package nor the NamedTuple class: the initial state is just
    zeros of the shapes recorded in meta. Returns (exported, state_spec)
    where state_spec = [(shape, dtype_name), ...]."""
    state0 = streamer.init_state(batch)
    flat, treedef = jax.tree.flatten(state0)

    def step(flat_state, chunk):
        state = jax.tree.unflatten(treedef, flat_state)
        out, new_state = streamer._chunk_step(
            streamer.enc_vars, streamer.dec_vars, state, chunk)
        return out, jax.tree.flatten(new_state)[0]

    specs = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in flat]
    chunk_spec = jax.ShapeDtypeStruct((batch, streamer.chunk_samples),
                                      jnp.float32)
    exported = jexport.export(jax.jit(step), platforms=list(platforms))(
        specs, chunk_spec)
    state_spec = [(list(l.shape), np.dtype(l.dtype).name) for l in flat]
    return exported, state_spec


STREAM_ARTIFACT_NAME = "stream_step.jaxexp"
STREAM_META_NAME = "stream_meta.json"


def save_streaming_artifact(out_dir: str, exported, state_spec,
                            meta: dict) -> str:
    """Streaming meta lives in its own file (STREAM_META_NAME) so an
    offline and a streaming export of the same model can share one
    artifact directory without clobbering each other's meta.json."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, STREAM_ARTIFACT_NAME)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    meta = dict(meta)
    meta["artifact"] = STREAM_ARTIFACT_NAME
    meta["state_spec"] = state_spec
    meta["calling_convention"] = (
        "(state: [arrays per state_spec], chunk[batch, chunk_samples] "
        "f32) -> (out[batch, chunk_samples], new_state)")
    meta["platforms"] = list(exported.platforms)
    with open(os.path.join(out_dir, STREAM_META_NAME), "w") as f:
        json.dump(meta, f, indent=1)
    return path


def load_streaming_artifact(artifact_dir: str):
    """(step, init_state, meta): a real-time enhancement loop with jax
    alone. state = init_state(); out, state = step(state, chunk)."""
    meta_path = os.path.join(artifact_dir, STREAM_META_NAME)
    if not os.path.exists(meta_path):  # pre-split-meta artifacts
        meta_path = os.path.join(artifact_dir, META_NAME)
    with open(meta_path) as f:
        meta = json.load(f)
    with open(os.path.join(artifact_dir, meta["artifact"]), "rb") as f:
        exported = jexport.deserialize(f.read())

    def init_state():
        return [np.zeros(shape, dtype) for shape, dtype in
                meta["state_spec"]]

    def step(state, chunk):
        return exported.call(state, jnp.asarray(chunk, jnp.float32))

    return step, init_state, meta


def save_artifact(out_dir: str, exported, meta: dict) -> str:
    """Single-bucket convenience wrapper over save_artifacts."""
    length = int(meta["length"])
    return save_artifacts(out_dir, {length: exported}, meta)


def save_artifacts(out_dir: str, exports: dict, meta: dict) -> str:
    """Write one serialized artifact per bucket length ({L: Exported})
    plus a meta.json describing the bucket set. meta['length'] is set to
    the LARGEST bucket (the windowing width for over-long utterances);
    meta['artifact'] keeps the single-bucket key for compatibility."""
    os.makedirs(out_dir, exist_ok=True)
    meta = dict(meta)
    buckets = []
    for length in sorted(exports):
        name = (ARTIFACT_NAME if len(exports) == 1
                else f"enhance_{length}.jaxexp")
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exports[length].serialize())
        buckets.append({"length": int(length), "artifact": name})
    meta["buckets"] = buckets
    meta["length"] = buckets[-1]["length"]
    meta["artifact"] = buckets[-1]["artifact"]
    meta["calling_convention"] = "(wav[b, length] f32, raw_key[2] u32)"
    meta["platforms"] = list(next(iter(exports.values())).platforms)
    with open(os.path.join(out_dir, META_NAME), "w") as f:
        json.dump(meta, f, indent=1)
    return os.path.join(out_dir, buckets[-1]["artifact"])


def load_artifact(artifact_dir: str):
    """(callable, meta): callable(wav, raw_key) -> enhanced wavs.
    Needs only jax — no model code, config, or checkpoint.

    Any input length up to the largest bucket is accepted: the call
    zero-pads to the smallest covering bucket and trims the output back
    (exactly what the live Enhancer's length bucketing does). Longer
    input raises — window it to meta['length'] (see cli/run_artifact)."""
    with open(os.path.join(artifact_dir, META_NAME)) as f:
        meta = json.load(f)
    buckets = meta.get("buckets",
                       [{"length": meta["length"],
                         "artifact": meta["artifact"]}])
    loaded = []
    for b in buckets:
        with open(os.path.join(artifact_dir, b["artifact"]), "rb") as f:
            loaded.append((int(b["length"]), jexport.deserialize(f.read())))
    loaded.sort()
    max_len = loaded[-1][0]

    def call(wav, raw_key=None):
        if raw_key is None:
            raw_key = np.zeros((2,), np.uint32)
        wav = jnp.asarray(wav, jnp.float32)
        n = wav.shape[1]
        if n > max_len:
            raise ValueError(
                f"input length {n} exceeds the largest artifact bucket "
                f"{max_len}; window the signal (cli/run_artifact does)")
        length, exported = next(le for le in loaded if le[0] >= n)
        if n < length:
            wav = jnp.pad(wav, ((0, 0), (0, length - n)))
        out = exported.call(wav, jnp.asarray(raw_key, jnp.uint32))
        return out[:, :n]

    return call, meta
