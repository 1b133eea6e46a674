#!/usr/bin/env python
"""Training-step deep-dive (VERDICT r3 next-#5): forward / backward /
optimizer wall breakdown of the pretrain step at its production sweet
spot (B=16, bf16, reference geometry — 312 ms/step in TRAIN_BENCH.json),
XLA-cost-analysis FLOPs -> train-step MFU, per-component fwd/bwd
timings (encoder vs decoder), and cheap what-if probes (LSTM scan
unroll, state donation).

Methodology per CLAUDE.md: device-resident inputs, every timed window
preceded AND terminated by a SCALAR FETCH (block_until_ready through
the tunnel can return early); nothing else running on the host.

Writes PROFILE_TRAIN.json and prints one summary table.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from idccrn_vae_tpu.losses.vae_loss import (  # noqa: E402
    PretrainVaeLoss,
    kl_annealing_schedule,
)
from idccrn_vae_tpu.models.config import DccrnConfig  # noqa: E402
from idccrn_vae_tpu.train.pretrain import PretrainTrainer, tile_samples  # noqa: E402

FS = 16000
SECONDS = 3.0
L = int(SECONDS * FS)
B = 16
NS = 5
PEAK_BF16 = 197e12  # v5e MXU peak
STEPS = 8


def scalar_fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def time_program(fn, *args, steps=STEPS, chain_state=False):
    """Warm (compile+settle), scalar-fetch barrier, timed window of
    `steps` dispatches, scalar-fetch to close. Returns seconds/step.

    chain_state rebinds the returned state EVERYWHERE (including the
    warm-up) so donated input buffers are never reused."""
    if chain_state:
        state = args[0]
        for _ in range(2):  # compile + settle
            state, m = fn(state, *args[1:])
        scalar_fetch(m["total"])
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = fn(state, *args[1:])
        scalar_fetch(m["total"])
    else:
        out = fn(*args)
        out = fn(*args)  # settle
        scalar_fetch(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        scalar_fetch(out)
    return (time.perf_counter() - t0) / steps


def flops_of(jitted, *args):
    """XLA cost-analysis FLOPs of the compiled program (best effort)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", float("nan")))
    except Exception as e:  # noqa: BLE001
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)
        return float("nan")


def main():
    global B, STEPS
    # persistent compile cache: flops_of() re-lowers programs the timing
    # path already compiled — without the cache that doubles the
    # multi-minute remote compiles
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_profile"))
    global L, SECONDS
    tiny = os.environ.get("PROFILE_TRAIN_TINY") == "1"
    if tiny:  # CPU smoke mode: exercises every program, numbers moot
        jax.config.update("jax_platforms", "cpu")
        B, STEPS, L, SECONDS = 8, 2, FS, 1.0  # 1 s utterances
    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = (DccrnConfig(causal=True, zdim=4, num_samples=NS,
                       encoder_channels=(1, 2, 2, 4, 4, 4, 4),
                       lstm_hidden=4, compute="bf16") if tiny else
           DccrnConfig(causal=True, zdim=128, num_samples=NS,
                       compute="bf16"))
    loss = PretrainVaeLoss(kl_annealing_schedule(20), 1.0, num_samples=NS)
    tr = PretrainTrainer(cfg, loss, 1e-3)
    state = tr.init_state()
    rng = jax.random.PRNGKey(0)
    kl_w = jnp.asarray(0.01, jnp.float32)
    wav = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((B, L)).astype(np.float32) * 0.1)

    # -- the three nested programs: fwd ⊂ fwd+bwd ⊂ full step ------------
    def loss_fn(params, stats, wav, rng, kl_w):
        out, recon, predict, wav_t, stft_t, es, ds = tr._forward(
            params["enc"], params["dec"], stats["enc"], stats["dec"],
            wav, rng, train=True)
        lo = tr.loss(wav_t, recon, stft_t, predict, out.gauss, out.z, kl_w)
        return lo.total, (es, ds)

    stats = {"enc": state["enc"]["stats"], "dec": state["dec"]["stats"]}
    params = {"enc": state["enc"]["params"], "dec": state["dec"]["params"]}

    fwd = jax.jit(lambda p, s, w, r, k: loss_fn(p, s, w, r, k)[0])
    fwdbwd_impl = jax.grad(loss_fn, has_aux=True)

    @jax.jit
    def fwdbwd(p, s, w, r, k):
        g, _aux = fwdbwd_impl(p, s, w, r, k)
        # one scalar derived from every grad tree leaf: nothing the
        # backward produces can be dead-code-eliminated
        return sum(jnp.sum(x.astype(jnp.float32) ** 2)
                   for x in jax.tree_util.tree_leaves(g))

    report = {"geometry": {"B": B, "num_samples": NS, "zdim": cfg.zdim,
                           "T": L // cfg.stft.hop + 1, "compute": "bf16",
                           "fs": FS, "seconds": SECONDS, "tiny": tiny},
              "peak_bf16_tflops": PEAK_BF16 / 1e12,
              "steps_timed": STEPS}

    t_fwd = time_program(fwd, params, stats, wav, rng, kl_w)
    t_fb = time_program(fwdbwd, params, stats, wav, rng, kl_w)
    t_step = time_program(tr._train_step, state, wav, rng, kl_w,
                          chain_state=True)
    f_fwd = flops_of(fwd, params, stats, wav, rng, kl_w)
    f_fb = flops_of(fwdbwd, params, stats, wav, rng, kl_w)

    def prog(t, f):
        rec = {"ms": round(t * 1e3, 1)}
        if np.isfinite(f):
            rec.update(tflop=round(f / 1e12, 2),
                       tflops_per_s=round(f / t / 1e12, 1),
                       mfu=round(f / t / PEAK_BF16, 3))
        return rec

    report["programs"] = {
        "forward": prog(t_fwd, f_fwd),
        "forward_backward": prog(t_fb, f_fb),
        "full_step": prog(t_step, f_fb),  # optimizer adds ~0 MXU flops
    }
    report["derived"] = {
        "backward_ms": round((t_fb - t_fwd) * 1e3, 1),
        "optimizer_ms": round((t_step - t_fb) * 1e3, 1),
        "bwd_over_fwd": round((t_fb - t_fwd) / t_fwd, 2),
        "audio_s_per_s": round(B * SECONDS / t_step, 1),
    }
    print(json.dumps({k: report[k] for k in ("programs", "derived")},
                     indent=1), flush=True)

    # -- component split: encoder vs decoder, fwd and fwd+bwd ------------
    # (jit even the one-shot applies: EAGER complex ops — istft's
    # spec_r + 1j*spec_i — hit UNIMPLEMENTED on the axon TPU backend)
    enc_out, _ = jax.jit(
        lambda ep, w, r: tr.encoder.apply(
            {"params": ep, "stats": stats["enc"]}, w, train=True, rng=r)
    )(params["enc"], wav, rng)
    stft_x, z, skips = enc_out.stft_x, enc_out.z, enc_out.skips

    def enc_scalar(ep, w, r):
        out, _ = tr.encoder.apply(
            {"params": ep, "stats": stats["enc"]}, w, train=True, rng=r)
        return (jnp.sum(out.z.astype(jnp.float32) ** 2)
                + sum(jnp.sum(s.astype(jnp.float32) ** 2)
                      for s in out.skips)
                + jnp.sum(out.gauss.mu_r ** 2))

    def dec_scalar(dp, sx, zz, sk):
        (recon, predict), _ = tr.decoder.apply(
            {"params": dp, "stats": stats["dec"]}, sx, zz, sk, train=True)
        return (jnp.sum(recon.astype(jnp.float32) ** 2)
                + jnp.sum(predict.astype(jnp.float32) ** 2))

    # grad'd programs take the activations as ARGUMENTS, never closure
    # captures: a closed-over device array is baked into the HLO as a
    # literal constant, and the decoder's (stft_x, z, skips) set is tens
    # of MB — enough to blow the axon tunnel's remote-compile request
    # body limit (HTTP 413, observed on-chip 2026-08-18)
    comp = {}

    def record(key, t):
        comp[key] = round(t * 1e3, 1)
        print(f"{key}: {comp[key]} ms", flush=True)

    record("encoder_fwd_ms", time_program(
        jax.jit(enc_scalar), params["enc"], wav, rng))
    record("encoder_fwdbwd_ms", time_program(
        jax.jit(jax.grad(enc_scalar, argnums=0)),
        params["enc"], wav, rng, steps=STEPS))
    record("decoder_fwd_ms", time_program(
        jax.jit(dec_scalar), params["dec"], stft_x, z, skips))
    record("decoder_fwdbwd_ms", time_program(
        jax.jit(jax.grad(dec_scalar, argnums=0)),
        params["dec"], stft_x, z, skips, steps=STEPS))

    # loss-only: everything downstream of the model outputs (again all
    # activations as arguments — see the HTTP 413 note above)
    def loss_scalar(recon, predict, wav, sx, gauss, zz, kw):
        wav_t = tile_samples(wav, NS)[:, : recon.shape[1]]
        stft_t = tile_samples(sx, NS)
        lo = tr.loss(wav_t, recon, stft_t, predict, gauss, zz, kw)
        return lo.total

    (recon0, predict0), _ = jax.jit(
        lambda dp, sx, zz, sk: tr.decoder.apply(
            {"params": dp, "stats": stats["dec"]}, sx, zz, sk, train=True)
    )(params["dec"], stft_x, z, skips)
    comp["loss_fwd_ms"] = round(time_program(
        jax.jit(loss_scalar), recon0, predict0, wav, stft_x,
        enc_out.gauss, z, kl_w) * 1e3, 2)
    report["components"] = comp
    print(json.dumps(comp, indent=1), flush=True)

    # -- probes -----------------------------------------------------------
    import idccrn_vae_tpu.models.backbone as backbone
    from idccrn_vae_tpu.ops.lstm import complex_lstm

    probes = {}
    orig = backbone.complex_lstm
    for unroll in (1, 8, 16):
        backbone.complex_lstm = functools.partial(complex_lstm,
                                                  unroll=unroll)
        tr_u = PretrainTrainer(cfg, loss, 1e-3)
        st_u = tr_u.init_state()
        t_u = time_program(tr_u._train_step, st_u, wav, rng, kl_w,
                           chain_state=True)
        probes[f"step_ms_unroll_{unroll}"] = round(t_u * 1e3, 1)
        print(f"unroll={unroll}: {probes[f'step_ms_unroll_{unroll}']} ms",
              flush=True)
    backbone.complex_lstm = orig

    # donation: frees the old state's HBM for the new one in-place
    tr_d = PretrainTrainer(cfg, loss, 1e-3)
    donated = jax.jit(tr_d._step, static_argnames=("train",),
                      donate_argnums=(0,))
    st_d = tr_d.init_state()
    t_d = time_program(lambda s, w, r, k: donated(s, w, r, k, train=True),
                       st_d, wav, rng, kl_w, chain_state=True)
    probes["step_ms_donate"] = round(t_d * 1e3, 1)
    report["probes"] = probes
    report["baseline_step_ms"] = round(t_step * 1e3, 1)

    out_path = ("/tmp/PROFILE_TRAIN_tiny.json" if tiny else
                os.path.join(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))), "PROFILE_TRAIN.json"))
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["probes"], indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
