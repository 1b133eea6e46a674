#!/usr/bin/env python
"""Probe the remote-compile HTTP-500 wall systematically (VERDICT r2
weak #6 / next-round #7).

TRAIN_BENCH.json records that every B=32 pretrain config and the
adversarial phase-2 step at B=15 die in the remote tpu_compile_helper
with HTTP 500. This script runs one experiment matrix to separate
"infra limit" from "HBM limit" and to test the three mitigations the
review proposed:

  1. batch ceiling: pretrain bf16 ns=5 at B in {20, 24, 28, 32},
     remat off — find where the 500 starts; capture the FULL error
     text (the earlier records truncated it at 200 chars) and the
     compiled memory_analysis for every B that compiles, so the
     activation footprint can be extrapolated across the wall;
  2. remat at the failing batch (trades FLOPs for activation HBM);
  3. donated state buffers at the failing batch (donate_argnums=0);
  4. the adversarial phase-2 step at B=15 SPLIT into two jitted
     programs — G-step (update_d=False, already a separate
     specialization) and a standalone D-step consuming materialized
     (recon, clean) — so the compiler never holds both backward
     graphs in one program.

Each probe runs in a fresh subprocess (a wedged compile client cannot
poison the rest). Results -> COMPILE500_PROBE.json + a summary merged
into TRAIN_BENCH.json's "probe_500" key.

Run alone on the TPU: python tools/probe_compile500.py
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = r"""
import json, sys, time
kind = sys.argv[1]
sys.path.insert(0, %(repo)r)
import jax, jax.numpy as jnp
import numpy as np
import dataclasses
from idccrn_vae_tpu.models.config import DccrnConfig

FS, L = 16000, 48000

def wav(b, count=1, seed=0):
    rng = np.random.default_rng(seed)
    out = tuple(jnp.asarray(rng.standard_normal((b, L)).astype(np.float32)
                            * 0.1) for _ in range(count))
    return out if count > 1 else out[0]

def mem(compiled):
    try:
        m = compiled.memory_analysis()
        return {"temp_gib": round(m.temp_size_in_bytes / 2**30, 3),
                "args_gib": round(m.argument_size_in_bytes / 2**30, 3),
                "out_gib": round(m.output_size_in_bytes / 2**30, 3)}
    except Exception as e:
        return {"mem_error": str(e)[:200]}

if kind == "pretrain":
    b = int(sys.argv[2]); remat = sys.argv[3] == "1"; donate = sys.argv[4] == "1"
    from idccrn_vae_tpu.losses.vae_loss import (PretrainVaeLoss,
                                                kl_annealing_schedule)
    from idccrn_vae_tpu.train.pretrain import PretrainTrainer
    cfg = DccrnConfig(causal=True, zdim=128, num_samples=5,
                      compute="bf16", remat=remat)
    loss = PretrainVaeLoss(kl_annealing_schedule(20), 1.0, num_samples=5)
    tr = PretrainTrainer(cfg, loss, 1e-3)
    if donate:
        tr._train_step = jax.jit(tr._step, static_argnames=("train",),
                                 donate_argnums=(0,))
    state = tr.init_state()
    w = wav(b)
    kl_w = jnp.asarray(loss.kl_weight_at(0), jnp.float32)
    rng = jax.random.PRNGKey(0)
    compiled = tr._train_step.lower(state, w, rng, kl_w,
                                    train=True).compile()
    info = mem(compiled)
    s1, m = compiled(state, w, rng, kl_w)
    if donate:
        state = s1
    float(m["total"])  # scalar-fetch barrier: warm step fully retired
    t0 = time.perf_counter()
    for _ in range(4):
        s1, m = compiled(s1, w, rng, kl_w)
    tot = float(m["total"])
    info["step_ms"] = round((time.perf_counter() - t0) / 4 * 1000, 1)
    print("OKJSON " + json.dumps(info))
elif kind == "adv_split":
    b = int(sys.argv[2])
    import optax
    from idccrn_vae_tpu.losses.phase2 import TwoPhaseLoss
    from idccrn_vae_tpu.train.phase2 import Phase2Trainer
    enc = DccrnConfig(causal=True, zdim=128, num_samples=5,
                      latent_num=1, compute="bf16")
    dec = dataclasses.replace(enc, skip_mode="runtime", recon_type="mask")
    tr = Phase2Trainer(enc, dec, TwoPhaseLoss((1.0, 1.0, 0.0), 1.0, 1),
                       1e-3, adversarial=True, d_step=1)
    state = tr.init_state()
    noisy, clean, noise = wav(b, count=3)
    rng = jax.random.PRNGKey(0)

    # program 1: G-step only (update_d=False static) — also returns the
    # reconstruction + clean target for the external D-step
    def g_step(state, noisy, clean, noise, rng):
        models = state["models"]
        tparams = tr._gen_params(models)

        def gen_loss_fn(tp):
            recon_c, pred_c, clean_t, _cst, dstats, _ex = tr._decode(
                models, tp, noisy, clean, noise, rng, True)
            dis_vars = {"params": models["dis"]["params"],
                        "stats": models["dis"]["stats"]}
            score, _ = tr.discriminator.apply(dis_vars, recon_c, train=True)
            total, l_recon, l_dis = tr.adv_loss.generator_loss(
                clean_t, recon_c, score)
            return total, (l_recon, dstats, recon_c, clean_t)

        grads, (l_recon, dstats, recon_c, clean_t) = jax.grad(
            gen_loss_fn, has_aux=True)(tparams)
        updates, opt = tr.tx.update(grads, state["opt"], tparams)
        new_tp = optax.apply_updates(tparams, updates)
        models = dict(models)
        models["decoder"] = {"params": new_tp["decoder"], "stats": dstats}
        return ({"models": models, "opt": opt,
                 "opt_dis": state["opt_dis"]},
                jax.lax.stop_gradient(recon_c), clean_t)

    # program 2: D-step on materialized tensors
    def d_step(state, est, clean_t):
        models = state["models"]

        def d_loss_fn(dp):
            dvars = {"params": dp, "stats": models["dis"]["stats"]}
            s_true, _ = tr.discriminator.apply(dvars, clean_t, train=True)
            s_est, st2 = tr.discriminator.apply(dvars, est, train=True)
            return tr.adv_loss.discriminator_loss(s_true, s_est), st2

        (lo, dstats), dg = jax.value_and_grad(d_loss_fn, has_aux=True)(
            models["dis"]["params"])
        du, opt_dis = tr.tx_dis.update(dg, state["opt_dis"],
                                       models["dis"]["params"])
        models = dict(models)
        models["dis"] = {"params": optax.apply_updates(
            models["dis"]["params"], du), "stats": dstats}
        return {"models": models, "opt": state["opt"],
                "opt_dis": opt_dis}, lo

    gj = jax.jit(g_step).lower(state, noisy, clean, noise, rng).compile()
    info = {"g_" + k: v for k, v in mem(gj).items()}
    state2, est, clean_t = gj(state, noisy, clean, noise, rng)
    dj = jax.jit(d_step).lower(state2, est, clean_t).compile()
    info.update({"d_" + k: v for k, v in mem(dj).items()})
    state3, lo = dj(state2, est, clean_t)
    float(lo)  # scalar-fetch barrier before the timed window
    t0 = time.perf_counter()
    for _ in range(4):
        state3, est, clean_t = gj(state3, noisy, clean, noise, rng)
        state3, lo = dj(state3, est, clean_t)
    _ = float(lo)
    info["gd_step_ms"] = round((time.perf_counter() - t0) / 4 * 1000, 1)
    print("OKJSON " + json.dumps(info))
""" % {"repo": REPO}


def probe(args_list, timeout=1500):
    try:
        p = subprocess.run([sys.executable, "-c", _PROBE,
                            *map(str, args_list)],
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"status": "timeout"}
    out = p.stdout + p.stderr
    for line in p.stdout.splitlines():
        if line.startswith("OKJSON "):
            return {"status": "ok", **json.loads(line[7:])}
    status = "http500" if "HTTP 500" in out else "error"
    # keep enough of the error to classify OOM-vs-infra
    return {"status": status, "detail": out[-2000:]}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "COMPILE500_PROBE.json"))
    ap.add_argument("--resume", action="store_true",
                    help="skip probes already recorded in OUT")
    args = ap.parse_args()

    results = {"pretrain_ceiling": [], "mitigations": [], "adv_split": None}
    if args.resume and os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
        results.update({k: prev.get(k, results[k]) for k in results})
    done_b = {r["batch"] for r in results["pretrain_ceiling"]}
    done_mit = {(r["mitigation"], r.get("batch"))
                for r in results["mitigations"]
                if r.get("status") == "ok"}

    def save():
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    first_fail = None
    for b in (20, 24, 28, 32):
        if b in done_b:
            rs = [r for r in results["pretrain_ceiling"] if r["batch"] == b]
            if rs[0]["status"] != "ok" and first_fail is None:
                first_fail = b
            continue
        r = probe(["pretrain", b, 0, 0])
        results["pretrain_ceiling"].append({"batch": b, **r})
        print(f"pretrain B={b}: {r['status']} "
              f"{r.get('temp_gib', '')}", flush=True)
        save()
        if r["status"] != "ok" and first_fail is None:
            first_fail = b

    if first_fail is not None:
        for name, flags in (("remat", [1, 0]), ("donate", [0, 1]),
                            ("remat+donate", [1, 1])):
            if (name, first_fail) in done_mit:
                continue
            results["mitigations"] = [
                r for r in results["mitigations"]
                if not (r["mitigation"] == name
                        and r.get("batch") == first_fail)]
            r = probe(["pretrain", first_fail, *flags])
            results["mitigations"].append(
                {"batch": first_fail, "mitigation": name, **r})
            print(f"mitigation {name} B={first_fail}: {r['status']}",
                  flush=True)
            save()

    if not (results["adv_split"] or {}).get("status") == "ok":
        r = probe(["adv_split", 15])
        results["adv_split"] = {"batch": 15, **r}
        print(f"adv split B=15: {r['status']}", flush=True)
        save()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
