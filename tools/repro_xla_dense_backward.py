#!/usr/bin/env python
"""Corner the tiny-geometry TPU backward failure (VERDICT r2 weak #3 /
next-round #6).

History: examples/quickstart.py originally ran its tiny-geometry demo
(encoder_dim_start=2, zdim=4) on the TPU and hit an XLA
post-optimization shape check in the dense backward — "f32[5,16] vs
f32[16,5]" — so the demo was forced to CPU. Reference geometry
(zdim=128) compiles and trains fine. This script (a) attempts a
MINIMAL repro: jitted grads of the complex_dense op and of the tiny
pretrain train step over a (dims) x (batch) matrix on whatever backend
is active, and (b) maps the failure envelope so quickstart / users
know which geometries are safe on TPU.

Run ON THE TPU (default backend in this image):
    python tools/repro_xla_dense_backward.py [--out XLA_DENSE_REPRO.json]
Each probe runs in a fresh subprocess so one XLA crash cannot poison
the rest of the sweep.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = r"""
import sys
kind = sys.argv[1]
import jax, jax.numpy as jnp
import numpy as np
sys.path.insert(0, %(repo)r)

if kind == "dense":
    cin, cout, rows = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    from idccrn_vae_tpu.ops.dense import complex_dense
    params = {
        "wr": jnp.asarray(np.random.default_rng(0).standard_normal(
            (cin, cout)), jnp.float32) * 0.1,
        "wi": jnp.asarray(np.random.default_rng(1).standard_normal(
            (cin, cout)), jnp.float32) * 0.1,
        "br": jnp.zeros((cout,)), "bi": jnp.zeros((cout,)),
    }
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (rows, 2 * cin)), jnp.float32)

    def loss(p):
        return (complex_dense(x, p) ** 2).mean()

    g = jax.jit(jax.grad(loss))(params)
    print("OK", float(jax.tree.leaves(g)[0].sum()))
elif kind == "trainstep":
    dim, zdim, batch = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    from idccrn_vae_tpu.losses.vae_loss import (
        PretrainVaeLoss, kl_annealing_schedule)
    from idccrn_vae_tpu.models.config import DccrnConfig
    from idccrn_vae_tpu.train.pretrain import PretrainTrainer
    cfg = DccrnConfig(
        encoder_channels=(1, dim, dim, 2 * dim, 2 * dim, 2 * dim, 2 * dim),
        zdim=zdim, num_samples=1, causal=True)
    loss = PretrainVaeLoss(kl_annealing_schedule(5), 0.01, num_samples=1)
    tr = PretrainTrainer(cfg, loss, 1e-3)
    wav = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, 1600)) * 0.3, jnp.float32)
    s1, m = tr.train_step(tr.init_state(), wav, jax.random.PRNGKey(0), 0)
    print("OK", float(m["total"]))
""" % {"repo": REPO}


def probe(args_list, timeout=900, env_extra=None):
    env = dict(os.environ, **(env_extra or {}))
    try:
        p = subprocess.run([sys.executable, "-c", _PROBE,
                            *map(str, args_list)],
                           capture_output=True, text=True, timeout=timeout,
                           env=env)
    except subprocess.TimeoutExpired:
        return False, f"timeout {timeout}s (compile-service contention?)"
    ok = p.returncode == 0 and "OK" in p.stdout
    tail = (p.stdout + p.stderr)[-600:]
    return ok, tail


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "XLA_DENSE_REPRO.json"))
    ap.add_argument("--quick", action="store_true",
                    help="train-step sweep only at the known-bad point")
    ap.add_argument("--key", default=None,
                    help="merge results into OUT under this top-level key "
                         "(preserving other keys), e.g. after_flatten_fix")
    ap.add_argument("--with-batch-pad", action="store_true",
                    help="leave the landed pad_small_tpu_batch workaround "
                         "ACTIVE in the trainstep sweep (for recording an "
                         "after_batch_pad key). Default disables it with "
                         "IDCCRN_NO_BATCH_PAD=1 — otherwise every B<8 "
                         "point silently pads to >=8 rows/chip and the "
                         "tool can no longer reproduce the bug it exists "
                         "to corner.")
    args = ap.parse_args()
    step_env = {} if args.with_batch_pad else {"IDCCRN_NO_BATCH_PAD": "1"}

    results = {"dense_op": [], "train_step": []}

    # (a) minimal candidate: bare complex_dense grads at the suspect dims
    # (zdim=4 tiny model: dense in=4, out=20 (5 freq bins x 4ch) and the
    # reverse; rows = B*T). 5/16 echo the error text's operand shapes.
    if not args.quick:
        for cin, cout, rows in ((4, 20, 34), (20, 4, 34), (5, 16, 16),
                                (16, 5, 16), (4, 4, 8), (128, 1280, 481)):
            ok, tail = probe(["dense", cin, cout, rows])
            results["dense_op"].append(
                {"cin": cin, "cout": cout, "rows": rows, "ok": ok,
                 **({} if ok else {"error": tail})})
            print(f"dense cin={cin} cout={cout} rows={rows}: "
                  f"{'ok' if ok else 'FAIL'}", flush=True)

    # (b) envelope: full tiny pretrain train step over (dim, zdim, batch)
    grid = [(2, 4, 2), (2, 4, 8), (4, 4, 4), (4, 8, 4), (8, 16, 4),
            (8, 16, 8), (16, 32, 4), (32, 128, 2)]
    if args.quick:
        grid = [(2, 4, 2)]
    for dim, zdim, batch in grid:
        ok, tail = probe(["trainstep", dim, zdim, batch], timeout=1500,
                         env_extra=step_env)
        results["train_step"].append(
            {"encoder_dim_start": dim, "zdim": zdim, "batch": batch,
             "ok": ok, **({} if ok else {"error": tail})})
        print(f"trainstep dim={dim} zdim={zdim} B={batch}: "
              f"{'ok' if ok else 'FAIL'}", flush=True)

    import jax

    results["device"] = str(jax.devices()[0])
    if args.key:
        merged = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                merged = json.load(f)
        merged[args.key] = results
        results = merged
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
