#!/usr/bin/env python
"""Test workaround variants for the tiny-dims TPU dense-backward bug.

tools/repro_xla_dense_backward.py isolated the minimal trigger: a
jitted grad of complex_dense with BOTH dims under the 8-lane sublane
(cin=cout=4, rows=8) dies in XLA post-optimization; any dim >= 8 (or
5/16, 4/20 mixes) compiles. This script probes candidate workarounds
on the minimal case in fresh subprocesses:

  v0  current op (expected FAIL — control)
  v1  pad cout to 8 (zero-padded weights/bias, output sliced)
  v2  pad cin to 8 (zero-padded input columns + weight rows)
  v3  no bias (diagnostic: is the bias-grad reduce the trigger?)
  v4  no preferred_element_type (diagnostic)

Run on the TPU: python tools/dense_workaround_probe.py
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = r"""
import sys
variant = sys.argv[1]
import jax, jax.numpy as jnp
import numpy as np
sys.path.insert(0, %(repo)r)

cin = cout = 4; rows = 8
rng = np.random.default_rng(0)
params = {
    "wr": jnp.asarray(rng.standard_normal((cin, cout)), jnp.float32) * 0.1,
    "wi": jnp.asarray(rng.standard_normal((cin, cout)), jnp.float32) * 0.1,
    "br": jnp.zeros((cout,)), "bi": jnp.zeros((cout,)),
}
x = jnp.asarray(rng.standard_normal((rows, 2 * cin)), jnp.float32)

def dense(p, variant):
    re, im = jnp.split(x, 2, axis=-1)
    wr, wi, br, bi = p["wr"], p["wi"], p["br"], p["bi"]
    if variant == "v1":  # pad cout to 8
        pad = 8 - cout
        wr = jnp.pad(wr, ((0, 0), (0, pad)))
        wi = jnp.pad(wi, ((0, 0), (0, pad)))
        br = jnp.pad(br, (0, pad))
        bi = jnp.pad(bi, (0, pad))
    if variant == "v2":  # pad cin to 8
        pad = 8 - cin
        re = jnp.pad(re, ((0, 0), (0, pad)))
        im = jnp.pad(im, ((0, 0), (0, pad)))
        wr = jnp.pad(wr, ((0, pad), (0, 0)))
        wi = jnp.pad(wi, ((0, pad), (0, 0)))
    pet = {} if variant == "v4" else dict(
        preferred_element_type=jnp.float32)
    o_re = jnp.dot(re, wr, **pet)
    o_im = jnp.dot(im, wi, **pet)
    if variant != "v3":
        o_re = o_re + br
        o_im = o_im + bi
    if variant == "v1":
        o_re, o_im = o_re[:, :cout], o_im[:, :cout]
    return jnp.concatenate([o_re, o_im], axis=-1)

g = jax.jit(jax.grad(lambda p: (dense(p, variant) ** 2).mean()))(params)
print("OK", float(jax.tree.leaves(g)[0].sum()))
""" % {"repo": REPO}


def main():
    results = {}
    for v in ("v0", "v1", "v2", "v3", "v4"):
        try:
            p = subprocess.run([sys.executable, "-c", _PROBE, v],
                               capture_output=True, text=True, timeout=900)
            ok = p.returncode == 0 and "OK" in p.stdout
            results[v] = {"ok": ok,
                          **({} if ok else
                             {"error": (p.stdout + p.stderr)[-500:]})}
        except subprocess.TimeoutExpired:
            results[v] = {"ok": False, "error": "timeout"}
        print(v, results[v]["ok"], flush=True)
    out = os.path.join(REPO, "XLA_DENSE_WORKAROUND.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
