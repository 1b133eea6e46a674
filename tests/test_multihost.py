"""Multi-host data parallelism: 2 spawned processes x 4 virtual CPU
devices each == one 8-device single-process run.

Each subprocess calls jax.distributed.initialize (Gloo-backed CPU
collectives), builds the global 'data' mesh, feeds its PROCESS-LOCAL
quarter of the global batch through shard_batch's
make_array_from_process_local_data path, and runs one PretrainTrainer
step. Loss and the updated-parameter checksum must match the
single-process run bit-for-bit-ish.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; out_path = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")
try:
    # PRIVATE cache dir: the suite-wide cache accumulates CPU AOT
    # entries compiled on the remote compile service's machine (foreign
    # target features), which load asymmetrically between the two
    # workers and skewed them past Gloo's fixed 30 s context deadline.
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_cache_idccrn_mh")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
sys.path.insert(0, %(repo)r)
from idccrn_vae_tpu.parallel import distributed as dist
dist.initialize(coordinator_address=f"localhost:{port}",
                num_processes=2, process_id=pid)
assert jax.device_count() == 8 and jax.local_device_count() == 4
import numpy as np
import jax.numpy as jnp
from idccrn_vae_tpu.losses.vae_loss import PretrainVaeLoss, kl_annealing_schedule
from idccrn_vae_tpu.models.config import DccrnConfig
from idccrn_vae_tpu.parallel.mesh import shard_batch
from idccrn_vae_tpu.train.pretrain import PretrainTrainer

TINY = DccrnConfig(encoder_channels=(1, 2, 2, 4, 4, 4, 4), zdim=4,
                   num_samples=1)
mesh = dist.global_mesh()
loss = PretrainVaeLoss(kl_annealing_schedule(5), 0.01, num_samples=1)
tr = PretrainTrainer(TINY, loss, 1e-3, mesh=mesh)
state = tr.init_state()
wav = (np.random.default_rng(0).standard_normal((8, 1600)) * 0.3
       ).astype(np.float32)
local = wav[pid * 4 : (pid + 1) * 4]           # process-local shard

# AOT-compile BEFORE the first collective executes, then rendezvous on
# the coordination-service barrier (generous timeout) — compile-time
# skew between the two workers on this 1-CPU host otherwise blows
# Gloo's fixed 30 s context-creation deadline.
wavd = shard_batch(mesh, jnp.asarray(local, jnp.float32))
kl_w = jnp.asarray(loss.kl_weight_at(0), jnp.float32)
rng = jax.random.PRNGKey(0)
compiled = tr._train_step.lower(state, wavd, rng, kl_w,
                                train=True).compile()
from jax._src import distributed as _jdist
_jdist.global_state.client.wait_at_barrier("mh_compiled", 600000)
s1, m = compiled(state, wavd, rng, kl_w)
checksum = float(sum(abs(np.asarray(jax.device_get(x))).sum()
                     for x in jax.tree.leaves(s1["enc"]["params"])))
with open(out_path, "w") as f:
    json.dump({"total": float(m["total"]), "kl": float(m["kl"]),
               "checksum": checksum,
               "files": dist.shard_file_list(list("abcdef"))}, f)
""" % {"repo": REPO}


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_workers(tmp_path, script):
    """Run the 2-process job, retrying failures up to 3 times.

    The Gloo/coordination-service rendezvous has fixed deadlines that a
    loaded 1-CPU host misses in several distinct ways (DEADLINE_EXCEEDED,
    'Connect timeout', 'barrier too early or too slowly', ...) when the
    rest of the suite runs concurrently. These are contention flakes,
    not correctness failures — and a genuine correctness failure (loss
    mismatch) is deterministic, so it still fails all 3 attempts and
    surfaces the final log."""
    env = {k: v for k, v in os.environ.items()}
    env["PYTHONPATH"] = REPO
    last = ""
    # a healthy warm run takes ~90 s; 300 s separates "slow" from
    # "hung" without letting one hung attempt eat the whole budget
    for _attempt in range(4):
        port = _free_port()
        procs, outs = [], []
        for pid in range(2):
            out = str(tmp_path / f"out{pid}.json")
            outs.append(out)
            procs.append(subprocess.Popen(
                [sys.executable, str(script), str(pid), str(port), out],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
        logs = []
        hung = False
        for p in procs:
            try:
                stdout, _ = p.communicate(timeout=300)
                logs.append(stdout.decode()[-3000:])
            except subprocess.TimeoutExpired:
                # a hang-type rendezvous flake: kill BOTH workers (an
                # orphan would contend with every later test) and
                # count it as retryable like any other failure
                hung = True
                for q in procs:
                    q.kill()
                stdout, _ = p.communicate()
                logs.append("<hung 300s>\n" + stdout.decode()[-3000:])
        if not hung and all(p.returncode == 0 for p in procs):
            return outs
        last = "\n".join(logs)
    raise AssertionError(last)


def test_two_process_matches_single_process(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    outs = _spawn_workers(tmp_path, script)
    r0 = json.load(open(outs[0]))
    r1 = json.load(open(outs[1]))

    # both processes observe the same global loss + identical params
    assert r0["total"] == pytest.approx(r1["total"], rel=1e-6)
    assert r0["checksum"] == pytest.approx(r1["checksum"], rel=1e-6)
    # dataset sharding is a disjoint cover
    assert sorted(r0["files"] + r1["files"]) == list("abcdef")
    assert not set(r0["files"]) & set(r1["files"])

    # equals the single-process 8-device run (same seed, same batch)
    import jax

    from idccrn_vae_tpu.losses.vae_loss import (
        PretrainVaeLoss,
        kl_annealing_schedule,
    )
    from idccrn_vae_tpu.models.config import DccrnConfig
    from idccrn_vae_tpu.parallel.mesh import make_mesh
    from idccrn_vae_tpu.train.pretrain import PretrainTrainer

    tiny = DccrnConfig(encoder_channels=(1, 2, 2, 4, 4, 4, 4), zdim=4,
                       num_samples=1)
    loss = PretrainVaeLoss(kl_annealing_schedule(5), 0.01, num_samples=1)
    tr = PretrainTrainer(tiny, loss, 1e-3, mesh=make_mesh(8))
    wav = (np.random.default_rng(0).standard_normal((8, 1600)) * 0.3
           ).astype(np.float32)
    s1, m = tr.train_step(tr.init_state(), wav, jax.random.PRNGKey(0), 0)
    checksum = float(sum(abs(np.asarray(jax.device_get(x))).sum()
                         for x in jax.tree.leaves(s1["enc"]["params"])))
    assert r0["total"] == pytest.approx(float(m["total"]), rel=1e-4)
    assert r0["checksum"] == pytest.approx(checksum, rel=1e-4)


def test_shard_file_list_equal_shards():
    """Shards must be EQUAL length (wrap-around padding, like torch's
    DistributedSampler): unequal shards desynchronize per-process step
    counts and deadlock the collective in the compiled train step."""
    from idccrn_vae_tpu.parallel.distributed import shard_file_list

    files = ["a", "b", "c", "d", "e"]
    s0 = shard_file_list(files, process_index=0, process_count=2)
    s1 = shard_file_list(files, process_index=1, process_count=2)
    assert len(s0) == len(s1) == 3
    # every file still covered; only the wrap duplicate repeats
    assert set(s0) | set(s1) == set(files)
    assert sorted(s0 + s1) == sorted(files + ["a"])

    # divisible case: an exact partition, no duplicates
    t0 = shard_file_list(files[:4], process_index=0, process_count=2)
    t1 = shard_file_list(files[:4], process_index=1, process_count=2)
    assert sorted(t0 + t1) == files[:4]

    # empty list stays empty on every process
    assert shard_file_list([], process_index=1, process_count=4) == []
