"""Data-parallel scale-out over a 1-D device mesh.

The reference is strictly single-GPU (SURVEY.md §2.10: no distributed
backend at all); parallelism here is greenfield and TPU-native:

  * a 1-D `jax.sharding.Mesh` over the batch ('data') axis,
  * batches sharded with `NamedSharding(P('data'))`, params replicated,
  * the jitted train step is a single SPMD program — XLA inserts the
    gradient all-reduce (psum over ICI) and turns batch-dim means
    (loss, complex-BN batch statistics) into global collectives
    automatically, so BN stats and losses are identical to the
    single-chip program.

The largest model is ~tens of M params; parameter sharding is
unnecessary — everything fits per chip and DP is the right axis.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("data",))


def auto_mesh(batch_size: int, n_devices: Optional[int] = None) -> Mesh:
    """Largest mesh (<= n_devices or all devices) that divides batch_size."""
    avail = len(jax.devices())
    n = min(n_devices or avail, avail)
    while n > 1 and batch_size % n:
        n -= 1
    return make_mesh(n)


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def _multiprocess(mesh: Mesh) -> bool:
    """True when the mesh spans devices of more than one process."""
    return jax.process_count() > 1 and mesh.devices.size > len(
        [d for d in mesh.devices.flat if d.process_index == jax.process_index()]
    )


def pad_small_tpu_batch(mesh: Mesh, batch, min_per_device: int = 8):
    """Work around an XLA:TPU backward miscompile at tiny per-chip batch.

    Jitted train steps fail an XLA post-optimization shape check
    whenever the per-device batch is < 8, at EVERY geometry including
    zdim=128 (probed in tools/repro_xla_dense_backward.py /
    XLA_DENSE_REPRO.json; reformulating the dense op did not help — the
    mis-fused instruction is the first encoder conv's kernel grad).
    Repeating the WHOLE batch k = ceil(8*n_dev/B) times sidesteps it.

    Exactness (probed precisely in round 4): every loss term is either
    (a) a batch-mean of per-row functions (recon, KL, SI-SNR, the MI
    outer mean) — unchanged in expectation, with duplicated rows
    drawing fresh MC noise that only tightens the sampling estimate —
    or (b) computed from the batch AS A SET, and every such term is
    exactly duplicate-invariant: BN batch statistics are means/vars
    (tiling-invariant given the same activations), and the minibatch
    MI estimator's aggregate posterior logsumexp_j log q(z|x_j) -
    log(kB) gains log k in both terms, which cancel (pinned by
    tests/test_losses.py::
    test_mi_estimator_exactly_invariant_under_batch_tiling — a round-3
    review conjectured MI drift here; the algebra refutes it). So
    padding never shifts an expected value for ANY loss in losses/,
    mi_weight != 0 included. No-op off-TPU or when the batch is
    already big enough and evenly shardable; escape hatch
    IDCCRN_NO_BATCH_PAD=1 (=0/unset keeps padding on).
    """
    if (jax.default_backend() != "tpu"
            or os.environ.get("IDCCRN_NO_BATCH_PAD", "")
            not in ("", "0", "false", "False")):
        return batch
    leaves = jax.tree.leaves(batch)
    if not leaves:
        return batch
    b = int(leaves[0].shape[0])  # process-local batch
    # rows each chip ends up with: global batch / global device count
    chips_per_process = max(1, mesh.devices.size // jax.process_count())
    if b % chips_per_process == 0 and b // chips_per_process >= min_per_device:
        return batch
    # smallest whole-batch repetition k with k*b/chips >= min_per_device
    # AND k*b evenly shardable over the chips (b < chips_per_process
    # floors per_chip to 0 — compute k from the global requirement, not
    # from ceil(min/per_chip))
    k = -(-(min_per_device * chips_per_process) // b)
    while (k * b) % chips_per_process:
        k += 1
    return jax.tree.map(
        lambda x: jax.numpy.concatenate([x] * k, axis=0), batch)


def pad_and_shard(mesh: Mesh, batch, min_per_device: int = 8):
    """The sequence every trainer step wrapper needs, in one place:
    float32 asarray -> pad_small_tpu_batch (the B<8 TPU workaround) ->
    shard_batch. Single-sourcing it means the padding contract has ONE
    implementation to fix/verify, not eight hand-rolled copies."""
    batch = jax.tree.map(lambda x: jax.numpy.asarray(x, jax.numpy.float32),
                         batch)
    return shard_batch(mesh, pad_small_tpu_batch(mesh, batch,
                                                 min_per_device))


def shard_batch(mesh: Mesh, batch):
    """Put (a pytree of) host batches onto the mesh, batch-dim sharded.

    Single-process: a plain device_put. Multi-process (multi-host DP,
    SURVEY.md §5.8): each process passes its PROCESS-LOCAL slice of the
    global batch; the pieces assemble into one global array via
    jax.make_array_from_process_local_data — the DCN/interconnect only
    ever carries input shards, never gradients (those ride the mesh
    collectives inside the compiled step).
    """
    sharding = data_sharding(mesh)
    if _multiprocess(mesh):
        def put(x):
            x = np.asarray(x)
            global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                sharding, x, global_shape)

        return jax.tree.map(put, batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh.

    Multi-process: every process holds identical host values (same init
    seed / same restored checkpoint), assembled into replicated global
    arrays via make_array_from_callback.
    """
    sharding = NamedSharding(mesh, P())
    if _multiprocess(mesh):
        def put(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, sharding, lambda idx: x[idx])

        return jax.tree.map(put, tree)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
