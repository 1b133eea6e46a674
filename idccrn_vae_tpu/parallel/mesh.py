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


def shard_batch(mesh: Mesh, batch):
    """Put (a pytree of) host batches onto the mesh, batch-dim sharded."""
    sharding = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
