"""Multi-host data parallelism (SURVEY.md §5.8 — greenfield; the
reference is single-GPU with no distributed backend at all).

Design: one flat 1-D 'data' mesh over ALL global devices. Each host
runs the same program (SPMD), feeds its process-local input shard
(shard_file_list + parallel.mesh.shard_batch, which assembles global
arrays via make_array_from_process_local_data), and XLA's compiled
step performs gradient all-reduce and complex-BN stat globalization
over the mesh collectives (ICI within a slice; DCN only carries the
per-host input pipeline). Checkpointing stays primary-only.

Typical multi-host entry:

    from idccrn_vae_tpu.parallel import distributed as dist
    dist.initialize()                       # env-driven on TPU pods
    mesh = dist.global_mesh()
    files = dist.shard_file_list(all_files)  # per-process dataset shard
    trainer = PretrainTrainer(cfg, loss, lr, mesh=mesh)
    ...                                      # identical to single-host

Tested via subprocess-spawned 2-process x 4-virtual-CPU-device runs
(tests/test_multihost.py) asserting loss equality with the
single-process 8-device run.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax

from idccrn_vae_tpu.parallel.mesh import Mesh, make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """jax.distributed.initialize wrapper. With no arguments the
    environment provides everything (TPU pod metadata / SLURM / Open
    MPI); explicit arguments support bring-your-own orchestration and
    the CPU test harness."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def global_mesh() -> Mesh:
    """1-D 'data' mesh over every device of every process."""
    return make_mesh(devices=jax.devices())


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def shard_file_list(files: Sequence[str],
                    process_index: Optional[int] = None,
                    process_count: Optional[int] = None) -> list:
    """Deterministic per-process dataset shard (strided so shards stay
    balanced under sorted-by-length file lists).

    Shards are padded to EQUAL length by wrapping around to the start
    of the list (like torch's DistributedSampler): every process must
    yield the same number of batches, or one process enters the
    compiled step's gradient all-reduce on an extra batch while its
    peers never issue the matching collective — a silent deadlock. The
    cost is up to process_count-1 duplicated files per epoch."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    files = list(files)
    if files and len(files) % pc:
        files = files + files[: pc - len(files) % pc]
    return files[pi::pc]


def local_batch_size(global_batch: int) -> int:
    pc = jax.process_count()
    if global_batch % pc:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{pc} processes")
    return global_batch // pc
