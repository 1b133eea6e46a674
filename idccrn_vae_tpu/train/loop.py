"""Shared epoch-loop machinery for all four trainers.

Mirrors the reference's train-loop skeleton (per-epoch train/val metric
accumulation, ReduceLROnPlateau on val loss, best-checkpoint + early
stop on patience — train.py:254-434) once, instead of four copies.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Iterable

import jax


class MetricAccumulator:
    """Sample-weighted averages with PER-KEY counts: a key emitted only
    on some batches (e.g. the adversarial 'dis' loss, present every
    d_step batches) averages over the samples that actually reported it,
    not the whole epoch. (The reference's bookkeeping re-adds the stale
    last dist_loss on non-update batches,
    train_second_phase_adversarial.py:323 — a reporting bug, not
    reproduced.)"""

    def __init__(self):
        self.sums: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self.count = 0

    def add(self, metrics: Dict, batch_size: int):
        for k, v in metrics.items():
            self.sums[k] = self.sums.get(k, 0.0) + float(v) * batch_size
            self.counts[k] = self.counts.get(k, 0) + batch_size
        self.count += batch_size

    def averages(self) -> Dict[str, float]:
        return {k: v / self.counts[k] for k, v in self.sums.items()}


def run_training(
    *,
    epochs: int,
    start_epoch: int,
    train_loader: Iterable,
    val_loader: Iterable,
    train_step: Callable,   # (state, batch, rng, epoch) -> (state, metrics)
    eval_step: Callable,    # (state, batch, rng, epoch) -> metrics
    state,
    rng: jax.Array,
    schedulers_step: Callable,  # (state, val_total) -> state
    on_best: Callable,          # (state, epoch) -> None
    on_checkpoint: Callable,    # (state, epoch, best, patience, curves) -> None
    logger,
    early_stop_patience: int,
    best_val: float = float("inf"),
    patience: int = 0,
    loss_key: str = "total",
    save_frequency: int = 10,
):
    """Returns (state, curves dict, best_val).

    Per-step rngs derive from fold_in(rng, epoch) rather than a
    sequentially-split stream, so a resume at epoch k draws the exact
    noise an uninterrupted run would have drawn for epochs >= k
    (resume fidelity, cf. the reference's torch.manual_seed pinning).
    """
    curves: Dict[str, list] = {"train": [], "val": []}
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        acc = MetricAccumulator()
        erng = jax.random.fold_in(rng, 2 * epoch)
        # pin data order to the GLOBAL epoch so resume reproduces the
        # uninterrupted run's shuffles (same guarantee as the rng
        # fold_in above; plain iterables without set_epoch still work)
        for ldr in (train_loader, val_loader):
            if hasattr(ldr, "set_epoch"):
                ldr.set_epoch(epoch)
        for batch in train_loader:
            bs = (batch[0] if isinstance(batch, tuple) else batch).shape[0]
            erng, sub = jax.random.split(erng)
            state, metrics = train_step(state, batch, sub, epoch)
            acc.add(metrics, bs)
        train_avg = acc.averages()

        vacc = MetricAccumulator()
        vrng = jax.random.fold_in(rng, 2 * epoch + 1)
        for batch in val_loader:
            bs = (batch[0] if isinstance(batch, tuple) else batch).shape[0]
            vrng, sub = jax.random.split(vrng)
            metrics = eval_step(state, batch, sub, epoch)
            vacc.add(metrics, bs)
        val_avg = vacc.averages()
        val_total = val_avg.get(loss_key, float("nan"))

        curves["train"].append(train_avg)
        curves["val"].append(val_avg)

        state = schedulers_step(state, val_total)

        improved = val_total < best_val
        if improved:
            best_val = val_total
            patience = 0
            on_best(state, epoch)
        else:
            patience += 1

        dt = time.time() - t0
        logger.info(
            "epoch %d (%.1fs) train %s | val %s | best %.5f patience %d",
            epoch, dt,
            {k: round(v, 5) for k, v in train_avg.items()},
            {k: round(v, 5) for k, v in val_avg.items()},
            best_val, patience,
        )

        if improved or (epoch % save_frequency == 0):
            on_checkpoint(state, epoch, best_val, patience, curves)

        if patience >= early_stop_patience:
            logger.info("Early stop patience achieved at epoch %d", epoch)
            break
    return state, curves, best_val
