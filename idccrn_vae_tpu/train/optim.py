"""Optimizers + plateau LR scheduling (torch-Adam-compatible).

The reference uses torch.optim.Adam(lr, weight_decay=1e-3) — L2 added
to the *gradient* (not decoupled AdamW) — with
ReduceLROnPlateau(mode='min', factor=0.5, patience=3) per model
(i_dccrn_vae/pretrained_vaes/train.py:127-130). Equivalents here:

  * make_adam: optax chain add_decayed_weights(wd) -> adam, wrapped in
    inject_hyperparams so the learning rate lives in the optimizer
    state and the host-side plateau scheduler can rewrite it without
    recompiling the jitted step.
  * PlateauScheduler: host-side min-mode plateau tracker.
"""

from __future__ import annotations

import optax


def make_adam(learning_rate: float, weight_decay: float = 1e-3):
    def build(learning_rate):
        txs = []
        if weight_decay:
            txs.append(optax.add_decayed_weights(weight_decay))
        txs.append(optax.adam(learning_rate))
        return optax.chain(*txs)

    return optax.inject_hyperparams(build)(learning_rate=learning_rate)


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    """Functionally rewrite the injected learning rate."""
    import jax.numpy as jnp

    opt_state.hyperparams["learning_rate"] = jnp.asarray(
        lr, dtype=jnp.asarray(opt_state.hyperparams["learning_rate"]).dtype
    )
    return opt_state


class PlateauScheduler:
    """torch ReduceLROnPlateau('min') semantics, including the default
    threshold=1e-4 (rel) and cooldown=0 the reference relies on — a
    near-flat val loss within the relative threshold counts as NOT
    improved, so torch (and now this) still decays the LR."""

    def __init__(self, factor: float = 0.5, patience: int = 3,
                 min_lr: float = 0.0, threshold: float = 1e-4,
                 threshold_mode: str = "rel", cooldown: int = 0):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.cooldown = cooldown
        self.best = float("inf")
        self.num_bad = 0
        self.cooldown_counter = 0

    def _is_better(self, a: float, best: float) -> bool:
        if self.threshold_mode == "rel":
            return a < best * (1.0 - self.threshold)
        return a < best - self.threshold

    def step(self, metric: float, opt_state):
        """Returns (opt_state, reduced: bool)."""
        reduced = False
        if self._is_better(metric, self.best):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        if self.num_bad > self.patience:
            lr = max(self.min_lr, get_learning_rate(opt_state) * self.factor)
            opt_state = set_learning_rate(opt_state, lr)
            self.cooldown_counter = self.cooldown
            self.num_bad = 0
            reduced = True
        return opt_state, reduced

    def state_dict(self):
        return {"best": self.best, "num_bad": self.num_bad,
                "cooldown_counter": self.cooldown_counter}

    def load_state_dict(self, d):
        self.best = d["best"]
        self.num_bad = d["num_bad"]
        self.cooldown_counter = d.get("cooldown_counter", 0)
