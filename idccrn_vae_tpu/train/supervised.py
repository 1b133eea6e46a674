"""Supervised DCCRN baseline training (supervised_dccrn/train.py:47).

Loss: weighted cpx-MSE + mag-MSE + SI-SNR on (noisy -> clean) pairs
(ete_train_se_loss, nsvae_loss.py:755-806).
"""

from __future__ import annotations

import os
from dataclasses import asdict
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from idccrn_vae_tpu.losses.phase2 import EteTrainSeLoss
from idccrn_vae_tpu.models.config import DccrnConfig
from idccrn_vae_tpu.models.dccrn import SupervisedDccrn
from idccrn_vae_tpu.parallel.mesh import (
    make_mesh,
    pad_and_shard,
    replicate,
)
from idccrn_vae_tpu.train.checkpoint import (
    CheckpointManager,
    datanorm_to_meta,
)
from idccrn_vae_tpu.train.loop import run_training
from idccrn_vae_tpu.train.optim import PlateauScheduler, make_adam
from idccrn_vae_tpu.utils.logger import get_logger


class SupervisedTrainer:
    def __init__(
        self,
        cfg: DccrnConfig,
        loss: EteTrainSeLoss,
        learning_rate: float,
        weight_decay: float = 1e-3,
        datanorm: Optional[Tuple[np.ndarray, np.ndarray]] = None,
        mesh=None,
        seed: int = 123,
        donate: bool = False,
    ):
        cfg.reject_int8_training("SupervisedTrainer")
        self.cfg = cfg
        self.loss = loss
        self.mesh = mesh if mesh is not None else make_mesh(1)
        self.datanorm = datanorm  # kept host-side for meta.json
        dn = None
        if datanorm is not None:
            dn = (jnp.asarray(datanorm[0]), jnp.asarray(datanorm[1]))
        self.model = SupervisedDccrn(cfg, dn)
        self.tx = make_adam(learning_rate, weight_decay)
        self.sched = PlateauScheduler(0.5, 3)
        self.seed = seed
        # donated train program reuses the old state's HBM (capability
        # knob, TRAIN_BENCH.json); eval stays non-donated
        self._jit_train = jax.jit(self._step, static_argnames=("train",),
                                  donate_argnums=(0,) if donate else ())
        self._jit_step = (jax.jit(self._step, static_argnames=("train",))
                          if donate else self._jit_train)

    def init_state(self, rng=None):
        rng = jax.random.PRNGKey(self.seed) if rng is None else rng
        variables = self.model.init(rng)
        state = {"model": variables, "opt": self.tx.init(variables["params"])}
        return replicate(self.mesh, state)

    def _step(self, state, noisy, clean, train: bool = True):
        def loss_fn(params):
            (est, predict), new_stats = self.model.apply(
                {"params": params, "stats": state["model"]["stats"]},
                noisy, train=train,
            )
            clean_spec = self.model.stft_clean(clean)
            clean_cut = clean[:, : est.shape[1]]
            total, l_cpx, l_mag, l_snr = self.loss(
                predict, clean_spec, clean_cut, est
            )
            metrics = {"total": total, "cpx": l_cpx, "mag": l_mag,
                       "sisnr": l_snr}
            return total, (metrics, new_stats)

        params = state["model"]["params"]
        if train:
            grads, (metrics, new_stats) = jax.grad(
                loss_fn, has_aux=True)(params)
            updates, opt = self.tx.update(grads, state["opt"], params)
            new_state = {
                "model": {"params": optax.apply_updates(params, updates),
                          "stats": new_stats},
                "opt": opt,
            }
            return new_state, metrics
        _, (metrics, _ns) = loss_fn(params)
        return state, metrics

    def train_step(self, state, batch, rng, epoch: int):
        noisy, clean = pad_and_shard(self.mesh, tuple(batch))
        return self._jit_train(state, noisy, clean, train=True)

    def eval_step(self, state, batch, rng, epoch: int):
        noisy, clean = pad_and_shard(self.mesh, tuple(batch))
        _, metrics = self._jit_step(state, noisy, clean, train=False)
        return metrics

    def fit(self, train_loader, val_loader, epochs, save_dir,
            early_stop_patience=30, save_frequency=10,
            model_name="supervised_dccrn", resume=False, logger=None):
        logger = logger or get_logger()
        ckpt = CheckpointManager(save_dir)
        state = self.init_state()
        start_epoch, best_val, patience = 0, float("inf"), 0
        if resume and ckpt.has_state():
            meta = ckpt.load_meta()
            state = replicate(self.mesh, ckpt.load_state(like=state))
            start_epoch = int(meta["epoch"]) + 1
            best_val = float(meta["best_val"])
            patience = int(meta["patience"])
            self.sched.load_state_dict(meta["sched"])

        def schedulers_step(state, val_total):
            state["opt"], _ = self.sched.step(val_total, state["opt"])
            return state

        def on_best(state, epoch):
            ckpt.save_best(state["model"])

        def on_checkpoint(state, epoch, best, pat, curves):
            ckpt.save_state(state)
            ckpt.save_meta({
                "model_name": model_name, "config": asdict(self.cfg),
                # reference equivalent: the 'datanorm=' dir-name flag +
                # config mean_file (supervised_dccrn/test.py:404-413)
                "datanorm": datanorm_to_meta(self.datanorm),
                "epoch": epoch, "best_val": best, "patience": pat,
                "sched": self.sched.state_dict(),
            })
            import json

            with open(os.path.join(save_dir, "loss_curves.json"), "w") as f:
                json.dump(curves, f)

        return run_training(
            epochs=epochs, start_epoch=start_epoch,
            train_loader=train_loader, val_loader=val_loader,
            train_step=self.train_step, eval_step=self.eval_step,
            state=state, rng=jax.random.PRNGKey(self.seed + 11),
            schedulers_step=schedulers_step, on_best=on_best,
            on_checkpoint=on_checkpoint, logger=logger,
            early_stop_patience=early_stop_patience, best_val=best_val,
            patience=patience, save_frequency=save_frequency,
        )
