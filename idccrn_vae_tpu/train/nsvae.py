"""NSVAE training: posterior-match a noisy encoder to frozen VAEs.

The reference juggles 5 models (train_nsvae.py:50 beta_pvae): frozen
pretrained clean/noise encoder+decoder plus a trainable noisy encoder;
[Network] booleans may unfreeze the pretrained models. Decoders are
never run during NSVAE training (pure posterior matching,
train_nsvae.py:524-536) — they are carried only for checkpointing.

TPU notes: all three encoder forwards + loss + grads compile into one
SPMD step. Frozen-model params enter via lax.stop_gradient-free
closure (they're simply not differentiated); one Adam covers every
trainable leaf (mathematically identical to the reference's per-model
Adams since Adam is elementwise).
"""

from __future__ import annotations

import os
from dataclasses import asdict
from typing import Dict, Optional

import jax
import optax

from idccrn_vae_tpu.losses.nsvae_loss import NsvaeTrueKlLoss
from idccrn_vae_tpu.models.config import DccrnConfig
from idccrn_vae_tpu.models.nsvae import NsvaeEncoder
from idccrn_vae_tpu.models.vae import VaeEncoder
from idccrn_vae_tpu.parallel.mesh import (
    make_mesh,
    pad_and_shard,
    replicate,
)
from idccrn_vae_tpu.train.checkpoint import CheckpointManager
from idccrn_vae_tpu.train.loop import run_training
from idccrn_vae_tpu.train.optim import PlateauScheduler, make_adam
from idccrn_vae_tpu.utils.logger import get_logger


class NsvaeTrainer:
    def __init__(
        self,
        pre_cfg: DccrnConfig,       # geometry of the pretrained VAEs
        noisy_cfg: DccrnConfig,     # geometry of the noisy encoder
        loss: NsvaeTrueKlLoss,
        learning_rate: float,
        trainable: Optional[Dict[str, bool]] = None,  # clean_enc/noise_enc
        weight_decay: float = 1e-3,
        mesh=None,
        seed: int = 123,
        donate: bool = False,
    ):
        pre_cfg.reject_int8_training("NsvaeTrainer")
        noisy_cfg.reject_int8_training("NsvaeTrainer")
        self.pre_cfg = pre_cfg
        self.noisy_cfg = noisy_cfg
        self.loss = loss
        self.mesh = mesh if mesh is not None else make_mesh(1)
        self.clean_enc = VaeEncoder(pre_cfg)
        self.noise_enc = VaeEncoder(pre_cfg)
        self.noisy_enc = NsvaeEncoder(noisy_cfg)
        self.trainable = {"clean_enc": False, "noise_enc": False,
                          **(trainable or {})}
        self.tx = make_adam(learning_rate, weight_decay)
        self.sched = PlateauScheduler(0.5, 3)
        self.seed = seed
        # donated train program reuses the old state's HBM (capability
        # knob, TRAIN_BENCH.json); eval stays non-donated — it returns
        # the input state untouched and callers keep using it
        self._jit_train = jax.jit(self._step, static_argnames=("train",),
                                  donate_argnums=(0,) if donate else ())
        self._jit_step = (jax.jit(self._step, static_argnames=("train",))
                          if donate else self._jit_train)

    def init_state(self, rng=None, pretrained: Optional[Dict] = None):
        """pretrained: optional dict with 'clean_enc'/'noise_enc'
        variable trees (e.g. loaded via CheckpointManager.load_best)."""
        rng = jax.random.PRNGKey(self.seed) if rng is None else rng
        k1, k2, k3 = jax.random.split(rng, 3)
        variables = {
            "clean_enc": self.clean_enc.init(k1),
            "noise_enc": self.noise_enc.init(k2),
            "noisy_enc": self.noisy_enc.init(k3),
        }
        if pretrained:
            for k, v in pretrained.items():
                variables[k] = v
        state = {
            "models": variables,
            "opt": self.tx.init(self._trainable_params(variables)),
        }
        return replicate(self.mesh, state)

    def _trainable_params(self, variables):
        out = {"noisy_enc": variables["noisy_enc"]["params"]}
        for name in ("clean_enc", "noise_enc"):
            if self.trainable.get(name):
                out[name] = variables[name]["params"]
        return out

    def _step(self, state, noisy, clean, noise, rng, train: bool = True):
        models = state["models"]
        k1, k2, k3 = jax.random.split(rng, 3)

        # FROZEN pretrained encoders run in eval mode — BN normalizes
        # with their pretrained running stats and those stats are NOT
        # updated/checkpointed over. The reference puts every
        # non-trainable model in eval() and forwards it with train=False
        # under no_grad (train_nsvae.py:451-468, 485-499); only
        # unfrozen models (and always the noisy encoder) see batch
        # statistics.
        def mode(name):
            return train and (name == "noisy_enc"
                              or bool(self.trainable.get(name)))

        def loss_fn(tparams):
            def variables(name):
                params = tparams.get(name, models[name]["params"])
                return {"params": params, "stats": models[name]["stats"]}

            clean_out, cs = self.clean_enc.apply(
                variables("clean_enc"), clean, train=mode("clean_enc"),
                rng=k1)
            noise_out, ns = self.noise_enc.apply(
                variables("noise_enc"), noise, train=mode("noise_enc"),
                rng=k2)
            noisy_out, ys = self.noisy_enc.apply(
                variables("noisy_enc"), noisy, train=mode("noisy_enc"),
                rng=k3)
            lo = self.loss(
                clean_out.gauss, noise_out.gauss,
                noisy_out.gauss_speech, noisy_out.gauss_noise,
                skips_clean=clean_out.skips, skips_noise=noise_out.skips,
                skips_noisy=noisy_out.skips,
            )
            metrics = {
                "total": lo.total, "kl": lo.kl, "kl_clean": lo.kl_clean,
                "kl_noise": lo.kl_noise, "dismiu_speech": lo.dismiu_speech,
                "dismiu_noise": lo.dismiu_noise, "resi": lo.resi,
            }
            return lo.total, (metrics, {"clean_enc": cs, "noise_enc": ns,
                                        "noisy_enc": ys})

        tparams = self._trainable_params(models)
        if train:
            grads, (metrics, new_stats) = jax.grad(
                loss_fn, has_aux=True)(tparams)
            updates, opt = self.tx.update(grads, state["opt"], tparams)
            new_tparams = optax.apply_updates(tparams, updates)
            new_models = {}
            for name in models:
                new_models[name] = {
                    "params": new_tparams.get(name, models[name]["params"]),
                    # frozen models ran with train=False: keep their
                    # pretrained running stats byte-identical
                    "stats": (new_stats[name] if mode(name)
                              else models[name]["stats"]),
                }
            return {"models": new_models, "opt": opt}, metrics
        _, (metrics, _s) = loss_fn(tparams)
        return state, metrics

    def train_step(self, state, batch, rng, epoch: int):
        noisy, clean, noise = pad_and_shard(self.mesh, tuple(batch))
        return self._jit_train(state, noisy, clean, noise, rng, train=True)

    def eval_step(self, state, batch, rng, epoch: int):
        noisy, clean, noise = pad_and_shard(self.mesh, tuple(batch))
        _, metrics = self._jit_step(state, noisy, clean, noise, rng,
                                    train=False)
        return metrics

    def fit(self, train_loader, val_loader, epochs, save_dir,
            early_stop_patience=20, save_frequency=10,
            model_name="complex_NSVAE", resume=False, logger=None,
            pretrained=None):
        logger = logger or get_logger()
        ckpt = CheckpointManager(save_dir)
        state = self.init_state(pretrained=pretrained)
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
            ckpt.save_best(state["models"])

        def on_checkpoint(state, epoch, best, pat, curves):
            ckpt.save_state(state)
            ckpt.save_meta({
                "model_name": model_name,
                "pre_config": asdict(self.pre_cfg),
                "noisy_config": asdict(self.noisy_cfg),
                "trainable": self.trainable,
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
            state=state, rng=jax.random.PRNGKey(self.seed + 13),
            schedulers_step=schedulers_step, on_best=on_best,
            on_checkpoint=on_checkpoint, logger=logger,
            early_stop_patience=early_stop_patience, best_val=best_val,
            patience=patience, save_frequency=save_frequency,
        )
