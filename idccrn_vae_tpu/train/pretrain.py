"""CVAE / NVAE pretraining (the reference's GRU_VAE_Train, train.py:54).

TPU-first structure: ONE jitted SPMD train step covering both models
(encoder+decoder forward, loss, grads, two Adam updates, BN-stat
threading), batch sharded over the data mesh; the epoch loop, plateau
schedulers, early stopping and checkpointing run on host.
"""

from __future__ import annotations

import os
from dataclasses import asdict
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from idccrn_vae_tpu.losses.vae_loss import PretrainVaeLoss
from idccrn_vae_tpu.models.config import DccrnConfig
from idccrn_vae_tpu.models.vae import VaeDecoder, VaeEncoder
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


def tile_samples(x: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """(B, ...) -> (B*S, ...) sample-major within batch (repeat)."""
    return jnp.repeat(x, num_samples, axis=0)


class PretrainTrainer:
    def __init__(
        self,
        cfg: DccrnConfig,
        loss: PretrainVaeLoss,
        learning_rate: float,
        weight_decay: float = 1e-3,
        datanorm: Optional[Tuple[np.ndarray, np.ndarray]] = None,
        mesh=None,
        seed: int = 123,
        donate: bool = False,
    ):
        cfg.reject_int8_training("PretrainTrainer")
        self.cfg = cfg
        self.loss = loss
        self.mesh = mesh if mesh is not None else make_mesh(1)
        self.datanorm = datanorm  # kept host-side for meta.json
        dn = None
        if datanorm is not None:
            dn = (jnp.asarray(datanorm[0]), jnp.asarray(datanorm[1]))
        self.encoder = VaeEncoder(cfg, dn)
        self.decoder = VaeDecoder(cfg, dn)
        self.tx_en = make_adam(learning_rate, weight_decay)
        self.tx_de = make_adam(learning_rate, weight_decay)
        self.sched_en = PlateauScheduler(0.5, 3)
        self.sched_de = PlateauScheduler(0.5, 3)
        self.seed = seed
        # donate=True hands the old state's HBM to XLA for in-place
        # reuse — time-neutral at the B=16 sweet spot but raises the
        # batch-capability ceiling (B=20 fits only donated,
        # TRAIN_BENCH.json). Eval keeps a NON-donated program: it
        # returns the input state untouched and callers keep using it.
        self._train_step = jax.jit(self._step, static_argnames=("train",),
                                   donate_argnums=(0,) if donate else ())
        self._eval_jit = (jax.jit(self._step, static_argnames=("train",))
                          if donate else self._train_step)

    # -- state -------------------------------------------------------------
    def init_state(self, rng=None):
        rng = jax.random.PRNGKey(self.seed) if rng is None else rng
        k1, k2 = jax.random.split(rng)
        enc_v = self.encoder.init(k1)
        dec_v = self.decoder.init(k2)
        state = {
            "enc": enc_v,
            "dec": dec_v,
            "opt_en": self.tx_en.init(enc_v["params"]),
            "opt_de": self.tx_de.init(dec_v["params"]),
        }
        return replicate(self.mesh, state)

    # -- one step ----------------------------------------------------------
    def _forward(self, enc_params, dec_params, enc_stats, dec_stats, wav,
                 rng, train: bool):
        cfg = self.cfg
        # skip_mode='prob' needs a second stream for the decoder's
        # train-time real-vs-zero skip coin (pvae_module.py:1731-1737);
        # every other mode keeps the single-stream draw unchanged.
        skip_rng = None
        if cfg.skip_mode == "prob":
            rng, skip_rng = jax.random.split(rng)
        out, enc_stats2 = self.encoder.apply(
            {"params": enc_params, "stats": enc_stats}, wav,
            train=train, rng=rng,
        )
        (recon, predict), dec_stats2 = self.decoder.apply(
            {"params": dec_params, "stats": dec_stats}, out.stft_x, out.z,
            out.skips, train=train, rng=skip_rng,
        )
        s = cfg.num_samples
        wav_t = tile_samples(wav, s)
        stft_t = tile_samples(out.stft_x, s)
        # Align waveform target to ISTFT output length ((T-1)*hop).
        wav_t = wav_t[:, : recon.shape[1]]
        return out, recon, predict, wav_t, stft_t, enc_stats2, dec_stats2

    def _step(self, state, wav, rng, kl_w, train: bool = True):
        def loss_fn(params):
            out, recon, predict, wav_t, stft_t, es, ds = self._forward(
                params["enc"], params["dec"],
                state["enc"]["stats"], state["dec"]["stats"],
                wav, rng, train,
            )
            lo = self.loss(wav_t, recon, stft_t, predict, out.gauss, out.z,
                           kl_w)
            metrics = {
                "total": lo.total, "recon": lo.recon, "kl": lo.kl,
                "mi": lo.mi, "cpx": lo.loss_cpx, "mag": lo.loss_mag,
                "sisnr": lo.loss_sisnr,
            }
            return lo.total, (metrics, es, ds)

        params = {"enc": state["enc"]["params"], "dec": state["dec"]["params"]}
        if train:
            grads, (metrics, es, ds) = jax.grad(loss_fn, has_aux=True)(params)
            up_en, opt_en = self.tx_en.update(
                grads["enc"], state["opt_en"], params["enc"])
            up_de, opt_de = self.tx_de.update(
                grads["dec"], state["opt_de"], params["dec"])
            new_state = {
                "enc": {"params": optax.apply_updates(params["enc"], up_en),
                        "stats": es},
                "dec": {"params": optax.apply_updates(params["dec"], up_de),
                        "stats": ds},
                "opt_en": opt_en,
                "opt_de": opt_de,
            }
            return new_state, metrics
        _, (metrics, _es, _ds) = loss_fn(params)
        return state, metrics

    # -- public step wrappers ----------------------------------------------
    def train_step(self, state, batch, rng, epoch: int):
        wav = pad_and_shard(self.mesh, batch)
        kl_w = jnp.asarray(self.loss.kl_weight_at(epoch), jnp.float32)
        return self._train_step(state, wav, rng, kl_w, train=True)

    def eval_step(self, state, batch, rng, epoch: int):
        wav = pad_and_shard(self.mesh, batch)
        # The reference scores VALIDATION at the fully-warm KL weight
        # regardless of the current epoch (train.py:348 passes
        # epoch=kl_warm_epochs+2 into cal_loss); the annealed weight is
        # train-only. Matching it matters beyond reporting: val total
        # drives the plateau scheduler, best-epoch choice and early
        # stop, so an annealed val weight changes training trajectories
        # (caught by tools/trajectory_parity.py, round 5).
        kl_w = jnp.asarray(
            self.loss.kl_weight_at(self.loss.kl_warm_epochs + 2),
            jnp.float32)
        _, metrics = self._eval_jit(state, wav, rng, kl_w, train=False)
        return metrics

    # -- fit ---------------------------------------------------------------
    def fit(
        self,
        train_loader,
        val_loader,
        epochs: int,
        save_dir: str,
        early_stop_patience: int = 30,
        save_frequency: int = 10,
        model_name: str = "complex_CVAE",
        resume: bool = False,
        logger=None,
    ):
        logger = logger or get_logger()
        ckpt = CheckpointManager(save_dir)
        state = self.init_state()
        start_epoch, best_val, patience = 0, float("inf"), 0
        if resume and ckpt.has_state():
            meta = ckpt.load_meta()
            state = ckpt.load_state(like=state)
            state = replicate(self.mesh, state)
            start_epoch = int(meta["epoch"]) + 1
            best_val = float(meta["best_val"])
            patience = int(meta["patience"])
            self.sched_en.load_state_dict(meta["sched_en"])
            self.sched_de.load_state_dict(meta["sched_de"])
            logger.info("resumed from epoch %d", start_epoch)

        def schedulers_step(state, val_total):
            state["opt_en"], _ = self.sched_en.step(val_total, state["opt_en"])
            state["opt_de"], _ = self.sched_de.step(val_total, state["opt_de"])
            return state

        def on_best(state, epoch):
            ckpt.save_best({"enc": state["enc"], "dec": state["dec"]})

        def on_checkpoint(state, epoch, best, pat, curves):
            ckpt.save_state(state)
            ckpt.save_meta({
                "model_name": model_name,
                "config": asdict(self.cfg),
                # persisted so eval/export rebuild the SAME forward;
                # the reference silently drops datanorm at VAE eval
                # (test_prevae.py:549-555 passes no data_mean/std)
                "datanorm": datanorm_to_meta(self.datanorm),
                "epoch": epoch,
                "best_val": best,
                "patience": pat,
                "sched_en": self.sched_en.state_dict(),
                "sched_de": self.sched_de.state_dict(),
            })
            import json

            with open(os.path.join(save_dir, "loss_curves.json"), "w") as f:
                json.dump(curves, f)

        state, curves, best = run_training(
            epochs=epochs, start_epoch=start_epoch,
            train_loader=train_loader, val_loader=val_loader,
            train_step=self.train_step, eval_step=self.eval_step,
            state=state, rng=jax.random.PRNGKey(self.seed + 7),
            schedulers_step=schedulers_step, on_best=on_best,
            on_checkpoint=on_checkpoint, logger=logger,
            early_stop_patience=early_stop_patience, best_val=best_val,
            patience=patience, save_frequency=save_frequency,
        )
        return state, curves, best
