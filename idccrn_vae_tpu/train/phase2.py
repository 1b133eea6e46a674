"""Phase-2 decoder fine-tuning: classical + adversarial (LSGAN).

Classical (train_second_phase_decoder.py:54): frozen twophase noisy
encoder (called with train=False), trainable clean (and optionally
noise) decoder with real skips (pad='sig'); loss = recon on clean
(+noise) decoder outputs. decode_update selects all decoder params
('all_decode') or only the skip-consuming stages ('skip_layer',
train_second_phase_decoder.py:139-175) via an optax update mask.

Adversarial (train_second_phase_adversarial.py:254-325): adds the
distinguisher D; D updates every d_step batches on (clean,
stop_grad(est)), G (decoder) updates every batch with
0.5*(D(est)-1)^2 + SI-SNR. Model selection tracks val SI-SNR recon
loss, not the total (line 393).
"""

from __future__ import annotations

import os
from dataclasses import asdict
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from idccrn_vae_tpu.losses.phase2 import AdversarialPhase2Loss, TwoPhaseLoss
from idccrn_vae_tpu.models.config import DccrnConfig
from idccrn_vae_tpu.models.discriminator import Discriminator
from idccrn_vae_tpu.models.nsvae import NsvaeEncoder, split_noisy_skips
from idccrn_vae_tpu.models.vae import VaeDecoder
from idccrn_vae_tpu.ops.stft import stft
from idccrn_vae_tpu.parallel.mesh import (
    make_mesh,
    pad_and_shard,
    replicate,
)
from idccrn_vae_tpu.train.checkpoint import CheckpointManager
from idccrn_vae_tpu.train.loop import run_training
from idccrn_vae_tpu.train.optim import PlateauScheduler, make_adam
from idccrn_vae_tpu.train.pretrain import tile_samples
from idccrn_vae_tpu.utils.logger import get_logger


def skip_layer_mask(dec_params, cfg: DccrnConfig):
    """Update mask for decode_update='skip_layer'.

    The reference unfreezes `decoders[len - skip - 1]` for each skip in
    skip_to_use (train_second_phase_decoder.py:145-150) — the MIRROR of
    the stages that concatenate skips in the forward (stage i consumes
    skiper[len-1-i], pvae_module.py:455-464). For the default full set
    0..n-1 the two coincide; for asymmetric sets we reproduce the
    reference's choice, quirk and all."""
    mask = jax.tree.map(lambda _: False, dec_params)
    n = len(dec_params["decoder"])
    for i in cfg.skip_to_use:
        idx = n - 1 - i
        mask["decoder"][idx] = jax.tree.map(lambda _: True,
                                            dec_params["decoder"][idx])
    return mask


class Phase2Trainer:
    """Classical decoder fine-tune; set adversarial=True for LSGAN."""

    def __init__(
        self,
        enc_cfg: DccrnConfig,
        dec_cfg: DccrnConfig,   # skip_mode='runtime' twophase decoder
        loss: TwoPhaseLoss,
        learning_rate: float,
        adversarial: bool = False,
        dis_lr: float = 1e-4,
        d_step: int = 1,
        decode_update: str = "all_decode",
        weight_decay: float = 1e-3,
        mesh=None,
        seed: int = 123,
        split_adv_step: Optional[bool] = None,
        donate: bool = False,
    ):
        enc_cfg.reject_int8_training("Phase2Trainer")
        dec_cfg.reject_int8_training("Phase2Trainer")
        self.enc_cfg = enc_cfg
        self.dec_cfg = dec_cfg
        self.loss = loss
        self.adversarial = adversarial
        self.adv_loss = AdversarialPhase2Loss(dec_cfg.latent_num)
        self.d_step = d_step
        self.decode_update = decode_update
        self.mesh = mesh if mesh is not None else make_mesh(1)
        self.encoder = NsvaeEncoder(enc_cfg)
        self.decoder = VaeDecoder(dec_cfg)
        # The reference's adversarial script builds and trains ONLY the
        # clean decoder (train_second_phase_adversarial.py never creates
        # a noise decoder; recon_sig_noise = None at :300) — carrying
        # one here would burn a decoder forward per step and silently
        # weight-decay its pretrained params toward zero (its loss
        # gradient is exactly zero).
        self.noise_decoder = (
            VaeDecoder(dec_cfg)
            if dec_cfg.latent_num == 2 and not adversarial else None
        )
        self.discriminator = Discriminator(dec_cfg) if adversarial else None
        self.tx = make_adam(learning_rate, weight_decay)
        self.tx_dis = make_adam(dis_lr, weight_decay) if adversarial else None
        self.sched = PlateauScheduler(0.5, 3)
        self.sched_dis = PlateauScheduler(0.5, 3) if adversarial else None
        self.seed = seed
        self._batch_counter = 0
        self._mask = None
        # donated train programs reuse the old state's HBM (capability
        # knob, TRAIN_BENCH.json); eval stays non-donated — it returns
        # the input state untouched and callers keep using it
        self._jit_train = jax.jit(
            self._step, static_argnames=("train", "update_d"),
            donate_argnums=(0,) if donate else ())
        self._jit_step = (jax.jit(self._step,
                                  static_argnames=("train", "update_d"))
                          if donate else self._jit_train)
        # Adversarial D and G updates as TWO jitted programs instead of
        # one fused step (reference batch order: D first on this batch's
        # reconstructions, then G through the UPDATED discriminator —
        # train_second_phase_adversarial.py:302-316; both forms here
        # implement that order and are numerically identical, pinned by
        # test). The split wins memory: XLA never holds both backward
        # graphs in one program, so the fused step's v5e HBM blow-up at
        # the reference batch 15 (remote-compile HTTP 500, an OOM proxy
        # — COMPILE500_PROBE.json) goes away; each program compiles at
        # ~14G. Default: on for TPU, off elsewhere.
        if split_adv_step is None:
            split_adv_step = jax.default_backend() == "tpu"
        self.split_adv = bool(adversarial and split_adv_step)
        if adversarial:
            self._jit_d = jax.jit(self._d_step,
                                  donate_argnums=(0,) if donate else ())

    def init_state(self, rng=None, pretrained: Optional[dict] = None):
        rng = jax.random.PRNGKey(self.seed) if rng is None else rng
        ks = jax.random.split(rng, 4)
        models = {
            "encoder": self.encoder.init(ks[0]),
            "decoder": self.decoder.init(ks[1]),
        }
        if self.noise_decoder is not None:
            models["noise_decoder"] = self.noise_decoder.init(ks[2])
        if self.discriminator is not None:
            models["dis"] = self.discriminator.init(ks[3])
        if pretrained:
            for k, v in pretrained.items():
                models[k] = v
        opt = self.tx.init(self._gen_params(models))
        state = {"models": models, "opt": opt}
        if self.adversarial:
            state["opt_dis"] = self.tx_dis.init(models["dis"]["params"])
        if self.decode_update == "skip_layer":
            # one mask per trainable decoder — the reference applies the
            # same skip_layer freezing to the noise decoder too
            # (train_second_phase_decoder.py:160-174)
            self._mask = {k: skip_layer_mask(p, self.dec_cfg)
                          for k, p in self._gen_params(models).items()}
        else:
            self._mask = None
        return replicate(self.mesh, state)

    def _gen_params(self, models):
        out = {"decoder": models["decoder"]["params"]}
        if self.noise_decoder is not None and "noise_decoder" in models:
            out["noise_decoder"] = models["noise_decoder"]["params"]
        return out

    def _decode(self, models, tparams, noisy, clean, noise, rng, train):
        """Shared forward: frozen encoder -> decoder(s) with real skips."""
        enc_vars = {"params": models["encoder"]["params"],
                    "stats": models["encoder"]["stats"]}
        out, _ = self.encoder.apply(enc_vars, noisy, train=False, rng=rng)
        # double/adapt noisy encoders emit doubled skip channels; the
        # pretrained-geometry decoders consume the speech (resp. noise)
        # half — same split as eval/enhance.py's serving path.
        skips_speech = split_noisy_skips(out.skips, self.enc_cfg, "speech")
        dec_vars = {"params": tparams["decoder"],
                    "stats": models["decoder"]["stats"]}
        (recon_c, pred_c), dstats = self.decoder.apply(
            dec_vars, out.stft_x, out.z_speech, skips_speech, train=train,
            pad_mode="sig",
        )
        ns = self.dec_cfg.num_samples
        s = self.enc_cfg.stft
        clean_spec = stft(clean, s.n_fft, s.hop, s.win_length)
        clean_t = tile_samples(clean, ns)[:, : recon_c.shape[1]]
        clean_spec_t = tile_samples(clean_spec, ns)
        extras = {}
        if self.noise_decoder is not None and out.z_noise is not None:
            nd_vars = {"params": tparams["noise_decoder"],
                       "stats": models["noise_decoder"]["stats"]}
            (recon_n, pred_n), nstats = self.noise_decoder.apply(
                nd_vars, out.stft_x, out.z_noise,
                split_noisy_skips(out.skips, self.enc_cfg, "noise"),
                train=train, pad_mode="sig",
            )
            noise_spec_t = tile_samples(
                stft(noise, s.n_fft, s.hop, s.win_length), ns)
            noise_t = tile_samples(noise, ns)[:, : recon_n.shape[1]]
            extras = {"recon_n": recon_n, "pred_n": pred_n,
                      "noise_t": noise_t, "noise_spec_t": noise_spec_t,
                      "nstats": nstats}
        return (recon_c, pred_c, clean_t, clean_spec_t, dstats, extras)

    def _d_update(self, dis_model, opt_dis, clean_t, est):
        """One discriminator update on (clean, stop_grad(est)); returns
        the new dis variables, opt state, and the (pre-update) D loss.
        BN stats kept from the est pass, matching the reference's call
        order (train_second_phase_adversarial.py:303-311)."""

        def d_loss_fn(dparams):
            dvars = {"params": dparams, "stats": dis_model["stats"]}
            s_true, _ = self.discriminator.apply(dvars, clean_t, train=True)
            s_est, st2 = self.discriminator.apply(dvars, est, train=True)
            return self.adv_loss.discriminator_loss(s_true, s_est), st2

        (d_lo, dis_stats), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(dis_model["params"])
        d_updates, new_opt = self.tx_dis.update(
            d_grads, opt_dis, dis_model["params"])
        new_dis = {"params": optax.apply_updates(dis_model["params"],
                                                 d_updates),
                   "stats": dis_stats}
        return new_dis, new_opt, d_lo

    def _step(self, state, noisy, clean, noise, rng, train: bool = True,
              update_d: bool = False):
        models = state["models"]
        dis_model = models.get("dis")
        opt_dis = state.get("opt_dis")
        tparams = self._gen_params(models)

        d_lo = None
        if self.adversarial and train and update_d:
            # Reference order (train_second_phase_adversarial.py:
            # 302-316): on D-update batches the discriminator updates
            # FIRST, on this batch's reconstructions from the PRE-step
            # decoder, and the generator then backprops through the
            # UPDATED discriminator. Same rng -> the G pass below
            # resamples the identical reconstructions.
            recon_c0, _pc, clean_t0, _cs, _ds, _ex = self._decode(
                models, tparams, noisy, clean, noise, rng, train)
            dis_model, opt_dis, d_lo = self._d_update(
                dis_model, opt_dis, jax.lax.stop_gradient(clean_t0),
                jax.lax.stop_gradient(recon_c0))

        def gen_loss_fn(tparams):
            recon_c, pred_c, clean_t, clean_spec_t, dstats, ex = self._decode(
                models, tparams, noisy, clean, noise, rng, train)
            if self.adversarial:
                dis_vars = {"params": dis_model["params"],
                            "stats": dis_model["stats"]}
                score, _ = self.discriminator.apply(dis_vars, recon_c,
                                                    train=train)
                total, l_recon, l_dis = self.adv_loss.generator_loss(
                    clean_t, recon_c, score)
                metrics = {"total": total, "recon_sisnr": l_recon,
                           "gen_dis": l_dis}
            else:
                lo = self.loss.phase_2_loss(
                    pred_c, clean_spec_t, clean_t, recon_c,
                    ex.get("pred_n"), ex.get("noise_spec_t"),
                    ex.get("noise_t"), ex.get("recon_n"),
                )
                total = lo.total
                metrics = {
                    "total": lo.total, "cpx_clean": lo.cpx_clean,
                    "mag_clean": lo.mag_clean, "sisnr_clean": lo.sisnr_clean,
                    "recon_sisnr": lo.sisnr_clean,
                }
            aux_stats = {"decoder": dstats}
            if "nstats" in ex:
                aux_stats["noise_decoder"] = ex["nstats"]
            return total, (metrics, aux_stats, recon_c, clean_t)

        if not train:
            _, (metrics, _a, recon_c, clean_t) = gen_loss_fn(tparams)
            if self.adversarial:
                dis_vars = {"params": models["dis"]["params"],
                            "stats": models["dis"]["stats"]}
                s_true, _ = self.discriminator.apply(dis_vars, clean_t,
                                                     train=False)
                s_est, _ = self.discriminator.apply(dis_vars, recon_c,
                                                    train=False)
                metrics["dis"] = self.adv_loss.discriminator_loss(s_true,
                                                                  s_est)
            return state, metrics

        grads, (metrics, aux_stats, recon_c, clean_t) = jax.grad(
            gen_loss_fn, has_aux=True)(tparams)
        if self._mask is not None:
            grads = jax.tree.map(
                lambda g, m: g if m else jnp.zeros_like(g),
                grads, self._mask)
        updates, opt = self.tx.update(grads, state["opt"], tparams)
        if self._mask is not None:
            # also mask the updates: Adam's weight-decay term would
            # otherwise still move frozen params.
            updates = jax.tree.map(
                lambda u, m: u if m else jnp.zeros_like(u),
                updates, self._mask)
        new_tparams = optax.apply_updates(tparams, updates)

        new_models = dict(models)
        new_models["decoder"] = {"params": new_tparams["decoder"],
                                 "stats": aux_stats["decoder"]}
        if "noise_decoder" in new_tparams:
            new_models["noise_decoder"] = {
                "params": new_tparams["noise_decoder"],
                "stats": aux_stats["noise_decoder"]}
        new_state = {"models": new_models, "opt": opt}

        if self.adversarial:
            new_models["dis"] = dis_model
            new_state["opt_dis"] = opt_dis
            if d_lo is not None:
                metrics["dis"] = d_lo
        return new_state, metrics

    def _d_step(self, state, noisy, clean, noise, rng):
        """Split-program discriminator update. Decodes with the CURRENT
        decoder (forward only — no decoder backward lives in this
        program, which is the HBM win) and applies the fused step's D
        update. Runs BEFORE the G program, matching the reference's
        D-then-G batch order."""
        models = state["models"]
        tparams = self._gen_params(models)
        recon_c, _pc, clean_t, _cs, _ds, _ex = self._decode(
            models, tparams, noisy, clean, noise, rng, train=True)
        dis_model, opt_dis, d_lo = self._d_update(
            models["dis"], state["opt_dis"],
            jax.lax.stop_gradient(clean_t),
            jax.lax.stop_gradient(recon_c))
        new_models = dict(models)
        new_models["dis"] = dis_model
        return ({"models": new_models, "opt": state["opt"],
                 "opt_dis": opt_dis}, d_lo)

    def train_step(self, state, batch, rng, epoch: int, batch_idx: int = 0):
        noisy, clean, noise = pad_and_shard(self.mesh, tuple(batch))
        update_d = self.adversarial and (self._batch_counter % self.d_step == 0)
        self._batch_counter += 1
        if self.split_adv and update_d:
            # D program first (decoder forward only), then the G program
            # through the updated discriminator — the reference's order.
            # The same rng makes both programs sample identical
            # reconstructions, like the reference's single shared tensor.
            state, d_lo = self._jit_d(state, noisy, clean, noise, rng)
            new_state, metrics = self._jit_train(
                state, noisy, clean, noise, rng, train=True, update_d=False)
            metrics = dict(metrics)
            metrics["dis"] = d_lo
            return new_state, metrics
        return self._jit_train(state, noisy, clean, noise, rng, train=True,
                               update_d=update_d)

    def eval_step(self, state, batch, rng, epoch: int):
        noisy, clean, noise = pad_and_shard(self.mesh, tuple(batch))
        _, metrics = self._jit_step(state, noisy, clean, noise, rng,
                                    train=False, update_d=False)
        return metrics

    def fit(self, train_loader, val_loader, epochs, save_dir,
            early_stop_patience=20, save_frequency=10,
            model_name="phase2_decoder", resume=False, logger=None,
            pretrained=None):
        logger = logger or get_logger()
        ckpt = CheckpointManager(save_dir)
        self._batch_counter = 0
        state = self.init_state(pretrained=pretrained)
        start_epoch, best_val, patience = 0, float("inf"), 0
        if resume and ckpt.has_state():
            meta = ckpt.load_meta()
            state = replicate(self.mesh, ckpt.load_state(like=state))
            start_epoch = int(meta["epoch"]) + 1
            best_val = float(meta["best_val"])
            patience = int(meta["patience"])
            self.sched.load_state_dict(meta["sched"])
            if self.adversarial and self.sched_dis is not None \
                    and "sched_dis" in meta:
                self.sched_dis.load_state_dict(meta["sched_dis"])
            # d_step phase continues where the run left off, so resumed
            # training interleaves D updates identically to an
            # uninterrupted run (train_second_phase_adversarial.py:302).
            self._batch_counter = int(meta.get("batch_counter", 0))

        def schedulers_step(state, val_total):
            state["opt"], _ = self.sched.step(val_total, state["opt"])
            if self.adversarial and self.sched_dis is not None:
                state["opt_dis"], _ = self.sched_dis.step(val_total,
                                                          state["opt_dis"])
            return state

        def on_best(state, epoch):
            ckpt.save_best(state["models"])

        def on_checkpoint(state, epoch, best, pat, curves):
            ckpt.save_state(state)
            ckpt.save_meta({
                "model_name": model_name,
                "enc_config": asdict(self.enc_cfg),
                "dec_config": asdict(self.dec_cfg),
                "adversarial": self.adversarial,
                "decode_update": self.decode_update,
                "epoch": epoch, "best_val": best, "patience": pat,
                "sched": self.sched.state_dict(),
                **({"sched_dis": self.sched_dis.state_dict()}
                   if self.adversarial and self.sched_dis is not None
                   else {}),
                "batch_counter": self._batch_counter,
            })
            import json

            with open(os.path.join(save_dir, "loss_curves.json"), "w") as f:
                json.dump(curves, f)

        # Adversarial model selection tracks val recon SI-SNR, not the
        # total generator loss (train_second_phase_adversarial.py:393).
        loss_key = "recon_sisnr" if self.adversarial else "total"
        return run_training(
            epochs=epochs, start_epoch=start_epoch,
            train_loader=train_loader, val_loader=val_loader,
            train_step=self.train_step, eval_step=self.eval_step,
            state=state, rng=jax.random.PRNGKey(self.seed + 17),
            schedulers_step=schedulers_step, on_best=on_best,
            on_checkpoint=on_checkpoint, logger=logger,
            early_stop_patience=early_stop_patience, best_val=best_val,
            patience=patience, save_frequency=save_frequency,
            loss_key=loss_key,
        )
