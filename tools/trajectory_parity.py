#!/usr/bin/env python
"""Multi-epoch training-LOOP parity vs the reference's own train.py.

test_oracle_train_step.py pins ONE gradient step; this harness pins the
EPOCH LOOP (VERDICT r4 weak #2): the reference's GRU_VAE_Train
(/root/reference/i_dccrn_vae/pretrained_vaes/train.py:54-434) runs
side-by-side with PretrainTrainer.fit from IDENTICAL initial weights on
an identical tiny corpus, and the per-epoch trajectories are compared:

  * per-epoch train/val loss components (total, recon, kl, mi, cpx,
    mag, sisnr) — sample-weighted epoch means, both sides;
  * the KL-annealing weights ACTUALLY applied per train epoch
    (reference: cal_loss(..., epoch) -> kl_warm_weights[epoch],
    pretrain_pvaes_loss.py:339-343), and the fully-warm weight at VAL
    (train.py:348 passes kl_warm_epochs+2 — the round-5 fix in
    train/pretrain.py::eval_step);
  * the ReduceLROnPlateau LR after every epoch (factor 0.5, patience 3,
    rel threshold 1e-4 — train.py:128-131), both optimizers;
  * best-epoch selection (strict <, train.py:369) and the early-stop
    epoch (cpt_patience == early_stop_patience, train.py:433).

Determinism: reparameterization noise is forced to ZERO on both sides
(torch.randn_like -> zeros_like; jax.random.normal -> zeros), so z ==
mu and both loops are exactly reproducible — the stochastic draw is
framework-RNG-specific and is NOT what this harness tests (per-step
gradient parity under shared weights is already pinned by
test_oracle_train_step.py). shuffle=False and counts divisible by the
batch size keep batch composition identical (torch DataLoader keeps
partial final batches, BatchLoader drops them).

The reference module import needs three shims, installed here only:
soundfile/librosa (not in the image — backed by data/audio_io.read_wav)
and torch.cuda.current_device (train.py:37 calls it at import on a
CPU-only box).

Writes TRAJECTORY_PARITY.json. Pass/fail: discrete decisions (LR
trajectory, best epoch, stop epoch, applied KL weights) must match
EXACTLY; per-epoch losses within MAX_REL (f32 drift over ~50 steps).

Usage: python tools/trajectory_parity.py [--root DIR] [--epochs N]
(~2-4 min on CPU)
"""

import argparse
import glob
import importlib.util
import json
import os
import pickle
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
REF_ROOT = "/root/reference"

FS = 16000
SEQ_LEN_FRAMES = 50          # sequence_len (frames): (50-1)*8 = 392 samples
HOP, NFFT, WLEN = 8, 32, 16
WAV_SAMPLES = 800            # -> n_seq = (1 + 800//8) // 50 = 2 segments
N_TRAIN_WAVS, N_VAL_WAVS = 8, 4   # 16 / 8 segments; batch 4 -> 4 / 2 batches
BATCH = 4
KL_WARM, KL_W, MI_W = 6, 0.05, 0.02
LR = 2e-3
EARLY_STOP = 6
MAX_REL = 5e-3               # per-epoch loss tolerance (f32 drift)

LOSS_KEYS = ("total", "recon", "kl", "mi", "cpx", "mag", "sisnr")


def install_ref_shims():
    """soundfile/librosa backed by our native wav IO; CUDA query stub."""
    from idccrn_vae_tpu.data.audio_io import read_wav

    sf = types.ModuleType("soundfile")
    sf.read = lambda path, **kw: read_wav(path)
    sys.modules["soundfile"] = sf

    lib = types.ModuleType("librosa")
    util = types.ModuleType("librosa.util")
    util.find_files = lambda d, ext="wav": sorted(
        glob.glob(os.path.join(d, f"**/*.{ext}"), recursive=True))
    eff = types.ModuleType("librosa.effects")
    eff.trim = lambda x, top_db=30: (x, (0, len(x)))
    lib.util, lib.effects = util, eff
    lib.load = lambda path, sr=None: read_wav(path)
    sys.modules["librosa"] = lib
    sys.modules["librosa.util"] = util
    sys.modules["librosa.effects"] = eff

    import torch

    torch.cuda.current_device = lambda: 0  # train.py:37, import-time


def make_corpus(root):
    from idccrn_vae_tpu.data.audio_io import write_wav

    dirs = {}
    for split, n in (("train", N_TRAIN_WAVS), ("val", N_VAL_WAVS)):
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            rng = np.random.default_rng(1000 * (split == "val") + i)
            x = (rng.standard_normal(WAV_SAMPLES) * 0.3).astype(np.float32)
            write_wav(os.path.join(d, f"utt_{i:02d}.wav"), x, FS)
        dirs[split] = d
    return dirs


def write_ini(root, dirs, name):
    path = os.path.join(root, f"{name}.ini")
    with open(path, "w") as f:
        f.write(f"""[User]
logger_type = 1
saved_root = {root}/models_{name}
train_data_dir = {dirs['train']}
val_data_dir = {dirs['val']}
mean_file = {root}/unused_mean.txt
std_file = {root}/unused_std.txt
model_name = traj_cvae
[STFT]
winlen = {WLEN}
nfft = {NFFT}
hopfrac = {HOP}
fs = {FS}
trim = False
[Network]
z_dim = 2
[Training]
optimization = adam
lr = {LR}
epochs = {{epochs}}
early_stop_patience = {EARLY_STOP}
save_frequency = 1000000
[DataFrame]
dataset_name = traj_{name}
suffix = wav
num_workers = 0
batch_size = {BATCH}
shuffle = False
sequence_len = {SEQ_LEN_FRAMES}
""".replace("{epochs}", str(write_ini.epochs)))
    return path


def run_reference(root, dirs, epochs):
    """The reference's own GRU_VAE_Train at tiny geometry, eps=0."""
    install_ref_shims()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import torch

    torch.randn_like = torch.zeros_like  # z == mu, this process only

    # record every ReduceLROnPlateau's LR after each .step()
    import torch.optim.lr_scheduler as sched_mod

    Orig = sched_mod.ReduceLROnPlateau

    class Recording(Orig):
        instances = []

        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.lr_log = []
            Recording.instances.append(self)

        def step(self, metric):
            super().step(metric)
            self.lr_log.append(self.optimizer.param_groups[0]["lr"])

    sched_mod.ReduceLROnPlateau = Recording

    spec = importlib.util.spec_from_file_location(
        "ref_pretrain_train",
        os.path.join(REF_ROOT, "i_dccrn_vae/pretrained_vaes/train.py"))
    T = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(T)

    from oracle_ref import sd_numpy, tiny_net_params

    T.net_config.get_net_params = lambda: tiny_net_params(True)
    T.causal_netconfig.get_net_params = lambda: tiny_net_params(True)

    # Capture the initial weights GRU_VAE_Train will draw: same seed,
    # same construction order (encoder then decoder, train.py:106-113).
    mk = dict(causal=True, device="cpu", zdim=2, num_samples=1)
    torch.manual_seed(123)
    enc0 = T.pvae_dccrn_encoder_skip_prepare(
        tiny_net_params(True), mk["causal"], mk["device"], mk["zdim"],
        NFFT, HOP, WLEN, mk["num_samples"])
    dec0 = T.pvae_dccrn_decoder_skip_prepare(
        tiny_net_params(True), mk["causal"], mk["device"],
        mk["num_samples"], mk["zdim"], NFFT, HOP, WLEN,
        recon_type="real_imag", skip_to_use=[0, 1])
    sd_enc0, sd_dec0 = sd_numpy(enc0), sd_numpy(dec0)
    del enc0, dec0

    write_ini.epochs = epochs
    cfg_path = write_ini(root, dirs, "ref")
    cfg = T.myconf()
    cfg.read(cfg_path)
    log_params = {
        "reload": False, "reload_savedir": None, "cfg_file": cfg_path,
        "first_use_dataset": True, "causal": True, "zdim": 2,
        "num_samples": 1, "kl_ann_flag": True, "kl_warm_epochs": KL_WARM,
        "kl_weight": KL_W, "mi_weight": MI_W, "skipc": False,
        "fclatent": False, "skip_to_use": [0, 1], "skip_padding": True,
        "recon_type": "real_imag", "recon_loss_type": "multiple",
        "recon_loss_weight": [1.0, 1.0, 0.0], "prior_mode": "ri_inde",
        "data_mean": None, "data_std": None, "data_norm": False,
    }
    os.chdir(root)  # the reference writes its dataset pkl cache to CWD
    torch.manual_seed(123)  # GRU_VAE_Train redraws the same init
    T.GRU_VAE_Train(cfg, log_params)

    saved_root = os.path.join(root, "models_ref")
    save_dir = os.path.join(saved_root, sorted(os.listdir(saved_root))[-1])
    with open(os.path.join(save_dir, "loss_model.pckl"), "rb") as f:
        (train_loss, val_loss, train_recon, train_kl, train_mi, train_cpx,
         train_mag, train_sisnr, val_recon, val_kl, val_mi, val_cpx,
         val_mag, val_sisnr) = pickle.load(f)
    ckpt = torch.load(
        os.path.join(save_dir, "traj_cvae_checkpoint.pt"),
        weights_only=False)
    sched_en, sched_de = Recording.instances[0], Recording.instances[1]

    def pack(total, recon, kl, mi, cpx, mag, sisnr):
        return {k: [float(x) for x in v] for k, v in zip(
            LOSS_KEYS, (total, recon, kl, mi, cpx, mag, sisnr))}

    warm = T.KL_annealing(KL_WARM).frange_cycle_linear(stop=KL_W)
    return {
        "train": pack(train_loss, train_recon, train_kl, train_mi,
                      train_cpx, train_mag, train_sisnr),
        "val": pack(val_loss, val_recon, val_kl, val_mi, val_cpx,
                    val_mag, val_sisnr),
        "lr_en": [float(x) for x in sched_en.lr_log],
        "lr_de": [float(x) for x in sched_de.lr_log],
        "best_epoch": int(ckpt["epoch"]),
        "n_epochs_run": int(len(train_loss)),
        "kl_warm_weights": [float(x) for x in warm.numpy()],
        "applied_train_kl_w": [
            float(warm[e]) if e < KL_WARM else KL_W
            for e in range(len(train_loss))],
    }, (sd_enc0, sd_dec0)


def run_ours(root, dirs, epochs, sd_enc0, sd_dec0):
    """PretrainTrainer.fit from the reference's initial weights, eps=0."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.random.normal = (  # z == mu, mirroring the torch-side patch
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))

    from idccrn_vae_tpu.cli.common import loaders_from_ini
    from idccrn_vae_tpu.losses.vae_loss import (PretrainVaeLoss,
                                                kl_annealing_schedule)
    from idccrn_vae_tpu.models.config import DccrnConfig, StftConfig
    from idccrn_vae_tpu.models.torch_import import (import_vae_decoder,
                                                    import_vae_encoder)
    from idccrn_vae_tpu.parallel.mesh import replicate
    from idccrn_vae_tpu.train.optim import get_learning_rate
    from idccrn_vae_tpu.train.pretrain import PretrainTrainer
    from idccrn_vae_tpu.utils.config import load_ini
    from idccrn_vae_tpu.utils.logger import get_logger

    cfg = DccrnConfig(
        stft=StftConfig(n_fft=NFFT, hop=HOP, win_length=WLEN),
        encoder_channels=(1, 2, 4), zdim=2, num_samples=1, causal=True,
        skip_mode="zero", recon_type="real_imag", skip_to_use=(0, 1),
        lstm_hidden=2)
    warm = kl_annealing_schedule(KL_WARM) * KL_W
    loss = PretrainVaeLoss(
        kl_warm_weights=warm, kl_weight=KL_W, mi_weight=MI_W,
        recon_loss_type="multiple", recon_loss_weight=(1.0, 1.0, 0.0),
        num_samples=1, prior_mode="ri_inde",
        ref_mag_bug=True)  # exact-parity mode: reproduce the
    # reference's ori_mag-from-real-twice slip
    # (pretrain_pvaes_loss.py:192) so trajectories are comparable;
    # production default keeps the corrected magnitude
    trainer = PretrainTrainer(cfg, loss, learning_rate=LR)

    def reset_bn_counts(variables):
        # convert_bn marks imported stats as initialized (count=1) —
        # right for TRAINED checkpoints (their init_flag is consumed) —
        # but sd_enc0/sd_dec0 came from a FRESH torch model whose
        # init_flag is a live python attr (complex_progress.py:114, not
        # in the state_dict): its first train batch will WHOLESALE-COPY
        # batch stats. count=0 makes our CBN do the same copy; without
        # this, our side EMA-blends from (0,1,0,1) and every eval-mode
        # forward diverges (observed 4x on val recon).
        return {
            "params": variables["params"],
            "stats": jax.tree_util.tree_map_with_path(
                lambda p, x: (jnp.zeros((), jnp.int32)
                              if getattr(p[-1], "key", None) == "count"
                              else x),
                variables["stats"]),
        }

    enc_vars = reset_bn_counts(import_vae_encoder(sd_enc0, cfg))
    dec_vars = reset_bn_counts(import_vae_decoder(sd_dec0, cfg))
    state0 = replicate(trainer.mesh, {
        "enc": enc_vars, "dec": dec_vars,
        "opt_en": trainer.tx_en.init(enc_vars["params"]),
        "opt_de": trainer.tx_de.init(dec_vars["params"]),
    })
    trainer.init_state = lambda rng=None: state0

    lr_logs = {"en": [], "de": []}
    for tag in ("en", "de"):
        sched = getattr(trainer, f"sched_{tag}")
        orig = sched.step

        def rec(metric, opt_state, _orig=orig, _tag=tag):
            out, reduced = _orig(metric, opt_state)
            lr_logs[_tag].append(float(get_learning_rate(out)))
            return out, reduced

        sched.step = rec

    write_ini.epochs = epochs
    ini = load_ini(write_ini(root, dirs, "ours"))
    train_loader, val_loader, _n1, _n2 = loaders_from_ini(
        ini, "single", True)
    save_dir = os.path.join(root, "models_ours_run")
    os.makedirs(save_dir, exist_ok=True)
    _state, curves, _best = trainer.fit(
        train_loader, val_loader, epochs=epochs, save_dir=save_dir,
        early_stop_patience=EARLY_STOP, save_frequency=10 ** 6,
        model_name="traj_cvae",
        logger=get_logger(os.path.join(save_dir, "train.log"), 1))
    with open(os.path.join(save_dir, "meta.json")) as f:
        meta = json.load(f)

    def pack(series):
        return {k: [float(e[k]) for e in series] for k in LOSS_KEYS}

    return {
        "train": pack(curves["train"]),
        "val": pack(curves["val"]),
        "lr_en": lr_logs["en"],
        "lr_de": lr_logs["de"],
        "best_epoch": int(meta["epoch"]),
        "n_epochs_run": len(curves["val"]),
        "kl_warm_weights": [float(x) for x in warm],
        "applied_train_kl_w": [loss.kl_weight_at(e)
                               for e in range(len(curves["val"]))],
    }


def compare(ref, ours):
    diff = {"max_rel_loss": {}}
    n = min(ref["n_epochs_run"], ours["n_epochs_run"])
    for split in ("train", "val"):
        for k in LOSS_KEYS:
            a = np.asarray(ref[split][k][:n])
            b = np.asarray(ours[split][k][:n])
            denom = np.maximum(np.abs(a), 1e-3)
            diff["max_rel_loss"][f"{split}.{k}"] = float(
                np.max(np.abs(a - b) / denom))
    diff["kl_schedule_max_abs"] = float(np.max(np.abs(
        np.asarray(ref["kl_warm_weights"])
        - np.asarray(ours["kl_warm_weights"]))))
    diff["applied_kl_w_max_abs"] = float(np.max(np.abs(
        np.asarray(ref["applied_train_kl_w"][:n])
        - np.asarray(ours["applied_train_kl_w"][:n]))))
    # optax carries the LR as f32 (0.002 -> 0.0020000001); compare the
    # DECISIONS (drop-or-not per epoch), not the float encoding
    diff["lr_en_match"] = bool(np.allclose(
        ref["lr_en"][:n], ours["lr_en"][:n], rtol=1e-6))
    diff["lr_de_match"] = bool(np.allclose(
        ref["lr_de"][:n], ours["lr_de"][:n], rtol=1e-6))
    diff["best_epoch_match"] = ref["best_epoch"] == ours["best_epoch"]
    diff["stop_epoch_match"] = (ref["n_epochs_run"]
                                == ours["n_epochs_run"])
    ok = (max(diff["max_rel_loss"].values()) < MAX_REL
          and diff["kl_schedule_max_abs"] < 1e-7
          and diff["applied_kl_w_max_abs"] < 1e-7
          and diff["lr_en_match"] and diff["lr_de_match"]
          and diff["best_epoch_match"] and diff["stop_epoch_match"])
    diff["verdict"] = "MATCH" if ok else "MISMATCH"
    return diff


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default="/root/traj_run")
    ap.add_argument("--epochs", type=int, default=14)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "TRAJECTORY_PARITY.json"))
    args = ap.parse_args()
    root = os.path.abspath(args.root)
    os.makedirs(root, exist_ok=True)
    dirs = make_corpus(root)

    print("== reference loop (torch, eps=0) ==", flush=True)
    ref, (sd_enc0, sd_dec0) = run_reference(root, dirs, args.epochs)
    print("== our loop (PretrainTrainer.fit, same init, eps=0) ==",
          flush=True)
    ours = run_ours(root, dirs, args.epochs, sd_enc0, sd_dec0)
    diff = compare(ref, ours)

    report = {
        "geometry": {
            "channels": [1, 2, 4], "zdim": 2, "causal": True,
            "skip_padding": True, "recon_type": "real_imag",
            "sequence_len": SEQ_LEN_FRAMES, "batch": BATCH,
            "train_segments": 2 * N_TRAIN_WAVS,
            "val_segments": 2 * N_VAL_WAVS,
            "kl": {"warm_epochs": KL_WARM, "weight": KL_W,
                   "mi_weight": MI_W},
            "lr": LR, "early_stop_patience": EARLY_STOP,
            "epochs_budget": args.epochs,
            "eps_zeroed": True,
        },
        "reference": ref,
        "ours": ours,
        "diff": diff,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(diff, indent=1))
    print(f"report: {args.out}")
    if diff["verdict"] != "MATCH":
        sys.exit(1)


if __name__ == "__main__":
    main()
