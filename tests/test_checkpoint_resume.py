"""Checkpoint save/restore + training resume continuity."""

import dataclasses
import os

import jax
import numpy as np

from idccrn_vae_tpu.data.features import spec_features
from idccrn_vae_tpu.losses.vae_loss import PretrainVaeLoss, kl_annealing_schedule
from idccrn_vae_tpu.models.config import DccrnConfig
from idccrn_vae_tpu.train.checkpoint import CheckpointManager
from idccrn_vae_tpu.train.optim import (
    PlateauScheduler,
    get_learning_rate,
    make_adam,
    set_learning_rate,
)
from idccrn_vae_tpu.train.pretrain import PretrainTrainer

TINY = DccrnConfig(encoder_channels=(1, 2, 2, 4, 4, 4, 4), zdim=4,
                   num_samples=1)


class _Loader:
    def __init__(self, n=2, b=2, length=1600, seed=0):
        rng = np.random.default_rng(seed)
        self.batches = [rng.standard_normal((b, length)).astype(np.float32)
                        for _ in range(n)]

    def __iter__(self):
        return iter(self.batches)


def _trainer():
    loss = PretrainVaeLoss(kl_annealing_schedule(3), 0.01, num_samples=1)
    return PretrainTrainer(TINY, loss, 1e-3)


def test_checkpoint_roundtrip(tmp_path):
    tr = _trainer()
    state = tr.init_state()
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    ckpt.save_state(state)
    ckpt.save_meta({"epoch": 3, "best_val": 1.5, "patience": 2})
    restored = ckpt.load_state(like=jax.tree.map(np.asarray, state))
    # structure equality first: a truncated restore must not slip
    # through the leaf zip below
    assert (jax.tree.structure(state)
            == jax.tree.structure(restored))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    meta = ckpt.load_meta()
    assert meta["epoch"] == 3


def test_fit_then_resume(tmp_path):
    save_dir = str(tmp_path / "run")
    tr = _trainer()
    tr.fit(_Loader(), _Loader(seed=1), epochs=2, save_dir=save_dir,
           early_stop_patience=10, save_frequency=1)
    meta1 = CheckpointManager(save_dir).load_meta()
    assert meta1["epoch"] == 1

    # resume continues from epoch 2
    tr2 = _trainer()
    tr2.fit(_Loader(), _Loader(seed=1), epochs=4, save_dir=save_dir,
            early_stop_patience=10, save_frequency=1, resume=True)
    meta2 = CheckpointManager(save_dir).load_meta()
    assert meta2["epoch"] == 3
    assert os.path.exists(os.path.join(save_dir, "best"))


def test_plateau_scheduler_reduces_lr():
    tx = make_adam(1e-3)
    opt = tx.init({"w": np.zeros(3, np.float32)})
    sched = PlateauScheduler(factor=0.5, patience=1)
    opt, _ = sched.step(1.0, opt)       # best=1.0
    opt, r1 = sched.step(1.1, opt)      # bad 1
    opt, r2 = sched.step(1.2, opt)      # bad 2 > patience -> reduce
    assert not r1 and r2
    assert abs(get_learning_rate(opt) - 5e-4) < 1e-9
    opt = set_learning_rate(opt, 1e-4)
    assert abs(get_learning_rate(opt) - 1e-4) < 1e-9  # fp32 storage


def test_plateau_scheduler_threshold_and_cooldown():
    """torch ReduceLROnPlateau semantics: improvements within the 1e-4
    relative threshold count as bad epochs; cooldown suppresses
    counting after a reduction."""
    tx = make_adam(1e-3)
    opt = tx.init({"w": np.zeros(3, np.float32)})
    sched = PlateauScheduler(factor=0.5, patience=1, threshold=1e-4,
                             cooldown=1)
    opt, _ = sched.step(1.0, opt)          # best=1.0
    opt, r1 = sched.step(0.99995, opt)     # within rel threshold -> bad 1
    opt, r2 = sched.step(0.99994, opt)     # bad 2 > patience -> reduce
    assert not r1 and r2
    assert abs(get_learning_rate(opt) - 5e-4) < 1e-9
    # cooldown epoch: a bad step doesn't count
    opt, r3 = sched.step(1.2, opt)
    assert not r3 and sched.num_bad == 0
    # after cooldown, it takes patience+1 bad steps again
    opt, r4 = sched.step(1.2, opt)
    opt, r5 = sched.step(1.2, opt)
    assert not r4 and r5
    assert abs(get_learning_rate(opt) - 2.5e-4) < 1e-9
    # state roundtrip keeps cooldown counter
    s2 = PlateauScheduler(0.5, 1, cooldown=1)
    s2.load_state_dict(sched.state_dict())
    assert s2.cooldown_counter == sched.cooldown_counter


def _phase2_trainer(d_step=2):
    import dataclasses as dc

    from idccrn_vae_tpu.losses.phase2 import TwoPhaseLoss
    from idccrn_vae_tpu.train.phase2 import Phase2Trainer

    enc_cfg = dataclasses.replace(TINY, latent_num=1, num_samples=1)
    dec_cfg = dc.replace(TINY, latent_num=1, num_samples=1,
                         skip_mode="runtime", recon_type="mask")
    loss = TwoPhaseLoss((1.0, 1.0, 0.0), alpha=1.0, latent_num=1)
    return Phase2Trainer(enc_cfg, dec_cfg, loss, 1e-3, adversarial=True,
                         dis_lr=1e-4, d_step=d_step)


class _TripletLoader:
    def __init__(self, n=2, b=2, length=1600, seed=0):
        rng = np.random.default_rng(seed)
        self.batches = [tuple(
            rng.standard_normal((b, length)).astype(np.float32) * 0.1
            for _ in range(3)) for _ in range(n)]

    def __iter__(self):
        return iter(self.batches)


def test_phase2_resume_identical_update_sequence(tmp_path):
    """Interrupted+resumed adversarial phase-2 == uninterrupted run:
    the d_step batch counter, scheduler state, and per-epoch rng all
    persist, so every D/G update lands identically."""
    kw = dict(early_stop_patience=10, save_frequency=1)

    straight = _phase2_trainer()
    s_state, _, _ = straight.fit(_TripletLoader(), _TripletLoader(seed=1),
                                 epochs=2, save_dir=str(tmp_path / "a"), **kw)

    part1 = _phase2_trainer()
    part1.fit(_TripletLoader(), _TripletLoader(seed=1), epochs=1,
              save_dir=str(tmp_path / "b"), **kw)
    part2 = _phase2_trainer()
    r_state, _, _ = part2.fit(_TripletLoader(), _TripletLoader(seed=1),
                              epochs=2, save_dir=str(tmp_path / "b"),
                              resume=True, **kw)
    assert part2._batch_counter == straight._batch_counter
    for a, b in zip(jax.tree.leaves(s_state["models"]),
                    jax.tree.leaves(r_state["models"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_spec_features():
    x = np.random.default_rng(0).standard_normal(1600).astype(np.float32)
    lp = spec_features(x, "LogPow")
    mg = spec_features(x, "MagSpec")
    cx = spec_features(x, "Complex")
    assert lp.shape == (257, 17) and mg.shape == (257, 17)
    assert cx.shape == (257, 17, 2)
    assert np.isfinite(lp).all()


def test_datanorm_meta_round_trip():
    """datanorm persists through meta.json (the reference re-parses dir
    names + config paths; test_prevae silently drops it entirely)."""
    import json

    import numpy as np

    from idccrn_vae_tpu.train.checkpoint import (
        datanorm_from_meta,
        datanorm_to_meta,
    )

    mean = np.random.default_rng(0).standard_normal((257, 2)).astype(
        np.float32)
    std = np.abs(np.random.default_rng(1).standard_normal((257, 2))).astype(
        np.float32)
    meta = json.loads(json.dumps({"datanorm": datanorm_to_meta((mean, std))}))
    m2, s2 = datanorm_from_meta(meta)
    np.testing.assert_allclose(m2, mean, rtol=1e-6)
    np.testing.assert_allclose(s2, std, rtol=1e-6)
    assert datanorm_to_meta(None) is None
    assert datanorm_from_meta({"datanorm": None}) is None
    assert datanorm_from_meta({}) is None  # pre-datanorm metas
