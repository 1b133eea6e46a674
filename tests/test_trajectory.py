"""Loop-level trajectory semantics pins (VERDICT r4 weak #2).

tools/trajectory_parity.py runs the reference's own GRU_VAE_Train
side-by-side with PretrainTrainer.fit (TRAJECTORY_PARITY.json); these
tests pin the individual loop semantics fast enough for the suite:

  * the KL-annealing schedule == the reference's KL_annealing
    .frange_cycle_linear (torch oracle, pretrain_pvaes_loss.py:3-42);
  * TRAIN applies kl_warm_weights[epoch], VAL applies the fully-warm
    kl_weight regardless of epoch (train.py:318 vs :348 — the val loss
    is always called with epoch=kl_warm_epochs+2);
  * PlateauScheduler == torch.optim.lr_scheduler.ReduceLROnPlateau
    step-for-step (factor/patience/rel-threshold semantics,
    train.py:128-131);
  * run_training's best-epoch / patience / early-stop decisions ==
    the reference's rule (strict <, cpt_patience reset-or-increment,
    break at cpt_patience == early_stop_patience, train.py:369-434).
"""

import sys

import numpy as np
import pytest

import jax

from idccrn_vae_tpu.losses.vae_loss import (
    PretrainVaeLoss,
    kl_annealing_schedule,
)
from idccrn_vae_tpu.train.loop import run_training
from idccrn_vae_tpu.train.optim import (
    PlateauScheduler,
    get_learning_rate,
    make_adam,
)
from idccrn_vae_tpu.train.pretrain import PretrainTrainer

from oracle_ref import REF_ROOT, our_cfg, wav_batch


@pytest.mark.parametrize("n,stop", [(5, 1.0), (20, 0.01), (7, 0.3),
                                    (1, 0.5)])
def test_kl_schedule_matches_reference_torch(n, stop):
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from model.pretrain_pvaes_loss import KL_annealing

    ref = KL_annealing(n).frange_cycle_linear(stop=stop).numpy()
    ours = kl_annealing_schedule(n) * stop
    np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_train_anneals_val_fully_warm():
    """train epoch e uses kl_warm_weights[e]; VAL always uses the full
    kl_weight (the reference calls the val loss with
    epoch=kl_warm_epochs+2, train.py:348). Regression test for the
    round-5 fix: eval_step used to anneal, which perturbed the plateau
    scheduler / best-epoch / early-stop trajectory during warm-up."""
    cfg = our_cfg(True, num_samples=1, skip_mode="zero",
                  recon_type="real_imag")
    kl_full = 0.7
    loss = PretrainVaeLoss(
        kl_warm_weights=np.zeros(5), kl_weight=kl_full, mi_weight=0.0,
        recon_loss_type="multiple", recon_loss_weight=(1.0, 1.0, 0.0),
        num_samples=1, prior_mode="ri_inde")
    tr = PretrainTrainer(cfg, loss, 1e-3)
    state = tr.init_state()
    wav = wav_batch(seed=5)
    rng = jax.random.PRNGKey(0)

    # train at epoch 0: annealed weight is 0 -> total carries NO kl
    _, m_tr = tr.train_step(state, wav, rng, epoch=0)
    assert float(m_tr["kl"]) > 1e-4  # kl itself is nonzero...
    assert float(m_tr["total"]) == pytest.approx(
        float(m_tr["recon"]), rel=1e-5)  # ...but not in the total

    # val at epoch 0: fully-warm weight applies
    m_val = tr.eval_step(state, wav, rng, epoch=0)
    assert float(m_val["total"]) == pytest.approx(
        float(m_val["recon"]) + kl_full * float(m_val["kl"]), rel=1e-5)
    # and val is epoch-independent (reference passes a constant epoch)
    m_val9 = tr.eval_step(state, wav, rng, epoch=9)
    assert float(m_val9["total"]) == pytest.approx(
        float(m_val["total"]), rel=1e-6)


SEQUENCES = [
    # steadily improving: never reduces
    [10.0, 9.0, 8.0, 7.0, 6.0, 5.0, 4.0, 3.0],
    # flat: rel-threshold counts equal as NOT better -> reduce on the
    # 4th bad epoch (patience 3), again 4 later
    [5.0] * 10,
    # tiny improvements below the 1e-4 rel threshold are NOT better
    [5.0, 4.99999, 4.99998, 4.99997, 4.99996, 4.99995],
    # recovery before the 4th bad epoch resets the counter
    [5.0, 6.0, 6.0, 6.0, 4.0, 6.0, 6.0, 6.0, 6.0, 3.0],
    # exactly-at-threshold improvement (a < best * (1 - 1e-4))
    [5.0, 5.0 * (1 - 1e-4), 5.0 * (1 - 1e-4) ** 2, 4.0, 4.0, 4.0, 4.0,
     4.0],
]


@pytest.mark.parametrize("vals", SEQUENCES)
@pytest.mark.parametrize("patience", [0, 1, 3])
def test_plateau_scheduler_matches_torch(vals, patience):
    torch = pytest.importorskip("torch")

    lr0 = 1e-3
    p = torch.nn.Parameter(torch.zeros(1))
    opt_t = torch.optim.SGD([p], lr=lr0)
    sched_t = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt_t, "min", factor=0.5, patience=patience)

    tx = make_adam(lr0, 1e-3)
    opt_state = tx.init({"w": np.zeros(3, np.float32)})
    sched = PlateauScheduler(0.5, patience)

    for v in vals:
        sched_t.step(v)
        opt_state, _ = sched.step(v, opt_state)
        # rel=1e-6: optax carries the LR as f32 (1e-3 ->
        # 0.0010000000475), torch as f64 — the DECISION sequence is
        # what's pinned, not the float encoding
        assert float(get_learning_rate(opt_state)) == pytest.approx(
            opt_t.param_groups[0]["lr"], rel=1e-6), (vals, patience, v)


def _reference_loop_decisions(vals, early_stop_patience):
    """Straight transcription of train.py:369-434: strict-< best, reset
    -or-increment patience, break when cpt_patience == early_stop."""
    best, cpt, best_epoch = np.inf, 0, None
    for epoch, v in enumerate(vals):
        if v < best:
            best, cpt, best_epoch = v, 0, epoch
        else:
            cpt += 1
        if cpt == early_stop_patience:
            break
    return best_epoch, epoch + 1  # (best epoch, epochs actually run)


@pytest.mark.parametrize("vals,early", [
    ([5.0, 4.0, 4.5, 4.4, 4.3, 4.2, 3.0, 3.5], 3),   # no stop
    ([5.0, 4.0, 4.5, 4.6, 4.7, 3.9, 4.0, 4.1, 4.2], 3),  # stops at 8
    ([5.0, 6.0, 7.0], 2),                               # early stop fast
    ([5.0, 5.0, 5.0, 5.0, 5.0], 10),                    # ties never best
])
def test_run_training_decisions_match_reference_rule(vals, early):
    class Logger:
        def info(self, *a, **k):
            pass

    best_epochs = []
    fake_batch = [np.zeros((2, 4), np.float32)]

    def train_step(state, batch, rng, epoch):
        return state, {"total": 0.0}

    def eval_step(state, batch, rng, epoch):
        return {"total": vals[epoch]}

    _state, curves, _best = run_training(
        epochs=len(vals), start_epoch=0,
        train_loader=fake_batch, val_loader=fake_batch,
        train_step=train_step, eval_step=eval_step, state={},
        rng=jax.random.PRNGKey(0),
        schedulers_step=lambda s, v: s,
        on_best=lambda s, e: best_epochs.append(e),
        on_checkpoint=lambda *a: None,
        logger=Logger(), early_stop_patience=early,
        save_frequency=10 ** 6)

    ref_best, ref_run = _reference_loop_decisions(vals, early)
    assert len(curves["val"]) == ref_run
    assert (best_epochs[-1] if best_epochs else None) == ref_best
