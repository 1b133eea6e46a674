"""End-to-end trainer smoke tests on tiny geometry + virtual 8-dev mesh."""

import dataclasses
import os

import jax
import numpy as np
import optax
import pytest

from idccrn_vae_tpu.losses.nsvae_loss import NsvaeTrueKlLoss
from idccrn_vae_tpu.losses.phase2 import EteTrainSeLoss, TwoPhaseLoss
from idccrn_vae_tpu.losses.vae_loss import PretrainVaeLoss, kl_annealing_schedule
from idccrn_vae_tpu.models.config import DccrnConfig
from idccrn_vae_tpu.parallel.mesh import make_mesh
from idccrn_vae_tpu.train.nsvae import NsvaeTrainer
from idccrn_vae_tpu.train.phase2 import Phase2Trainer
from idccrn_vae_tpu.train.pretrain import PretrainTrainer
from idccrn_vae_tpu.train.supervised import SupervisedTrainer

TINY = DccrnConfig(
    encoder_channels=(1, 2, 2, 4, 4, 4, 4),
    zdim=4,
    num_samples=2,
    causal=True,
)
B, L = 4, 1600


def _wav(seed, n=B):
    return np.random.default_rng(seed).standard_normal((n, L)).astype(np.float32)


def _loss():
    return PretrainVaeLoss(kl_annealing_schedule(5), kl_weight=0.01,
                           num_samples=TINY.num_samples)


def test_pretrain_step_updates_params():
    tr = PretrainTrainer(TINY, _loss(), 3e-4)
    state = tr.init_state()
    s1, m1 = tr.train_step(state, _wav(0), jax.random.PRNGKey(0), epoch=0)
    assert np.isfinite(m1["total"])
    # params changed
    p0 = jax.tree.leaves(state["enc"]["params"])[0]
    p1 = jax.tree.leaves(s1["enc"]["params"])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # BN stats advanced (running stats / init counters updated in-step)
    st0 = jax.tree.leaves(state["enc"]["stats"])
    st1 = jax.tree.leaves(s1["enc"]["stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(st0, st1)
    ), "BN stats did not advance over a train step"
    # eval doesn't change state
    m_eval = tr.eval_step(s1, _wav(1), jax.random.PRNGKey(1), epoch=0)
    assert np.isfinite(m_eval["total"])


def test_pretrain_multichip_mesh():
    mesh = make_mesh(8)
    tr = PretrainTrainer(TINY, _loss(), 3e-4, mesh=mesh)
    state = tr.init_state()
    s1, m1 = tr.train_step(state, _wav(2, n=8), jax.random.PRNGKey(0), 0)
    assert np.isfinite(m1["total"])


def test_supervised_trainer_step():
    tr = SupervisedTrainer(TINY, EteTrainSeLoss((1.0, 1.0, 0.0)), 1e-3)
    state = tr.init_state()
    batch = (_wav(3), _wav(4))
    s1, m1 = tr.train_step(state, batch, jax.random.PRNGKey(0), 0)
    assert np.isfinite(m1["total"])
    m2 = tr.eval_step(s1, batch, jax.random.PRNGKey(1), 0)
    assert np.isfinite(m2["total"])


@pytest.mark.parametrize("latent_num", [2])
def test_nsvae_trainer_step(latent_num):
    noisy_cfg = dataclasses.replace(TINY, latent_num=latent_num,
                                    channel_mode="double")
    loss = NsvaeTrueKlLoss(alpha=1.0, w_resi=1.0, w_kl=1.0, w_dismiu=0.1,
                           cfg=noisy_cfg, matching="both")
    tr = NsvaeTrainer(TINY, noisy_cfg, loss, 1e-3)
    state = tr.init_state()
    batch = (_wav(5), _wav(6), _wav(7))
    s1, m1 = tr.train_step(state, batch, jax.random.PRNGKey(0), 0)
    assert np.isfinite(m1["total"])
    # frozen clean encoder params unchanged
    c0 = jax.tree.leaves(state["models"]["clean_enc"]["params"])[0]
    c1 = jax.tree.leaves(s1["models"]["clean_enc"]["params"])[0]
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    # noisy encoder trained
    n0 = jax.tree.leaves(state["models"]["noisy_enc"]["params"])[0]
    n1 = jax.tree.leaves(s1["models"]["noisy_enc"]["params"])[0]
    assert not np.allclose(np.asarray(n0), np.asarray(n1))


def test_phase2_classical_step():
    enc_cfg = dataclasses.replace(TINY, latent_num=1)
    dec_cfg = dataclasses.replace(TINY, latent_num=1, skip_mode="runtime",
                                  recon_type="mask")
    loss = TwoPhaseLoss((1.0, 1.0, 0.0), alpha=1.0, latent_num=1)
    tr = Phase2Trainer(enc_cfg, dec_cfg, loss, 1e-3)
    state = tr.init_state()
    batch = (_wav(8), _wav(9), _wav(10))
    s1, m1 = tr.train_step(state, batch, jax.random.PRNGKey(0), 0)
    assert np.isfinite(m1["total"])
    # encoder frozen
    e0 = jax.tree.leaves(state["models"]["encoder"]["params"])[0]
    e1 = jax.tree.leaves(s1["models"]["encoder"]["params"])[0]
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))


def test_phase2_adversarial_step():
    enc_cfg = dataclasses.replace(TINY, latent_num=1)
    dec_cfg = dataclasses.replace(TINY, latent_num=1, skip_mode="runtime",
                                  recon_type="mask")
    loss = TwoPhaseLoss((1.0, 1.0, 0.0), alpha=1.0, latent_num=1)
    tr = Phase2Trainer(enc_cfg, dec_cfg, loss, 1e-3, adversarial=True,
                       dis_lr=1e-4, d_step=1)
    state = tr.init_state()
    batch = (_wav(11), _wav(12), _wav(13))
    s1, m1 = tr.train_step(state, batch, jax.random.PRNGKey(0), 0)
    assert np.isfinite(m1["total"]) and "dis" in m1
    # discriminator trained
    d0 = jax.tree.leaves(state["models"]["dis"]["params"])[0]
    d1 = jax.tree.leaves(s1["models"]["dis"]["params"])[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))


def test_phase2_skip_layer_mask():
    enc_cfg = dataclasses.replace(TINY, latent_num=1)
    dec_cfg = dataclasses.replace(TINY, latent_num=1, skip_mode="runtime",
                                  recon_type="mask", skip_to_use=(0, 2))
    loss = TwoPhaseLoss((1.0, 1.0, 0.0), alpha=1.0, latent_num=1)
    tr = Phase2Trainer(enc_cfg, dec_cfg, loss, 1e-3,
                       decode_update="skip_layer")
    state = tr.init_state()
    batch = (_wav(14), _wav(15), _wav(16))
    s1, _ = tr.train_step(state, batch, jax.random.PRNGKey(0), 0)
    # The reference unfreezes decoders[n - skip - 1] per skip
    # (train_second_phase_decoder.py:145-150): skip_to_use=(0,2), n=6
    # -> stages 5 and 3 update; everything else (incl. dense) frozen.
    old = state["models"]["decoder"]["params"]
    new = s1["models"]["decoder"]["params"]
    for frozen in (0, 1, 2, 4):
        np.testing.assert_array_equal(
            np.asarray(old["decoder"][frozen]["conv"]["wr"]),
            np.asarray(new["decoder"][frozen]["conv"]["wr"]))
    for updated in (3, 5):
        assert not np.allclose(
            np.asarray(old["decoder"][updated]["conv"]["wr"]),
            np.asarray(new["decoder"][updated]["conv"]["wr"]))
    np.testing.assert_array_equal(np.asarray(old["dense"]["wr"]),
                                  np.asarray(new["dense"]["wr"]))


def test_nsvae_unfreeze_clean_encoder():
    """[Network] clean_encoder=True unfreezes the pretrained encoder."""
    noisy_cfg = dataclasses.replace(TINY, latent_num=2)
    loss = NsvaeTrueKlLoss(alpha=1.0, w_resi=0.0, w_kl=1.0, w_dismiu=0.0,
                           cfg=noisy_cfg)
    tr = NsvaeTrainer(TINY, noisy_cfg, loss, 1e-3,
                      trainable={"clean_enc": True})
    state = tr.init_state()
    batch = (_wav(20), _wav(21), _wav(22))
    s1, _ = tr.train_step(state, batch, jax.random.PRNGKey(0), 0)
    c0 = jax.tree.leaves(state["models"]["clean_enc"]["params"])[0]
    c1 = jax.tree.leaves(s1["models"]["clean_enc"]["params"])[0]
    assert not np.allclose(np.asarray(c0), np.asarray(c1))
    # noise encoder stays frozen
    n0 = jax.tree.leaves(state["models"]["noise_enc"]["params"])[0]
    n1 = jax.tree.leaves(s1["models"]["noise_enc"]["params"])[0]
    np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))
    # FROZEN models run in eval mode: their pretrained BN running stats
    # are untouched (the reference puts non-trainable models in eval()
    # and forwards train=False, train_nsvae.py:451-468/495-499)
    for a, b in zip(jax.tree.leaves(state["models"]["noise_enc"]["stats"]),
                    jax.tree.leaves(s1["models"]["noise_enc"]["stats"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the UNFROZEN clean encoder does update its stats
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(state["models"]["clean_enc"]["stats"]),
            jax.tree.leaves(s1["models"]["clean_enc"]["stats"])))


def test_pretrain_prob_skip_steps():
    """skip_mode='prob' pretraining needs the decoder's skip coin rng
    threaded through the trainer (regression: asserted skip_rng is not
    None on the first step)."""
    cfg = dataclasses.replace(TINY, skip_mode="prob", skip_prob=1)
    loss = PretrainVaeLoss(kl_annealing_schedule(5), 0.01,
                           num_samples=TINY.num_samples)
    tr = PretrainTrainer(cfg, loss, 1e-3)
    s1, m = tr.train_step(tr.init_state(), _wav(30), jax.random.PRNGKey(0),
                          0)
    assert np.isfinite(m["total"])


def test_phase2_adversarial_has_no_noise_decoder():
    """The reference's adversarial script trains ONLY the clean decoder
    (no noise decoder exists there) — carrying one would weight-decay
    its pretrained params with zero loss gradient."""
    enc_cfg = dataclasses.replace(TINY, latent_num=2)
    dec_cfg = dataclasses.replace(TINY, latent_num=2, skip_mode="runtime",
                                  recon_type="mask")
    loss = TwoPhaseLoss((1.0, 1.0, 0.0), alpha=1.0, latent_num=2)
    tr = Phase2Trainer(enc_cfg, dec_cfg, loss, 1e-3, adversarial=True,
                       dis_lr=1e-3, d_step=1)
    assert tr.noise_decoder is None
    s1, m = tr.train_step(tr.init_state(), (_wav(24), _wav(25), _wav(26)),
                          jax.random.PRNGKey(0), 0)
    assert "noise_decoder" not in s1["models"]
    assert np.isfinite(m["total"]) and np.isfinite(m["dis"])


def test_metric_accumulator_intermittent_keys():
    """Keys emitted on a subset of batches (adversarial 'dis' every
    d_step batches) average over the samples that reported them."""
    from idccrn_vae_tpu.train.loop import MetricAccumulator

    acc = MetricAccumulator()
    acc.add({"total": 1.0, "dis": 4.0}, 2)
    acc.add({"total": 3.0}, 2)
    out = acc.averages()
    assert out["total"] == 2.0
    assert out["dis"] == 4.0  # not diluted to 2.0 by the dis-less batch


def test_phase2_double_channel_step():
    """Phase-2 fine-tune on a double-channel NSVAE checkpoint: the
    doubled noisy skips half-split into the pretrained-geometry clean
    and noise decoders (previously a concat/conv shape crash)."""
    from idccrn_vae_tpu.losses.phase2 import TwoPhaseLoss

    enc_cfg = dataclasses.replace(TINY, latent_num=2,
                                  channel_mode="double")
    dec_cfg = dataclasses.replace(TINY, latent_num=2, skip_mode="runtime",
                                  recon_type="mask")
    loss = TwoPhaseLoss((1.0, 1.0, 0.0), alpha=1.0, latent_num=2)
    tr = Phase2Trainer(enc_cfg, dec_cfg, loss, 1e-3)
    state = tr.init_state()
    batch = (_wav(20), _wav(21), _wav(22))
    s1, m1 = tr.train_step(state, batch, jax.random.PRNGKey(0), 0)
    assert np.isfinite(m1["total"])


def test_pad_small_tpu_batch():
    """The B<8 TPU workaround tiles the whole batch; no-op off-TPU.

    Uniform whole-batch repetition must keep batch-mean statistics
    exactly (XLA_DENSE_REPRO.json / parallel/mesh.py)."""
    from idccrn_vae_tpu.parallel import mesh as mesh_mod

    m = make_mesh(1)
    batch = (np.random.default_rng(0).standard_normal((3, 50)).astype("f"),
             np.ones((3, 50), "f"))
    # CPU backend (the suite forces cpu): must be a pass-through
    out = mesh_mod.pad_small_tpu_batch(m, batch)
    assert out is batch

    # simulate TPU: tile k=ceil(8/3)=3 -> B=9, means preserved
    orig_backend = mesh_mod.jax.default_backend
    mesh_mod.jax.default_backend = lambda: "tpu"
    try:
        a, b = mesh_mod.pad_small_tpu_batch(
            m, tuple(mesh_mod.jax.numpy.asarray(x) for x in batch))
        assert a.shape == (9, 50) and b.shape == (9, 50)
        np.testing.assert_allclose(np.asarray(a).mean(0),
                                   batch[0].mean(0), rtol=1e-6)
        # big batch: untouched
        big = mesh_mod.jax.numpy.ones((8, 4))
        assert mesh_mod.pad_small_tpu_batch(m, big) is big

        # batch SMALLER than the chip count: the per-chip row count
        # must still reach min_per_device, and the padded batch must
        # shard evenly (regression: per_chip floored to 0 and k was
        # computed as ceil(8/1), leaving 4 rows/chip on 8 chips)
        m8 = make_mesh(8)
        x4 = mesh_mod.jax.numpy.ones((4, 6))
        p4 = mesh_mod.pad_small_tpu_batch(m8, x4)
        assert p4.shape[0] % 8 == 0 and p4.shape[0] // 8 >= 8, p4.shape
        x3 = mesh_mod.jax.numpy.ones((3, 6))
        p3 = mesh_mod.pad_small_tpu_batch(m8, x3)
        assert p3.shape[0] % 8 == 0 and p3.shape[0] // 8 >= 8, p3.shape
        assert p3.shape[0] % 3 == 0  # whole-batch repetition only

        # escape hatch: =1 disables, =0/unset keeps padding ON
        os.environ["IDCCRN_NO_BATCH_PAD"] = "1"
        try:
            assert mesh_mod.pad_small_tpu_batch(m8, x4) is x4
            os.environ["IDCCRN_NO_BATCH_PAD"] = "0"
            assert mesh_mod.pad_small_tpu_batch(
                m8, x4).shape[0] == p4.shape[0]
        finally:
            del os.environ["IDCCRN_NO_BATCH_PAD"]
    finally:
        mesh_mod.jax.default_backend = orig_backend


def test_phase2_split_adv_equals_fused():
    """Split G/D programs == the fused adversarial step (train/phase2.py
    _d_step). The split form is what ships on TPU (fused exceeds HBM at
    B=15 — COMPILE500_PROBE.json); equivalence is the contract."""
    enc_cfg = dataclasses.replace(TINY, latent_num=1)
    dec_cfg = dataclasses.replace(TINY, latent_num=1, skip_mode="runtime",
                                  recon_type="mask")
    loss = TwoPhaseLoss((1.0, 1.0, 0.0), alpha=1.0, latent_num=1)
    batch = (_wav(11), _wav(12), _wav(13))

    def run(split):
        tr = Phase2Trainer(enc_cfg, dec_cfg, loss, 1e-3, adversarial=True,
                           dis_lr=1e-4, d_step=1, split_adv_step=split)
        # SGD, not Adam: the two forms compute the same math in
        # differently-partitioned XLA programs, so leaves agree only up
        # to f32 fusion rounding — which Adam's 1/sqrt(v) amplifies to
        # ~lr-scale on near-zero-gradient leaves. SGD keeps the
        # comparison at rounding scale (same device as the SPMD tests).
        tr.tx = optax.sgd(1e-3)
        tr.tx_dis = optax.sgd(1e-4)
        state = tr.init_state()
        for i in range(2):
            state, m = tr.train_step(state, batch, jax.random.PRNGKey(i), 0)
        return state, m

    s_f, m_f = run(False)
    s_s, m_s = run(True)
    assert set(m_f) == set(m_s)
    for k in m_f:
        np.testing.assert_allclose(float(m_f[k]), float(m_s[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    for a, b in zip(jax.tree.leaves(s_f["models"]),
                    jax.tree.leaves(s_s["models"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("kind", ["pretrain", "phase2_adv_split"])
def test_donate_matches_undonated(kind):
    """donate=True (in-place HBM reuse, the TRAIN_BENCH capability knob)
    is numerically a no-op: metrics match the undonated trainer step for
    step, and an eval_step between train steps must NOT invalidate the
    state (eval keeps a non-donated program)."""
    def build(donate):
        if kind == "pretrain":
            tr = PretrainTrainer(TINY, _loss(), 3e-4, donate=donate)
            batches = [( _wav(i),) for i in range(3)]
        else:
            enc_cfg = dataclasses.replace(TINY, latent_num=1)
            dec_cfg = dataclasses.replace(TINY, latent_num=1,
                                          skip_mode="runtime",
                                          recon_type="mask")
            tr = Phase2Trainer(enc_cfg, dec_cfg,
                               TwoPhaseLoss((1.0, 1.0, 0.0), 1.0, 1),
                               1e-3, adversarial=True, d_step=2,
                               split_adv_step=True, donate=donate)
            batches = [((_wav(i), _wav(i + 10), _wav(i + 20)),)
                       for i in range(3)]
        return tr, batches

    runs = {}
    for donate in (False, True):
        tr, batches = build(donate)
        state = tr.init_state()
        ms = []
        for i, (batch,) in enumerate(batches):
            state, m = tr.train_step(state, batch, jax.random.PRNGKey(7),
                                     epoch=0)
            ms.append(float(m["total"]))
            # interleaved eval must not kill the live state buffers
            me = tr.eval_step(state, batch, jax.random.PRNGKey(8), epoch=0)
            assert np.isfinite(me["total"])
        runs[donate] = ms
    np.testing.assert_allclose(runs[True], runs[False], rtol=1e-6)
