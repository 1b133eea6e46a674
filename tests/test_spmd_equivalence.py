"""Data-parallel SPMD equivalence for ALL FOUR trainers: an 8-device
mesh step must produce the same loss and the same parameter update as
the single-device step (XLA globalizes the batch means — loss,
gradients, AND the complex-BN batch statistics — over the mesh).
Mesh-sensitive behaviors covered: the NSVAE frozen/unfrozen model
split, Phase2's masked updates + d_step discriminator interleave +
stop_gradient, and the supervised decoder BN-stat globalization."""

import dataclasses

import jax
import numpy as np
import optax

from idccrn_vae_tpu.losses.nsvae_loss import NsvaeTrueKlLoss
from idccrn_vae_tpu.losses.phase2 import EteTrainSeLoss, TwoPhaseLoss
from idccrn_vae_tpu.losses.vae_loss import PretrainVaeLoss, kl_annealing_schedule
from idccrn_vae_tpu.models.config import DccrnConfig
from idccrn_vae_tpu.parallel.mesh import make_mesh
from idccrn_vae_tpu.train.nsvae import NsvaeTrainer
from idccrn_vae_tpu.train.phase2 import Phase2Trainer
from idccrn_vae_tpu.train.pretrain import PretrainTrainer
from idccrn_vae_tpu.train.supervised import SupervisedTrainer

TINY = DccrnConfig(encoder_channels=(1, 2, 2, 4, 4, 4, 4), zdim=4,
                   num_samples=1)


def _wavs(n, seed=0, count=1):
    rng = np.random.default_rng(seed)
    return tuple((rng.standard_normal((n, 1600)) * 0.3).astype(np.float32)
                 for _ in range(count))


def _assert_tree_close(a, b, atol=2e-4, rtol=2e-3):
    assert jax.tree.structure(a) == jax.tree.structure(b)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=atol, rtol=rtol)


def _trainer(mesh):
    loss = PretrainVaeLoss(kl_annealing_schedule(5), 0.01, num_samples=1)
    tr = PretrainTrainer(TINY, loss, 1e-3, mesh=mesh)
    # Use plain SGD for the equivalence check: after one Adam step the
    # update is ~±lr regardless of gradient magnitude, which amplifies
    # benign reduction-order noise; with SGD the param delta IS the
    # gradient (times lr), so this directly asserts gradient equality.
    import optax

    tr.tx_en = optax.sgd(1e-3)
    tr.tx_de = optax.sgd(1e-3)
    return tr


def test_mesh8_matches_mesh1():
    wav = (np.random.default_rng(0).standard_normal((8, 1600)) * 0.3
           ).astype(np.float32)
    rng = jax.random.PRNGKey(0)

    tr1 = _trainer(make_mesh(1))
    s1 = tr1.init_state()
    s1b, m1 = tr1.train_step(s1, wav, rng, 0)

    tr8 = _trainer(make_mesh(8))
    s8 = tr8.init_state()
    s8b, m8 = tr8.train_step(s8, wav, rng, 0)

    np.testing.assert_allclose(float(m1["total"]), float(m8["total"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m1["kl"]), float(m8["kl"]), rtol=1e-4)

    # updated params identical (gradient all-reduce == full-batch grad)
    l1 = jax.tree.leaves(s1b["enc"]["params"])
    l8 = jax.tree.leaves(s8b["enc"]["params"])
    for a, b in zip(l1, l8):
        # fp32 reduction-order noise across shards bounds the match
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-3)

    # complex-BN batch stats globalized over the mesh
    st1 = jax.tree.leaves(s1b["enc"]["stats"])
    st8 = jax.tree.leaves(s8b["enc"]["stats"])
    for a, b in zip(st1, st8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-3)


def test_nsvae_mesh8_matches_mesh1_with_partial_freeze():
    """NSVAE trainer: trainable noisy encoder + UNFROZEN clean encoder,
    frozen noise encoder — the masked-model split must reduce
    identically over the mesh."""
    noisy, clean, noise = _wavs(8, seed=1, count=3)
    noisy_cfg = dataclasses.replace(TINY, latent_num=2,
                                    channel_mode="double")

    def mk(mesh):
        loss = NsvaeTrueKlLoss(alpha=0.5, w_resi=0.1, w_kl=1.0,
                               w_dismiu=0.1, cfg=noisy_cfg,
                               matching="both")
        tr = NsvaeTrainer(TINY, noisy_cfg, loss, 1e-3,
                          trainable={"clean_enc": True}, mesh=mesh)
        tr.tx = optax.sgd(1e-3)
        return tr

    out = {}
    for n in (1, 8):
        tr = mk(make_mesh(n))
        s0 = tr.init_state()
        s1, m = tr.train_step(s0, (noisy, clean, noise),
                              jax.random.PRNGKey(0), 0)
        out[n] = (s0, s1, m)
    (s0a, s1a, m1), (s0b, s1b, m8) = out[1], out[8]
    np.testing.assert_allclose(float(m1["total"]), float(m8["total"]),
                               rtol=1e-4)
    _assert_tree_close(s1a["models"]["noisy_enc"]["params"],
                       s1b["models"]["noisy_enc"]["params"])
    _assert_tree_close(s1a["models"]["clean_enc"]["params"],
                       s1b["models"]["clean_enc"]["params"])
    # frozen noise encoder untouched on BOTH meshes
    _assert_tree_close(s0a["models"]["noise_enc"]["params"],
                       s1b["models"]["noise_enc"]["params"], atol=0, rtol=0)
    # noisy-encoder BN stats globalized
    _assert_tree_close(s1a["models"]["noisy_enc"]["stats"],
                       s1b["models"]["noisy_enc"]["stats"], atol=1e-5)


import pytest


@pytest.mark.parametrize("split", [False, True],
                         ids=["fused", "split_gd"])
def test_phase2_adversarial_mesh8_matches_mesh1(split):
    """Phase2 adversarial + skip_layer mask: masked decoder updates,
    stop_gradient'd D step, and d_step interleave reduce identically.
    Covered for BOTH step forms — the fused single program and the
    split G/D programs that ship on TPU (train/phase2.py split_adv)."""
    batch = _wavs(8, seed=2, count=3)
    enc_cfg = dataclasses.replace(TINY, latent_num=1)
    dec_cfg = dataclasses.replace(TINY, latent_num=1, skip_mode="runtime",
                                  recon_type="mask", skip_to_use=(0, 2))

    def mk(mesh):
        loss = TwoPhaseLoss((1.0, 1.0, 0.0), alpha=1.0, latent_num=1)
        tr = Phase2Trainer(enc_cfg, dec_cfg, loss, 1e-3, adversarial=True,
                           dis_lr=1e-3, d_step=1,
                           decode_update="skip_layer", mesh=mesh,
                           split_adv_step=split)
        tr.tx = optax.sgd(1e-3)
        tr.tx_dis = optax.sgd(1e-3)
        return tr

    out = {}
    for n in (1, 8):
        tr = mk(make_mesh(n))
        s0 = tr.init_state()
        s1, m = tr.train_step(s0, batch, jax.random.PRNGKey(0), 0)
        out[n] = (s0, s1, m)
    (s0a, s1a, m1), (s0b, s1b, m8) = out[1], out[8]
    np.testing.assert_allclose(float(m1["total"]), float(m8["total"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m1["dis"]), float(m8["dis"]),
                               rtol=1e-4)
    _assert_tree_close(s1a["models"]["decoder"]["params"],
                       s1b["models"]["decoder"]["params"])
    _assert_tree_close(s1a["models"]["dis"]["params"],
                       s1b["models"]["dis"]["params"])
    # masked (non-skip) decoder stage 1 frozen on BOTH meshes
    np.testing.assert_array_equal(
        np.asarray(s0b["models"]["decoder"]["params"]["decoder"][1]["conv"]["wr"]),
        np.asarray(s1b["models"]["decoder"]["params"]["decoder"][1]["conv"]["wr"]))


def test_supervised_mesh8_matches_mesh1():
    noisy, clean = _wavs(8, seed=3, count=2)

    def mk(mesh):
        loss = EteTrainSeLoss((1.0, 1.0, 1.0))
        tr = SupervisedTrainer(
            dataclasses.replace(TINY, recon_type="mask"), loss, 1e-3,
            mesh=mesh)
        tr.tx = optax.sgd(1e-3)
        return tr

    out = {}
    for n in (1, 8):
        tr = mk(make_mesh(n))
        s0 = tr.init_state()
        s1, m = tr.train_step(s0, (noisy, clean), jax.random.PRNGKey(0), 0)
        out[n] = (s1, m)
    (s1a, m1), (s1b, m8) = out[1], out[8]
    np.testing.assert_allclose(float(m1["total"]), float(m8["total"]),
                               rtol=1e-4)
    _assert_tree_close(s1a["model"]["params"], s1b["model"]["params"])
    _assert_tree_close(s1a["model"]["stats"], s1b["model"]["stats"],
                       atol=1e-5)


def test_mesh8_donated_matches_undonated():
    """Donation composes with the sharded SPMD step: donate=True on an
    8-device mesh produces the same metrics trajectory, and interleaved
    eval keeps the (sharded) state alive."""
    from idccrn_vae_tpu.losses.vae_loss import kl_annealing_schedule

    wav = (np.random.default_rng(3).standard_normal((8, 1600)) * 0.3
           ).astype(np.float32)
    rng = jax.random.PRNGKey(1)

    runs = {}
    for donate in (False, True):
        loss = PretrainVaeLoss(kl_annealing_schedule(5), 0.01,
                               num_samples=1)
        tr = PretrainTrainer(TINY, loss, 1e-3, mesh=make_mesh(8),
                             donate=donate)
        state = tr.init_state()
        ms = []
        for i in range(2):
            state, m = tr.train_step(state, wav, rng, 0)
            ms.append(float(m["total"]))
            me = tr.eval_step(state, wav, rng, 0)
            assert np.isfinite(me["total"])
        runs[donate] = ms
    np.testing.assert_allclose(runs[True], runs[False], rtol=1e-6)
