"""Training-STEP parity vs the reference: one SGD step of NSVAE
posterior matching through the reference's OWN torch classes vs
NsvaeTrainer with shared weights.

This pins the GRADIENT path — train-mode complex BN (differentiating
through batch statistics), the complex convs, the 4-pass-vs-batched-scan
complex LSTM, and the closed-form KL / miu-distance losses — not just
forward values (test_oracle_nsvae.py) or loss values
(test_oracle_losses.py). torch autograd is the oracle; both sides take
one plain-SGD step (delta = -lr * grad) from identical weights on an
identical batch, with the pretrained encoders frozen in eval mode like
the reference loop (train_nsvae.py:451-468, 485-507, 552-574).
"""

import numpy as np
import optax
import torch

import jax

from idccrn_vae_tpu.losses.nsvae_loss import NsvaeTrueKlLoss
from idccrn_vae_tpu.models.torch_import import (
    import_nsvae_encoder,
    import_vae_encoder,
)
from idccrn_vae_tpu.train.nsvae import NsvaeTrainer

from oracle_ref import (
    NS,
    REF_ROOT,
    ZDIM,
    assert_close,
    our_cfg,
    ref_models,
    sd_numpy,
    tiny_net_params,
    wav_batch,
)

M = ref_models()
STFT_KW = dict(n_fft=32, hop_len=8, win_length=16)
LR = 1e-2
KW = dict(alpha=0.7, w_resi=0.0, w_kl=1.0, w_dismiu=0.2)


def test_nsvae_sgd_step_matches_reference_autograd():
    import sys

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from model import nsvae_loss as RN

    torch.manual_seed(0)
    mk = dict(causal=False, device="cpu", zdim=ZDIM, num_samples=NS,
              **STFT_KW)
    clean_t = M.pvae_dccrn_encoder(tiny_net_params(False), **mk)
    noise_t = M.pvae_dccrn_encoder(tiny_net_params(False), **mk)
    noisy_t = M.nsvae_dccrn_encoder_original(tiny_net_params(False),
                                             latent_num=2, **mk)
    with torch.no_grad():  # warm BN buffers (init_flag first copy)
        clean_t(torch.from_numpy(wav_batch(seed=90)), train=True)
        noise_t(torch.from_numpy(wav_batch(seed=91)), train=True)
        noisy_t(torch.from_numpy(wav_batch(seed=92)), train=True)
    sd_clean, sd_noise = sd_numpy(clean_t), sd_numpy(noise_t)
    sd_noisy_before = sd_numpy(noisy_t)

    noisy = wav_batch(seed=1)
    clean = wav_batch(seed=2)
    noise = wav_batch(seed=3)

    # -- reference step: frozen encoders eval/no_grad, noisy train=True,
    #    true-KL loss, SGD on the noisy encoder --------------------------
    ref_loss = RN.standard_nsvae_loss_true_kl(
        **KW, zdim=ZDIM, num_samples=NS, latent_num=2,
        nsvae_model="original", skipc="False", skip_to_use=[],
        matching="both")
    with torch.no_grad():
        _, mu_c, ls_c, dl_c, sk_c, _, _, _ = clean_t(
            torch.from_numpy(clean), train=False)
        _, mu_n, ls_n, dl_n, sk_n, _, _, _ = noise_t(
            torch.from_numpy(noise), train=False)
    (z_s, mu_s, ls_s, dl_s, z_nn, mu_nn, ls_nn, dl_nn,
     sk_y, _c, _f, _sx) = noisy_t(torch.from_numpy(noisy), train=True)
    out = ref_loss.final_nsvae_loss(
        mu_c, mu_n, mu_s, mu_nn, ls_c, ls_n, ls_s, ls_nn,
        dl_c, dl_n, dl_s, dl_nn, z_s, z_nn, sk_c, sk_n, sk_y)
    total_t = out[0]
    noisy_t.zero_grad()
    total_t.backward()
    with torch.no_grad():
        for p in noisy_t.parameters():
            if p.grad is not None:
                p -= LR * p.grad
    sd_noisy_after = sd_numpy(noisy_t)

    # -- our step with the same weights ---------------------------------
    cfg_pre = our_cfg(False)
    cfg_noisy = our_cfg(False, latent_num=2)
    loss = NsvaeTrueKlLoss(**KW, cfg=cfg_noisy, matching="both")
    tr = NsvaeTrainer(cfg_pre, cfg_noisy, loss, LR)
    tr.tx = optax.sgd(LR)
    init_vars = import_nsvae_encoder(sd_noisy_before, cfg_noisy)
    state = tr.init_state(pretrained={
        "clean_enc": import_vae_encoder(sd_clean, cfg_pre),
        "noise_enc": import_vae_encoder(sd_noise, cfg_pre),
        "noisy_enc": init_vars,
    })
    s1, m = tr.train_step(state, (noisy, clean, noise),
                          jax.random.PRNGKey(0), 0)

    # identical loss at identical weights (forward parity under
    # train-mode batch statistics)
    assert_close(np.asarray(m["total"]), total_t.item(), what="total")

    # identical parameter UPDATES (gradient parity): compare deltas,
    # which isolate -lr * grad from the shared initial values
    expect_after = import_nsvae_encoder(sd_noisy_after, cfg_noisy)["params"]
    got_after = s1["models"]["noisy_enc"]["params"]
    init = init_vars["params"]
    paths = jax.tree_util.tree_flatten_with_path(init)[0]
    exp_leaves = jax.tree.leaves(expect_after)
    got_leaves = jax.tree.leaves(got_after)
    assert len(paths) == len(exp_leaves) == len(got_leaves)
    for (path, p0), pe, pg in zip(paths, exp_leaves, got_leaves):
        d_ref = np.asarray(pe) - np.asarray(p0)
        d_ours = np.asarray(pg) - np.asarray(p0)
        name = jax.tree_util.keystr(path)
        # every leaf must actually have moved on at least one side OR
        # agree at zero; and the deltas must match to fp32 tolerance
        assert_close(d_ours, d_ref, atol=5e-6, rtol=5e-3,
                     what=f"delta{name}")
    # the update is non-trivial (guards against a silent no-op pass)
    moved = sum(float(np.abs(np.asarray(pe) - np.asarray(p0)).max())
                for (_, p0), pe in zip(paths, exp_leaves))
    assert moved > 1e-4, moved

    # frozen encoders: byte-identical params AND stats on our side
    for name in ("clean_enc", "noise_enc"):
        for a, b in zip(jax.tree.leaves(state["models"][name]),
                        jax.tree.leaves(s1["models"][name])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_supervised_sgd_step_matches_reference_autograd():
    """Same oracle for the supervised DCCRN step: pins gradients through
    the DECODER path too — transposed convs, skip concat, mask
    reconstruction, ISTFT and the cpx/mag/SI-SNR loss (reference
    supervised_dccrn/train.py:232-243; the target-magnitude quirk is
    matched with ref_mag_bug=True)."""
    import sys

    from idccrn_vae_tpu.losses.recon import multiple_recon_loss
    from idccrn_vae_tpu.models.torch_import import import_supervised_dccrn
    from idccrn_vae_tpu.train.supervised import SupervisedTrainer

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from model import nsvae_loss as RN

    torch.manual_seed(1)
    model_t = M.DCCRN_(
        n_fft=32, hop_len=8, net_params=tiny_net_params(False,
                                                        lstm_hidden=4),
        causal=False, device="cpu", win_length=16, skip_to_use=[0, 1],
        recon_type="mask", resynthesis=False,
        data_mean=None, data_std=None)
    with torch.no_grad():
        model_t(torch.from_numpy(wav_batch(seed=99)), train=True)
    sd_before = sd_numpy(model_t)

    noisy = wav_batch(seed=4)
    clean = wav_batch(seed=5)
    weights = [1.0, 0.5, 0.2]

    ref_loss = RN.ete_train_se_loss(weights)
    est_t, est_stft_t = model_t(torch.from_numpy(noisy), train=True)
    clean_stft_t = model_t.stft(torch.from_numpy(clean))
    total_t, _c, _m, _s = ref_loss.final_ete_loss(
        est_stft_t, clean_stft_t, torch.from_numpy(clean), est_t)
    model_t.zero_grad()
    total_t.backward()
    with torch.no_grad():
        for p in model_t.parameters():
            if p.grad is not None:
                p -= LR * p.grad
    sd_after = sd_numpy(model_t)

    class _RefBugLoss:
        """EteTrainSeLoss with the reference's sqrt(re^2+re^2) target-
        magnitude quirk, which changes the mag-term gradient."""

        def __init__(self, w):
            self.w = tuple(w)

        def __call__(self, predict_spec, target_spec, source, est_source):
            return multiple_recon_loss(predict_spec, target_spec, source,
                                       est_source, self.w,
                                       ref_mag_bug=True)

    cfg = our_cfg(False, recon_type="mask", lstm_hidden=4)
    tr = SupervisedTrainer(cfg, _RefBugLoss(weights), LR)
    tr.tx = optax.sgd(LR)
    init_vars = import_supervised_dccrn(sd_before, cfg)
    state = {"model": init_vars, "opt": tr.tx.init(init_vars["params"])}
    s1, m = tr.train_step(state, (noisy, clean), jax.random.PRNGKey(0), 0)

    assert_close(np.asarray(m["total"]), total_t.item(), what="total")

    expect_after = import_supervised_dccrn(sd_after, cfg)["params"]
    init = init_vars["params"]
    paths = jax.tree_util.tree_flatten_with_path(init)[0]
    exp_leaves = jax.tree.leaves(expect_after)
    got_leaves = jax.tree.leaves(s1["model"]["params"])
    assert len(paths) == len(exp_leaves) == len(got_leaves)
    for (path, p0), pe, pg in zip(paths, exp_leaves, got_leaves):
        d_ref = np.asarray(pe) - np.asarray(p0)
        d_ours = np.asarray(pg) - np.asarray(p0)
        assert_close(d_ours, d_ref, atol=2e-5, rtol=5e-3,
                     what=f"delta{jax.tree_util.keystr(path)}")
    moved = sum(float(np.abs(np.asarray(pe) - np.asarray(p0)).max())
                for (_, p0), pe in zip(paths, exp_leaves))
    assert moved > 1e-4, moved
