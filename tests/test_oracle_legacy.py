"""Parity vs the reference's ACTUAL torch classes — legacy DCCRN.

The legacy polar-mask DCCRN (model/module.py:87-221) is dead code
upstream (supervised_dccrn/train.py imports pvae_module's DCCRN_
instead) but part of the inventory: non-causal, skip concat at EVERY
decoder stage (the first "skip" is the bottleneck conv-stack output,
module.py:175-178), tanh-polar mask reconstruction (module.py:182-189),
no datanorm, waveform-only return. LegacyDccrn pins SupervisedDccrn to
exactly those choices; this test runs the reference class itself and
compares eval-mode forwards from imported weights.
"""

import sys

import numpy as np
import torch

import jax.numpy as jnp

from idccrn_vae_tpu.models.dccrn import LegacyDccrn
from idccrn_vae_tpu.models.torch_import import import_legacy_dccrn

from oracle_ref import (
    REF_ROOT,
    assert_close,
    our_cfg,
    sd_numpy,
    t2np,
    tiny_net_params,
    wav_batch,
)

LSTM_HIDDEN = 4


def ref_legacy():
    """Import the reference's legacy model/module.py."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from model import module  # noqa: PLC0415

    return module


def _mk_ref(seed=0):
    torch.manual_seed(seed)
    np_params = tiny_net_params(False, lstm_hidden=LSTM_HIDDEN)
    model = ref_legacy().DCCRN_(
        n_fft=32, hop_len=8, net_params=np_params, device="cpu",
        win_length=16)
    with torch.no_grad():
        model(torch.from_numpy(wav_batch(seed=99)), train=True)  # warm BN
    return model


def test_legacy_dccrn_parity():
    model_t = _mk_ref()
    wav = wav_batch(seed=1)
    with torch.no_grad():
        clean_t = model_t(torch.from_numpy(wav), train=False)

    model = LegacyDccrn(our_cfg(False, lstm_hidden=LSTM_HIDDEN))
    variables = import_legacy_dccrn(sd_numpy(model_t), model.cfg)
    clean, _ = model.apply(variables, jnp.asarray(wav), train=False)
    assert_close(clean, t2np(clean_t), atol=3e-4, what="clean")


def test_legacy_pins_the_legacy_choices():
    """The constructor must force the module.py conventions regardless
    of what the incoming config says (module.py:87-221)."""
    cfg = our_cfg(True, recon_type="real_imag", skip_to_use=(1,),
                  lstm_hidden=LSTM_HIDDEN)
    model = LegacyDccrn(cfg)
    assert model.cfg.causal is False
    assert model.cfg.recon_type == "mask"
    assert model.cfg.skip_mode == "real"
    assert model.cfg.skip_to_use == tuple(range(model.cfg.num_stages))


def test_legacy_importer_drops_dead_linear():
    """The dead 1x1 `linear` conv (module.py:143, never applied in
    forward) carries torch params the importer must skip."""
    model_t = _mk_ref(seed=2)
    sd = sd_numpy(model_t)
    assert any(k.startswith("DCCRN.linear.") for k in sd)
    model = LegacyDccrn(our_cfg(False, lstm_hidden=LSTM_HIDDEN))
    variables = import_legacy_dccrn(sd, model.cfg)
    import jax  # noqa: PLC0415

    # a 1x1 conv kernel (kf=kt=1; kernels are HWIO) must not have been
    # imported anywhere
    for path, leaf in jax.tree_util.tree_leaves_with_path(variables):
        if hasattr(leaf, "shape") and len(leaf.shape) == 4:
            assert leaf.shape[:2] != (1, 1), (
                f"dead linear conv leaked into {jax.tree_util.keystr(path)}")
