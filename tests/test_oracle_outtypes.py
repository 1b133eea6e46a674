"""Numeric oracle for the latent_num=2 mask out-types.

The reference's three mask combinations (real_and_imag_mask,
complex_mask, phase_sensitive_mask — /root/reference/i_dccrn_vae/
nsvae_dccrn/test_nsvae_se.py:139-189) were previously only verified by
inspection (VERDICT r4 weak-#1: a sign error or swapped re/im would
pass the shape/finite smoke tests). Here the reference functions
themselves are the oracle: the script's module body is un-importable
in this image (librosa/soundfile/matplotlib at top level), so we AST-
extract ONLY the three function definitions and exec them against
torch, then feed identical spec tensors through them and through
eval/enhance.py::combine_outputs and require <=1e-5 agreement —
including the sample-mean reduction (reference means over dim 0 of the
(num_samples, F, T) decoder outputs; ours reshapes (B*S,...)->(B,S,...)
and means over S).
"""

import ast

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from idccrn_vae_tpu.eval.enhance import combine_outputs

REF_FILE = ("/root/reference/i_dccrn_vae/nsvae_dccrn/test_nsvae_se.py")
FN_NAMES = ("real_and_imag_mask", "complex_mask", "phase_sensitive_mask")


@pytest.fixture(scope="module")
def ref_masks():
    src = open(REF_FILE).read()
    tree = ast.parse(src)
    wanted = [n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name in FN_NAMES]
    assert len(wanted) == len(FN_NAMES), "reference functions moved"
    ns = {"torch": torch, "np": np,
          # complex_mask has a stray debug print; silence it
          "print": lambda *a, **k: None}
    exec(compile(ast.Module(body=wanted, type_ignores=[]),  # noqa: S102
                 REF_FILE, "exec"), ns)
    return {name: ns[name] for name in FN_NAMES}


S, F, T = 3, 9, 7  # num_samples, freq bins, frames


def _specs(seed):
    """Random (S,F,T) complex speech/noise decoder outputs + a (1,F,T,2)
    real-view noisy spec — exactly the dtypes/shapes the reference's
    B=1 eval loop passes (test_nsvae_se.py:387-412: predict_stft_* are
    complex (num_samples,F,T); stft_x_noisy is the encoder's real-view
    (1,F,T,2))."""
    rng = np.random.default_rng(seed)
    sp = (rng.standard_normal((S, F, T)) +
          1j * rng.standard_normal((S, F, T))).astype(np.complex64)
    no = (rng.standard_normal((S, F, T)) +
          1j * rng.standard_normal((S, F, T))).astype(np.complex64)
    noisy = rng.standard_normal((1, F, T, 2)).astype(np.float32)
    return sp, no, noisy


def _ours(outtype, sp, no, noisy):
    """combine_outputs takes (B*S,F,T,2) real-stacked specs, B=1."""
    sp_r = jnp.stack([jnp.real(jnp.asarray(sp)),
                      jnp.imag(jnp.asarray(sp))], axis=-1)
    no_r = jnp.stack([jnp.real(jnp.asarray(no)),
                      jnp.imag(jnp.asarray(no))], axis=-1)
    est = combine_outputs(outtype, sp_r, no_r, jnp.asarray(noisy),
                          num_samples=S)
    est = np.asarray(est)[0]  # (F,T,2)
    return est[..., 0] + 1j * est[..., 1]


@pytest.mark.parametrize("seed", [0, 1])
def test_real_imag_mask_oracle(ref_masks, seed):
    sp, no, noisy = _specs(seed)
    # reference: noise/speech complex (view_as_real'd inside); noisy is
    # the (1,F,T,2) real view, meaned over dim 0 inside
    ref = ref_masks["real_and_imag_mask"](
        torch.from_numpy(no), torch.from_numpy(sp),
        torch.from_numpy(noisy)).numpy()
    ours = _ours("real_imag_mask", sp, no, noisy)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_complex_mask_oracle(ref_masks, seed):
    sp, no, noisy = _specs(seed)
    ref = ref_masks["complex_mask"](
        torch.from_numpy(no), torch.from_numpy(sp),
        torch.from_numpy(noisy)).numpy()
    ours = _ours("complex_mask", sp, no, noisy)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_phase_mask_oracle(ref_masks, seed):
    sp, no, noisy = _specs(seed)
    ref = ref_masks["phase_sensitive_mask"](
        torch.from_numpy(no), torch.from_numpy(sp),
        torch.from_numpy(noisy)).numpy()
    ours = _ours("phase_mask", sp, no, noisy)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_masks_not_identity(ref_masks):
    """Guard against a degenerate oracle: the three mask estimates must
    differ from each other and from the raw noisy spec."""
    sp, no, noisy = _specs(7)
    outs = [_ours(t, sp, no, noisy)
            for t in ("real_imag_mask", "complex_mask", "phase_mask")]
    noisy_c = noisy[0, ..., 0] + 1j * noisy[0, ..., 1]
    for i, a in enumerate(outs):
        assert np.abs(a - noisy_c).max() > 1e-3
        for b in outs[i + 1:]:
            assert np.abs(a - b).max() > 1e-3
