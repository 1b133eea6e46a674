"""int8 serving-mode quantization: ops/conv.py _quantized_conv path.

The int8 mode (DccrnConfig.compute='int8') is a serving-only MXU path:
convs whose channel counts clear quant_min_ch run int8 with a dynamic
per-tensor activation scale and per-output-channel weight scales
(measured 1.63x over bf16 on the decoder conv shape on v5e,
INT8_PROBE.json). These tests pin its numerics and wiring on CPU.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from idccrn_vae_tpu.models.config import DccrnConfig
from idccrn_vae_tpu.ops.conv import (
    complex_conv2d,
    complex_conv_transpose2d,
    init_complex_conv2d,
    init_complex_conv_transpose2d,
)


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


@pytest.mark.parametrize("causal", [False, True])
def test_quantized_conv_close_to_f32(causal):
    b, cin, cout, f, t = 2, 8, 12, 17, 11
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((b, f, t, 2 * cin)), jnp.float32)
    params = init_complex_conv2d(jax.random.PRNGKey(1), cin, cout, (5, 2))
    ref = complex_conv2d(x, params, (2, 1), (2, 1), causal=causal)
    q = complex_conv2d(x, params, (2, 1), (2, 1), causal=causal,
                       quant=True, quant_min_ch=1)
    assert q.dtype == jnp.bfloat16
    assert q.shape == ref.shape
    assert _rel_err(q.astype(jnp.float32), ref) < 0.02


@pytest.mark.parametrize("causal", [False, True])
def test_quantized_tconv_close_to_f32(causal):
    b, cin, cout, f, t = 2, 8, 12, 9, 11
    x = jnp.asarray(np.random.default_rng(2)
                    .standard_normal((b, f, t, 2 * cin)), jnp.float32)
    params = init_complex_conv_transpose2d(
        jax.random.PRNGKey(3), cin, cout, (5, 2))
    ref = complex_conv_transpose2d(x, params, (2, 1), (2, 0),
                                   causal=causal)
    q = complex_conv_transpose2d(x, params, (2, 1), (2, 0), causal=causal,
                                 quant=True, quant_min_ch=1)
    assert q.dtype == jnp.bfloat16
    assert q.shape == ref.shape
    assert _rel_err(q.astype(jnp.float32), ref) < 0.02


def test_quant_scale_is_per_sample():
    """A 50x-louder batchmate must not perturb a quiet utterance's
    quantized output (review finding: a per-BATCH abs-max scale made
    outputs batch-dependent — quiet-sample error went 1% -> 38%)."""
    cin, cout, f, t = 8, 8, 17, 11
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.standard_normal((1, f, t, 2 * cin)), jnp.float32)
    loud = jnp.asarray(rng.standard_normal((1, f, t, 2 * cin)) * 50.0,
                       jnp.float32)
    params = init_complex_conv2d(jax.random.PRNGKey(8), cin, cout, (5, 2))

    def q(x):
        return np.asarray(complex_conv2d(
            x, params, (2, 1), (2, 0), quant=True, quant_min_ch=1
        ).astype(jnp.float32))

    alone = q(a)
    batched = q(jnp.concatenate([a, loud], axis=0))[:1]
    np.testing.assert_array_equal(alone, batched)


def test_min_ch_gate_skips_narrow_stages():
    """Below quant_min_ch the call must be the regular (f32 here) path."""
    b, cin, cout, f, t = 1, 2, 4, 9, 7
    x = jnp.asarray(np.random.default_rng(4)
                    .standard_normal((b, f, t, 2 * cin)), jnp.float32)
    params = init_complex_conv2d(jax.random.PRNGKey(5), cin, cout, (5, 2))
    ref = complex_conv2d(x, params, (2, 1), (2, 0))
    gated = complex_conv2d(x, params, (2, 1), (2, 0),
                           quant=True, quant_min_ch=16)
    np.testing.assert_array_equal(np.asarray(gated), np.asarray(ref))


def test_quantized_path_lowers_to_s8_convolution():
    """The int8 mode must actually emit an s8 convolution in the HLO —
    guards against the quant gate silently decaying into a no-op."""
    cin = cout = 8
    params = init_complex_conv2d(jax.random.PRNGKey(0), cin, cout, (5, 2))
    x = jnp.zeros((1, 17, 11, 2 * cin), jnp.float32)
    hlo = jax.jit(lambda x, p: complex_conv2d(
        x, p, (2, 1), (2, 0), quant=True, quant_min_ch=1)).lower(
            x, params).as_text()
    assert "xi8>" in hlo and "convolution" in hlo  # int8 operands
    hlo_gated = jax.jit(lambda x, p: complex_conv2d(
        x, p, (2, 1), (2, 0), quant=True, quant_min_ch=64)).lower(
            x, params).as_text()
    assert "xi8>" not in hlo_gated


def test_config_int8_properties():
    cfg = DccrnConfig(compute="int8")
    assert cfg.conv_quant
    assert cfg.compute_dtype == jnp.bfloat16
    with pytest.raises(ValueError, match="serving-only"):
        cfg.reject_int8_training("test")
    DccrnConfig(compute="bf16").reject_int8_training("test")  # no raise


def test_trainers_reject_int8():
    from idccrn_vae_tpu.losses.vae_loss import (PretrainVaeLoss,
                                                kl_annealing_schedule)
    from idccrn_vae_tpu.train.pretrain import PretrainTrainer

    cfg = DccrnConfig(compute="int8", zdim=4,
                      encoder_channels=(1, 2, 2, 4, 4, 4, 4))
    loss = PretrainVaeLoss(kl_annealing_schedule(2), 1.0, num_samples=1)
    with pytest.raises(ValueError, match="serving-only"):
        PretrainTrainer(cfg, loss, 1e-3)


def _tiny_cfgs(compute, quant_min_ch=16, quant_scope="enc"):
    from tests.oracle_ref import our_cfg

    cfg = our_cfg(causal=True)
    enc_cfg = dataclasses.replace(cfg, compute=compute,
                                  quant_min_ch=quant_min_ch,
                                  quant_scope=quant_scope)
    dec_cfg = dataclasses.replace(enc_cfg, skip_mode="runtime")
    return enc_cfg, dec_cfg


def test_enhancer_int8_end_to_end_close_to_f32():
    """Full NSVAE->decoder enhancement with every conv quantized
    (quant_scope='all', quant_min_ch=1 at tiny geometry) stays close to
    the f32 output and is deterministic given the rng."""
    from idccrn_vae_tpu.eval.enhance import Enhancer
    from idccrn_vae_tpu.models.nsvae import NsvaeEncoder
    from idccrn_vae_tpu.models.vae import VaeDecoder

    enc_cfg8, dec_cfg8 = _tiny_cfgs("int8", quant_min_ch=1,
                                    quant_scope="all")
    enc_cfg32, dec_cfg32 = _tiny_cfgs("f32")
    enc_vars = NsvaeEncoder(enc_cfg32).init(jax.random.PRNGKey(0))
    dec_vars = VaeDecoder(dec_cfg32).init(jax.random.PRNGKey(1))
    wav = jnp.asarray(np.random.default_rng(6)
                      .standard_normal((2, 400)) * 0.1, jnp.float32)

    outs = {}
    for name, (ec, dc) in (("f32", (enc_cfg32, dec_cfg32)),
                           ("int8", (enc_cfg8, dec_cfg8))):
        enh = Enhancer(ec, dc, enc_vars, dec_vars, num_samples=1,
                       bucket_frames=10)
        out = enh.forward(enc_vars, dec_vars, None, wav,
                          jax.random.PRNGKey(7))
        outs[name] = np.asarray(out, np.float32)
    assert np.isfinite(outs["int8"]).all()
    # measured: 0.016 (bf16 vs f32 on the same pipeline measures 0.005)
    assert _rel_err(outs["int8"], outs["f32"]) < 0.05


def test_enhancer_int8_enc_scope_between_bf16_and_all():
    """Default scope 'enc' quantizes encoder convs only (the decoder's
    lhs-dilated convs gain nothing from int8 — INT8_PROBE.json): its
    error vs f32 must sit between pure-bf16 noise and full quant."""
    from idccrn_vae_tpu.eval.enhance import Enhancer
    from idccrn_vae_tpu.models.nsvae import NsvaeEncoder
    from idccrn_vae_tpu.models.vae import VaeDecoder

    enc32, dec32 = _tiny_cfgs("f32")
    enc_vars = NsvaeEncoder(enc32).init(jax.random.PRNGKey(0))
    dec_vars = VaeDecoder(dec32).init(jax.random.PRNGKey(1))
    wav = jnp.asarray(np.random.default_rng(6)
                      .standard_normal((2, 400)) * 0.1, jnp.float32)
    errs = {}
    for name, scope in (("enc", "enc"), ("all", "all")):
        ec, dc = _tiny_cfgs("int8", quant_min_ch=1, quant_scope=scope)
        enh = Enhancer(ec, dc, enc_vars, dec_vars, num_samples=1,
                       bucket_frames=10)
        out = enh.forward(enc_vars, dec_vars, None, wav,
                          jax.random.PRNGKey(7))
        ref = Enhancer(enc32, dec32, enc_vars, dec_vars, num_samples=1,
                       bucket_frames=10).forward(
                           enc_vars, dec_vars, None, wav,
                           jax.random.PRNGKey(7))
        errs[name] = _rel_err(np.asarray(out, np.float32),
                              np.asarray(ref, np.float32))
    assert 0 < errs["enc"] <= errs["all"] * 1.5  # enc is a subset
    assert errs["enc"] < 0.05
