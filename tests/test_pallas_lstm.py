"""Pallas LSTM kernel correctness vs the lax.scan path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from idccrn_vae_tpu.ops.lstm import _lstm_layer, init_complex_lstm
from idccrn_vae_tpu.ops.pallas.lstm_kernel import stacked_lstm_layer


def test_stacked_lstm_layer_matches_scan():
    w, b, t, h = 2, 4, 12, 8
    rng = np.random.default_rng(0)
    x_proj = jnp.asarray(rng.standard_normal((w, t, b, 4 * h)), jnp.float32)
    w_hh = jnp.asarray(rng.standard_normal((w, h, 4 * h)) * 0.3, jnp.float32)

    out_pallas = stacked_lstm_layer(x_proj, w_hh, interpret=True)

    # reference: per-weight-set scan
    outs = []
    for i in range(w):
        o = _lstm_layer(x_proj[i], w_hh[i], h)    # (T, B, H)
        outs.append(o)
    ref = jnp.stack(outs)
    np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_state_reset_between_weight_sets():
    """h/c must re-zero at t=0 of the second weight set."""
    w, b, t, h = 2, 2, 6, 4
    rng = np.random.default_rng(1)
    xp_one = rng.standard_normal((1, t, b, 4 * h)).astype(np.float32)
    whh_one = (rng.standard_normal((1, h, 4 * h)) * 0.3).astype(np.float32)
    # duplicate the same weight set twice: outputs must be identical
    xp = jnp.asarray(np.concatenate([xp_one, xp_one]))
    whh = jnp.asarray(np.concatenate([whh_one, whh_one]))
    out = np.asarray(stacked_lstm_layer(xp, whh, interpret=True))
    np.testing.assert_allclose(out[0], out[1], atol=1e-6)


def test_pallas_backend_guards():
    """backend='pallas' must fail loudly (not UnboundLocalError or an
    opaque Mosaic error) when asked for carried state or run off-TPU."""
    import pytest

    from idccrn_vae_tpu.ops.lstm import complex_lstm

    params = init_complex_lstm(jax.random.PRNGKey(0), 4, 4, 1)
    x = jnp.zeros((2, 6, 8), jnp.float32)
    with pytest.raises(ValueError, match="carried LSTM state"):
        complex_lstm(x, params, backend="pallas", return_state=True)
    with pytest.raises(ValueError, match="carried LSTM state"):
        complex_lstm(x, params, backend="pallas",
                     state=[(jnp.zeros((2, 4, 4)), jnp.zeros((2, 4, 4)))])
    if jax.default_backend() != "tpu":
        with pytest.raises(ValueError, match="requires a TPU"):
            complex_lstm(x, params, backend="pallas")
