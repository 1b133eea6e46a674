"""LSTM and complex LSTM as `lax.scan` recurrences, TPU-first.

The reference's ComplexLSTM runs FOUR full nn.LSTM passes per call
(``re = lstm_re(xr) - lstm_im(xi); im = lstm_re(xi) + lstm_im(xr)``;
/root/reference/model/complex_progress.py:39-74). Here the same math is
restructured for the MXU:

  1. The input projections ``x @ W_ih^T`` for ALL timesteps are hoisted
     out of the recurrence into one large batched matmul.
  2. The 4 passes collapse into ONE scan: the two weight sets (re, im)
     are stacked on a leading axis and vmapped, and the two inputs
     (xr, xi) are stacked on the batch axis, so each scan step is a
     single (2, 2B, H) x (2, H, 4H) batched matmul.

Gate order matches torch (i, f, g, o) so reference checkpoints can be
imported weight-for-weight.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


def init_lstm(key, input_size: int, hidden_size: int, num_layers: int,
              dtype=jnp.float32):
    """torch nn.LSTM-style init: uniform(-1/sqrt(H), 1/sqrt(H)).

    Returns a list (one per layer) of dicts with w_ih (In, 4H),
    w_hh (H, 4H), b_ih (4H,), b_hh (4H,). Note w_* are stored
    transposed relative to torch ((4H, In)) so the forward matmul needs
    no transpose.
    """
    bound = 1.0 / math.sqrt(hidden_size)
    layers = []
    for layer in range(num_layers):
        in_sz = input_size if layer == 0 else hidden_size
        key, *ks = jax.random.split(key, 5)
        u = lambda k, s: jax.random.uniform(k, s, dtype, minval=-bound, maxval=bound)
        layers.append({
            "w_ih": u(ks[0], (in_sz, 4 * hidden_size)),
            "w_hh": u(ks[1], (hidden_size, 4 * hidden_size)),
            "b_ih": u(ks[2], (4 * hidden_size,)),
            "b_hh": u(ks[3], (4 * hidden_size,)),
        })
    return layers


def _lstm_layer(x_proj: jnp.ndarray, w_hh: jnp.ndarray, hidden: int,
                unroll: int = 4, carry=None, return_carry: bool = False):
    """Scan one LSTM layer given precomputed input projections.

    x_proj: (T, ..., 4H) fp32 — input matmul + both biases applied.
    w_hh:   (H, 4H), possibly reduced precision (bf16): the recurrent
            matmul runs at w_hh's dtype with fp32 accumulation; the
            cell state c stays fp32 for stability.
    carry:  optional (h, c) initial state (for streaming inference).
    Returns outputs (T, ..., H) at w_hh's dtype (+ final carry if
    return_carry).
    """
    cdtype = w_hh.dtype

    def step(carry, xp):
        h, c = carry
        gates = xp + jnp.matmul(h, w_hh, preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = (o * jnp.tanh(c)).astype(cdtype)
        return (h, c), h

    batch_shape = x_proj.shape[1:-1]
    if carry is None:
        carry = (
            jnp.zeros(batch_shape + (hidden,), dtype=cdtype),
            jnp.zeros(batch_shape + (hidden,), dtype=jnp.float32),
        )
    else:
        carry = (carry[0].astype(cdtype), carry[1].astype(jnp.float32))
    final, out = lax.scan(step, carry, x_proj, unroll=unroll)
    if return_carry:
        return out, final
    return out


def lstm(x: jnp.ndarray, layers: Sequence[dict], unroll: int = 4,
         compute_dtype=None, state=None, return_state: bool = False):
    """Multi-layer unidirectional LSTM.

    Args:
      x: (B, T, In).
      compute_dtype: optional reduced precision (e.g. bf16) for the
        matmul operands; accumulation is always fp32.
      state: optional list of per-layer (h, c) carries (streaming).
    Returns:
      (B, T, H) fp32 outputs of the last layer (+ final state list if
      return_state).
    """
    hidden = layers[0]["w_hh"].shape[0]
    h = jnp.swapaxes(x, 0, 1)  # (T, B, In) — scan over leading axis
    finals = []
    for li, p in enumerate(layers):
        w_ih, w_hh = p["w_ih"], p["w_hh"]
        if compute_dtype is not None:
            h = h.astype(compute_dtype)
            w_ih = w_ih.astype(compute_dtype)
            w_hh = w_hh.astype(compute_dtype)
        x_proj = (
            jnp.matmul(h, w_ih, preferred_element_type=jnp.float32)
            + p["b_ih"] + p["b_hh"]
        )
        carry = state[li] if state is not None else None
        h, final = _lstm_layer(x_proj, w_hh, hidden, unroll=unroll,
                               carry=carry, return_carry=True)
        finals.append(final)
    out = jnp.swapaxes(h, 0, 1).astype(jnp.float32)
    if return_state:
        return out, finals
    return out


def init_complex_lstm(key, input_size: int, hidden_size: int, num_layers: int,
                      dtype=jnp.float32):
    """Two independent real LSTMs (re, im) like the reference."""
    k1, k2 = jax.random.split(key)
    return {
        "re": init_lstm(k1, input_size, hidden_size, num_layers, dtype),
        "im": init_lstm(k2, input_size, hidden_size, num_layers, dtype),
    }


def complex_lstm(x: jnp.ndarray, params: dict, unroll: int = 4,
                 compute_dtype=None, backend: str = "auto",
                 state=None, return_state: bool = False):
    """Complex LSTM over a cpack sequence.

    Args:
      x: (B, T, 2*In) cpack sequence.
    Returns:
      (B, T, 2*H) cpack outputs:
        re = lstm_re(xr) - lstm_im(xi); im = lstm_re(xi) + lstm_im(xr).

    One scan total: weights stacked (2, ...) and vmapped; inputs stacked
    on batch (xr, xi) so all 4 reference passes are a single batched
    recurrence.
    """
    b = x.shape[0]
    re, im = jnp.split(x, 2, axis=-1)
    xin = jnp.concatenate([re, im], axis=0)  # (2B, T, In)

    # Stack re/im weights on a leading axis: every matmul (input
    # projection and the in-recurrence step) batches over the two
    # weight sets, so the whole complex LSTM is ONE recurrence.
    stacked = jax.tree.map(lambda a, b_: jnp.stack([a, b_]),
                           list(params["re"]), list(params["im"]))
    hidden = params["re"][0]["w_hh"].shape[0]

    if backend not in ("auto", "scan"):
        # A Pallas LSTM kernel existed through round 2 (opt-in via
        # backend='pallas') and was REMOVED in round 3 after losing its
        # last candidate niche: offline it benched at parity with the
        # batched scan on v5e (CLAUDE.md round-2 note), and at the B=1
        # streaming chunk-step geometry the stateless kernel (105-120 us)
        # did not beat the STATEFUL scan (103-108 us, STREAM_BENCH.json
        # lstm_probe_us) — while also lacking carried-(h, c) support, so
        # it could never serve the streaming path it was kept for.
        raise ValueError(f"unknown LSTM backend {backend!r}; the Pallas "
                         "kernel was removed (see STREAM_BENCH.json) — "
                         "use 'auto' or 'scan'")
    if return_state or state is not None:
        out, final_state = jax.vmap(
            lambda p, s: lstm(xin, p, unroll=unroll,
                              compute_dtype=compute_dtype, state=s,
                              return_state=True)
        )(stacked, state if state is not None
          else _zero_state(len(stacked), hidden, 2 * b, x.dtype))
    else:
        out = jax.vmap(
            lambda p: lstm(xin, p, unroll=unroll,
                           compute_dtype=compute_dtype)
        )(stacked)
    # out: (2, 2B, T, H); [0] = lstm_re on [xr;xi], [1] = lstm_im on [xr;xi].
    out_re = out[0, :b] - out[1, b:]
    out_im = out[0, b:] + out[1, :b]
    result = jnp.concatenate([out_re, out_im], axis=-1)
    if return_state:
        return result, final_state
    return result


def _zero_state(num_layers: int, hidden: int, batch: int, dtype):
    """Stacked-zero LSTM state: list per layer of (h, c), each with a
    leading weight-set axis of 2 for the complex LSTM's vmap."""
    z = lambda: jnp.zeros((2, batch, hidden), dtype)
    return [(z(), z()) for _ in range(num_layers)]
