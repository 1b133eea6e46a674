"""Fused LSTM-layer recurrence as a Pallas TPU kernel.

The LSTM time recurrence is the one serial dependency in the DCCRN
pipeline (T=481 steps). XLA compiles `lax.scan` to a device while-loop
whose carries round-trip through HBM each iteration; this kernel keeps
the hidden/cell state AND the recurrent weights resident in VMEM for
the whole sequence and fuses the gate nonlinearities into the same
step:

  grid = (W, T)   # W = stacked weight sets (the complex LSTM's re/im
                  # pair), T sequential on the TPU core
  per step:  gates = x_proj[w, :, t] + h @ w_hh[w]
             i,f,g,o -> c = f*c + i*g ; h = o*tanh(c)

Scratch h/c persist across grid steps (TPU grids execute sequentially);
they are re-zeroed at t == 0 of each weight set. Input projections
(the large parallelizable matmuls) stay outside in XLA where they batch
over all timesteps at once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_lstm_available() -> bool:
    return jax.default_backend() == "tpu"


def _kernel(xp_ref, whh_ref, out_ref, h_ref, c_ref, *, time_block: int):
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    whh = whh_ref[0]
    hidden = h_ref.shape[-1]

    def step(i, carry):
        h, c = carry
        gates = xp_ref[0, i, :, :] + jnp.dot(
            h.astype(whh.dtype), whh, preferred_element_type=jnp.float32)
        ig = jax.nn.sigmoid(gates[:, :hidden])
        fg = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
        gg = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
        og = jax.nn.sigmoid(gates[:, 3 * hidden :])
        c = fg * c + ig * gg
        h = og * jnp.tanh(c)
        out_ref[0, i, :, :] = h.astype(out_ref.dtype)
        return h, c

    h, c = h_ref[:], c_ref[:]
    for i in range(time_block):
        h, c = step(i, (h, c))
    h_ref[:] = h
    c_ref[:] = c


@functools.partial(jax.jit, static_argnames=("interpret",))
def stacked_lstm_layer(x_proj: jnp.ndarray, w_hh: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Run the recurrence for W stacked weight sets.

    Args:
      x_proj: (W, T, B, 4H) fp32 — input projections + biases. Time is
        the second axis so each per-step block keeps (B, 4H) as the
        trailing (sublane, lane) dims, which the TPU lowering requires
        to be full-size.
      w_hh:   (W, H, 4H) — recurrent weights (fp32 or bf16; the matmul
        runs at w_hh's dtype with fp32 accumulation).
    Returns:
      (W, T, B, H) fp32 hidden states.
    """
    w, t, b, h4 = x_proj.shape
    hidden = h4 // 4
    # Block several timesteps per grid invocation to amortize grid
    # overhead; pad T up to a block multiple (state evolution over the
    # trailing pad garbage happens after every real output is written).
    time_block = 8 if t >= 8 else 1
    t_pad = ((t + time_block - 1) // time_block) * time_block
    if t_pad != t:
        x_proj = jnp.pad(x_proj, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
    grid = (w, t_pad // time_block)
    out = pl.pallas_call(
        functools.partial(_kernel, time_block=time_block),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, time_block, b, h4),
                         lambda wi, ti: (wi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden, h4), lambda wi, ti: (wi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, time_block, b, hidden),
                               lambda wi, ti: (wi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((w, t_pad, b, hidden), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((b, hidden), jnp.float32),
            pltpu.VMEM((b, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(x_proj, w_hh)
    return out[:, :t]
