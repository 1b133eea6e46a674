"""ComplexDense: independent real/imag linear layers.

Note the reference's ComplexDense is NOT a true complex linear — real
and imag each get their own independent nn.Linear with no cross terms
(/root/reference/model/complex_progress.py:77-89). We reproduce that
semantic as a single block-diagonal matmul over the cpack layout so it
stays one MXU op.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def init_complex_dense(key, in_ch: int, out_ch: int, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(in_ch)
    ks = jax.random.split(key, 4)
    u = lambda k, s: jax.random.uniform(k, s, dtype, minval=-bound, maxval=bound)
    return {
        "wr": u(ks[0], (in_ch, out_ch)),
        "wi": u(ks[1], (in_ch, out_ch)),
        "br": u(ks[2], (out_ch,)),
        "bi": u(ks[3], (out_ch,)),
    }


def complex_dense(x: jnp.ndarray, params: dict, compute_dtype=None) -> jnp.ndarray:
    """Apply independent real/imag linears to a cpack array (..., 2*Cin).

    Equivalent to one matmul with the block-diagonal weight
    ``[[wr, 0], [0, wi]]`` — expressed directly so XLA emits a single
    batched matmul per half without materializing zeros.

    NOTE: the XLA:TPU post-optimization shape-check failure that train
    steps hit at batch<8 (XLA_DENSE_REPRO.json) carries this line in its
    metadata, but that attribution is post-fusion noise: reformulating
    this op to flatten leading dims (single-axis bias-grad reduce) was
    probed on TPU and did NOT change the failure, and the mis-shaped
    instruction's dims match the first encoder conv's kernel grad
    (kf=5, 2*C1), not any dense shape. See tools/
    repro_xla_dense_backward.py; workaround lives in train/ (batch
    padding), not here.
    """
    re, im = jnp.split(x, 2, axis=-1)
    wr, wi = params["wr"], params["wi"]
    if compute_dtype is not None:
        re, im = re.astype(compute_dtype), im.astype(compute_dtype)
        wr, wi = wr.astype(compute_dtype), wi.astype(compute_dtype)
    out_re = jnp.dot(re, wr, preferred_element_type=jnp.float32) + params["br"]
    out_im = jnp.dot(im, wi, preferred_element_type=jnp.float32) + params["bi"]
    return jnp.concatenate([out_re, out_im], axis=-1)
