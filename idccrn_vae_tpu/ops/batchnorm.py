"""Complex batch normalization (Trabelsi-style 2x2 whitening), functional.

Reproduces ComplexBatchNormal (/root/reference/model/complex_progress.py:
92-209) semantics exactly, in a functional form (stats are explicit
state threaded through the step, jit/pjit-friendly):

  * per-channel mean removal over (B, F, T),
  * 2x2 covariance (Vrr, Vri, Vii) inverse-sqrt via the closed form
    ``s = sqrt(det)``, ``t = sqrt(tau + 2 s)``,
  * learnable gamma_rr/gamma_ri/gamma_ii + beta_r/beta_i,
  * running stats with momentum 0.9 (new = 0.9*old + 0.1*batch),
  * first-batch wholesale copy (the reference's ``init_flag``), tracked
    here as a step counter,
  * ``dis_mode=True`` (discriminator CBN) re-copies every batch,
  * the train/eval switch is an explicit argument, decoupled from any
    module mode, exactly like the reference's call-time ``train`` flag.

Numerical guards match the reference: epsilon=1e-5 everywhere, det
clamped to >= 1e-8. Stats math runs in fp32 regardless of activation
dtype — whitening amplifies rounding otherwise.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-5


def init_cbn_params(key, channels: int, dtype=jnp.float32):
    """gamma_rr/ii = 1, gamma_ri ~ N(0,1) (sic — reference uses randn),
    betas = 0 (complex_progress.py:96-100)."""
    import jax

    return {
        "gamma_rr": jnp.ones((channels,), dtype),
        "gamma_ri": jax.random.normal(key, (channels,), dtype),
        "gamma_ii": jnp.ones((channels,), dtype),
        "beta_r": jnp.zeros((channels,), dtype),
        "beta_i": jnp.zeros((channels,), dtype),
    }


def init_cbn_stats(channels: int):
    """Running stats + init-copy counter (complex_progress.py:108-114)."""
    return {
        "mean_r": jnp.zeros((channels,), jnp.float32),
        "mean_i": jnp.zeros((channels,), jnp.float32),
        "Vrr": jnp.ones((channels,), jnp.float32),
        "Vri": jnp.zeros((channels,), jnp.float32),
        "Vii": jnp.ones((channels,), jnp.float32),
        "count": jnp.zeros((), jnp.int32),
    }


def _whiten_affine(re_c, im_c, vrr, vii, vri, params):
    """The reference's cbn() closed form (complex_progress.py:168-209)."""
    tau = vrr + vii
    det = jnp.maximum(vrr * vii - vri * vri + _EPS, 1e-8)
    s = jnp.sqrt(det)
    t = jnp.sqrt(tau + 2.0 * s + _EPS)
    inv_st = 1.0 / (s * t + _EPS)
    wrr = (vii + s) * inv_st
    wii = (vrr + s) * inv_st
    wri = -vri * inv_st

    g_rr = params["gamma_rr"].astype(jnp.float32)
    g_ri = params["gamma_ri"].astype(jnp.float32)
    g_ii = params["gamma_ii"].astype(jnp.float32)
    zrr = g_rr * wrr + g_ri * wri
    zri = g_rr * wri + g_ri * wii
    zir = g_ri * wrr + g_ii * wri
    zii = g_ri * wri + g_ii * wii

    out_re = zrr * re_c + zri * im_c + params["beta_r"].astype(jnp.float32)
    out_im = zir * re_c + zii * im_c + params["beta_i"].astype(jnp.float32)
    return out_re, out_im


def complex_batch_norm(
    x: jnp.ndarray,
    params: dict,
    stats: dict,
    train: bool,
    dis_mode: bool = False,
    momentum: float = 0.9,
):
    """Apply complex BN to a cpack feature map.

    Args:
      x: (B, F, T, 2*C).
      train: python bool (static under jit) — batch stats + running
        update when True, running stats when False.
    Returns:
      (normalized x with input dtype, new_stats).
    """
    dtype = x.dtype
    c = x.shape[-1] // 2
    re = x[..., :c].astype(jnp.float32)
    im = x[..., c:].astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))  # (B, F, T) — per channel

    if not train:
        re_c = re - stats["mean_r"]
        im_c = im - stats["mean_i"]
        out_re, out_im = _whiten_affine(
            re_c, im_c, stats["Vrr"], stats["Vii"], stats["Vri"], params
        )
        out = jnp.concatenate([out_re, out_im], axis=-1).astype(dtype)
        return out, stats

    mu_r = jnp.mean(re, axis=axes)
    mu_i = jnp.mean(im, axis=axes)
    re_c = re - mu_r
    im_c = im - mu_i
    vrr = jnp.mean(re_c * re_c, axis=axes) + _EPS
    vii = jnp.mean(im_c * im_c, axis=axes) + _EPS
    vri = jnp.mean(re_c * im_c, axis=axes)

    if dis_mode:
        copy = jnp.bool_(True)
    else:
        copy = stats["count"] == 0
    blend = lambda run, batch: jnp.where(
        copy, batch, momentum * run + (1.0 - momentum) * batch
    )
    new_stats = {
        "mean_r": blend(stats["mean_r"], mu_r),
        "mean_i": blend(stats["mean_i"], mu_i),
        "Vrr": blend(stats["Vrr"], vrr),
        "Vri": blend(stats["Vri"], vri),
        "Vii": blend(stats["Vii"], vii),
        "count": stats["count"] + 1,
    }

    out_re, out_im = _whiten_affine(re_c, im_c, vrr, vii, vri, params)
    out = jnp.concatenate([out_re, out_im], axis=-1).astype(dtype)
    return out, new_stats
