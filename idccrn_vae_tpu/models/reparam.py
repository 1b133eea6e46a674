"""Complex-Gaussian latent parameterization + reparameterized sampling.

One implementation of the math the reference duplicates verbatim in
every encoder (e.g. pvae_module.py:307-361 and :713-769):

  z_r = mu_r + ((sigma+delta_r)/sqrt(2(sigma+delta_r))) * eps_r
  z_i = mu_i + (delta_i/sqrt(2(sigma+delta_r))) * eps_r
             + (sqrt(sigma^2-|delta|^2)/sqrt(2(sigma+delta_r))) * eps_i

with the |delta| <= 0.99*sigma projection guard. Two numerical-guard
flavors exist in the reference and matter for checkpoint parity:

  * guard='eps'   — sliced-LSTM-head encoders: +epsilon inside sqrts
                    and denominators (pvae_module.py:307-361).
  * guard='clamp' — fc-latent encoders: log_sigma clamped to [-13,13]
                    and sqrt args clamped to >= epsilon
                    (pvae_module.py:713-769).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-6


class CGauss(NamedTuple):
    """Complex-Gaussian posterior parameters, each (B, T, H).

    The reference carries log_sigma as a complex pair but only ever uses
    its real part (sigma = exp(log_sigma[..., 0])); we keep the unused
    imaginary head output in `log_sigma_i` so checkpoints round-trip.
    """

    mu_r: jnp.ndarray
    mu_i: jnp.ndarray
    log_sigma: jnp.ndarray
    delta_r: jnp.ndarray
    delta_i: jnp.ndarray
    log_sigma_i: jnp.ndarray | None = None


def project_delta(sigma, delta_r, delta_i, eps: float = _EPS,
                  factor: float = 0.99):
    """Scale delta to |delta| <= factor*sigma where it violates the bound."""
    abs_delta = jnp.sqrt(delta_r**2 + delta_i**2 + eps)
    scale = sigma * factor / (abs_delta + eps)
    viol = abs_delta >= (sigma - 1e-3)
    return (
        jnp.where(viol, delta_r * scale, delta_r),
        jnp.where(viol, delta_i * scale, delta_i),
    )


def reparameterize(
    rng: jax.Array,
    g: CGauss,
    num_samples: int,
    guard: str = "eps",
    noise=None,
) -> jnp.ndarray:
    """Draw num_samples per batch element; returns cpack (B*S, T, 2*H).

    Sample-major-within-batch ordering (b0s0, b0s1, …, b1s0, …) matches
    the reference's view(B*num_samples, T, H).

    noise: optional explicit (eps_r, eps_i) pair, each (B, S, T, H) —
    used by parity tests to drive this and the reference's
    reparameterization (pvae_module.py:307-361) with identical draws.
    """
    if guard == "clamp":
        sigma = jnp.exp(jnp.clip(g.log_sigma, -13.0, 13.0))
    else:
        sigma = jnp.exp(g.log_sigma)
    delta_r, delta_i = project_delta(sigma, g.delta_r, g.delta_i)
    abs_delta2 = delta_r**2 + delta_i**2 + _EPS

    if guard == "clamp":
        denom = jnp.sqrt(jnp.maximum(2.0 * (sigma + delta_r), _EPS))
        scale_rr = (sigma + delta_r) / denom
        scale_ir = delta_i / denom
        scale_ii = jnp.sqrt(jnp.maximum(sigma**2 - abs_delta2, _EPS)) / denom
    else:
        denom = jnp.sqrt(2.0 * (sigma + delta_r) + _EPS)
        scale_rr = (sigma + delta_r) / (denom + _EPS)
        scale_ir = delta_i / (denom + _EPS)
        scale_ii = jnp.sqrt(sigma**2 - abs_delta2 + _EPS) / (denom + _EPS)

    b, t, h = g.mu_r.shape
    if noise is not None:
        eps_r, eps_i = noise
    else:
        kr, ki = jax.random.split(rng)
        eps_r = jax.random.normal(kr, (b, num_samples, t, h), g.mu_r.dtype)
        eps_i = jax.random.normal(ki, (b, num_samples, t, h), g.mu_r.dtype)

    z_r = g.mu_r[:, None] + scale_rr[:, None] * eps_r
    z_i = g.mu_i[:, None] + scale_ir[:, None] * eps_r + scale_ii[:, None] * eps_i
    z_r = z_r.reshape(b * num_samples, t, h)
    z_i = z_i.reshape(b * num_samples, t, h)
    return jnp.concatenate([z_r, z_i], axis=-1)
