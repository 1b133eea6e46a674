"""Complex-tensor layout helpers.

The reference stores complex tensors as real tensors with a trailing dim
of size 2 (``[..., 0]`` real, ``[..., 1]`` imag; see
/root/reference/model/complex_progress.py). A trailing axis of 2 is the
worst possible lane dimension on TPU (lane width is 128), so this
framework packs complex feature maps channel-last instead:

    cpack layout: ``(..., 2*C)`` — first C lanes real, last C lanes imag.

Feature maps flow through the network as ``(B, F, T, 2*C)`` (NHWC for
`lax.conv_general_dilated`), sequences as ``(B, T, 2*H)``. With C up to
256 this gives 512-wide lane dims that tile cleanly onto the MXU/VPU.

Latent Gaussian parameters (mu, delta) are carried as explicit
``(real, imag)`` pairs of ``(B, T, H)`` arrays to keep the loss algebra
slice-free.
"""

from __future__ import annotations

import jax.numpy as jnp


def creal(x: jnp.ndarray) -> jnp.ndarray:
    """Real half of a cpack array (last axis is 2*C)."""
    c = x.shape[-1] // 2
    return x[..., :c]


def cimag(x: jnp.ndarray) -> jnp.ndarray:
    """Imaginary half of a cpack array."""
    c = x.shape[-1] // 2
    return x[..., c:]


def csplit(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Split a cpack array into (real, imag)."""
    c = x.shape[-1] // 2
    return x[..., :c], x[..., c:]


def cpack(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    """Concatenate (real, imag) into cpack layout along the last axis."""
    return jnp.concatenate([re, im], axis=-1)


def pair_to_cpack(x: jnp.ndarray) -> jnp.ndarray:
    """Convert reference layout ``(..., C, 2)`` to cpack ``(..., 2*C)``."""
    return jnp.concatenate([x[..., 0], x[..., 1]], axis=-1)


def cpack_to_pair(x: jnp.ndarray) -> jnp.ndarray:
    """Convert cpack ``(..., 2*C)`` to reference layout ``(..., C, 2)``."""
    re, im = csplit(x)
    return jnp.stack([re, im], axis=-1)


def cabs2(x: jnp.ndarray) -> jnp.ndarray:
    """Squared magnitude per complex channel: ``re^2 + im^2`` -> (..., C)."""
    re, im = csplit(x)
    return re * re + im * im


def cabs(x: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Magnitude per complex channel -> (..., C)."""
    return jnp.sqrt(cabs2(x) + eps)
