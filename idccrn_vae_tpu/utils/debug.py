"""Runtime NaN/Inf invariant checking.

The reference sprinkles check_and_log_nan helpers through models and
losses (mostly commented out at call sites; SURVEY.md §4.1). The
jit-compatible equivalents here:

  * `check_finite(tree, name)` — host-side assertion over a pytree
    (use between steps; pulls values to host).
  * `checkify_finite(x, name)` — in-graph check via
    jax.debug.check (works under jit, aborts with a message).
  * `enable_global_nan_debugging()` — flips jax_debug_nans, which makes
    XLA re-run failing ops eagerly to localize the NaN source.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def check_finite(tree, name: str = "tree") -> None:
    """Raise RuntimeError if any leaf contains NaN/Inf (host-side)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        if not np.isfinite(a).all():
            keys = "/".join(str(p) for p in path)
            raise RuntimeError(
                f"NaN/Inf detected in {name}:{keys} "
                f"(nan={np.isnan(a).sum()}, inf={np.isinf(a).sum()})"
            )


def checkify_finite(x: jnp.ndarray, name: str = "value") -> jnp.ndarray:
    """In-graph finite check via checkify.check.

    The enclosing function must be wrapped with
    `jax.experimental.checkify.checkify(...)` before (or instead of)
    `jax.jit` — a bare checkify.check cannot be staged under plain jit
    (see tests/test_utils.py for the wrapping pattern)."""
    from jax.experimental import checkify

    checkify.check(jnp.isfinite(x).all(), f"NaN/Inf detected in {name}")
    return x


def enable_global_nan_debugging() -> None:
    jax.config.update("jax_debug_nans", True)
