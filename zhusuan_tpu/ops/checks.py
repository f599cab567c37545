"""Numerics guards.

Parity: the reference wraps intermediate ops in ``tf.check_numerics`` behind a
``check_numerics=False`` flag on every continuous distribution (e.g.
``zhusuan/distributions/univariate.py:101-111,179-180``). On TPU we keep the
opt-in semantics via a host callback that raises ``FloatingPointError`` when a
non-finite value is observed — pure functions make this the only "sanitizer"
the framework needs (see SURVEY.md §5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["check_numerics"]


def _host_assert_finite(x, message: str):
    x = np.asarray(x)
    if not np.all(np.isfinite(x)):
        bad = "NaN" if np.any(np.isnan(x)) else "Inf"
        raise FloatingPointError(
            "check_numerics failed for {!r}: found {}.".format(message, bad)
        )


def check_numerics(x, message: str, enabled: bool = True):
    """Return ``x``, raising (via host callback) if it contains NaN/Inf.

    Works under ``jit``/``vmap``/``scan``; the callback is asynchronous so the
    error surfaces at the next host sync. When ``enabled`` is False this is the
    identity and compiles to nothing.
    """
    if not enabled:
        return x
    is_finite = jnp.all(jnp.isfinite(x))
    jax.debug.callback(
        lambda ok, v=None: (_ for _ in ()).throw(
            FloatingPointError(
                "check_numerics failed for {!r}: non-finite value.".format(message)
            )
        )
        if not ok
        else None,
        is_finite,
    )
    return x
