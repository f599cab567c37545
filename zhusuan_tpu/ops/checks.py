"""Numerics guards.

Parity: the reference wraps intermediate ops in ``tf.check_numerics`` behind a
``check_numerics=False`` flag on every continuous distribution (e.g.
``zhusuan/distributions/univariate.py:101-111,179-180``). Pure functions make
this the only "sanitizer" the framework needs (see SURVEY.md §5).

Two tiers:

- :func:`check_numerics` — drop-in, zero API impact: a host callback flags
  non-finite values. The raise happens inside the callback, so it surfaces
  as a runtime error at the next host sync (``block_until_ready`` /
  fetching the result); on some backends an async callback error can only
  be logged, so this tier is best-effort by construction.
- :func:`checked` — guaranteed error path built on
  ``jax.experimental.checkify``: wraps a function so every
  :func:`check_numerics` site inside it (plus checkify's float checks)
  raises deterministically (``JaxRuntimeError`` carrying the check
  message), under ``jit``/``scan``.
"""

from __future__ import annotations

import contextvars
import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["check_numerics", "checked"]

# True while tracing under checked(): check_numerics then emits a
# functionalized checkify.check (guaranteed error) instead of the
# best-effort host callback. A bare checkify.check would fail at lowering
# when no checkify transform is active, so it must be gated.
_IN_CHECKED = contextvars.ContextVar("zs_in_checked", default=False)


def _host_assert_finite(ok, message):
    """Host-side assert invoked by the debug callback; raising here surfaces
    at the next host synchronization point."""
    if not bool(np.asarray(ok)):
        raise FloatingPointError(
            "check_numerics failed for {!r}: found NaN/Inf.".format(message)
        )


def check_numerics(x, message: str, enabled: bool = True):
    """Return ``x``, flagging NaN/Inf (reference ``tf.check_numerics``).

    Under a plain ``jit`` the failure raises from a host callback at the
    next sync (best-effort on async backends — see module docstring); under
    a :func:`checked`-wrapped function the failure is a guaranteed
    ``FloatingPointError``. When ``enabled`` is False this is the identity
    and compiles to nothing.
    """
    if not enabled:
        return x
    is_finite = jnp.all(jnp.isfinite(x))
    if _IN_CHECKED.get():
        from jax.experimental import checkify

        checkify.check(
            is_finite,
            "check_numerics failed for '{}': found NaN/Inf.".format(message),
        )
    else:
        jax.debug.callback(_host_assert_finite, is_finite, message)
    return x


def checked(fn, errors=None):
    """Wrap ``fn`` so numeric failures raise deterministically (the
    guaranteed tier; works under jit/scan/vmap).

    ``checked(fn)(*args)`` functionalizes the error with
    ``jax.experimental.checkify`` and throws it on return. Includes every
    :func:`check_numerics` site inside ``fn`` and, by default, checkify's
    automatic float checks (NaN from any primitive).

    Caveat: wrap the *underlying* function, not a ``jit`` that has already
    been traced — a pre-existing jit cache entry was traced with the
    best-effort host-callback guards baked in, and checkify reuses it, so
    only the automatic float checks would remain guaranteed. Wrapping a
    fresh function (jitted or not) gets the full guarantee.

    :param errors: checkify error set (default: user checks + float
        checks).
    """
    from jax.experimental import checkify

    if errors is None:
        errors = checkify.user_checks | checkify.float_checks

    checked_fn = checkify.checkify(fn, errors=errors)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        token = _IN_CHECKED.set(True)
        try:
            err, out = checked_fn(*args, **kwargs)
        finally:
            _IN_CHECKED.reset(token)
        err.throw()
        return out

    return wrapper
