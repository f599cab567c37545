"""General utilities.

Capability parity with reference ``zhusuan/utils.py`` (log_mean_exp at
utils.py:177, log_sum_exp at utils.py:156, merge_dicts at utils.py:220), but
implemented on jax.numpy. The reference's ``TensorArithmeticMixin``
(utils.py:18) lives in :mod:`zhusuan_tpu.framework.arith` where the
StochasticTensor node uses it.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

__all__ = [
    "log_sum_exp",
    "log_mean_exp",
    "merge_dicts",
    "split_by_names",
    "add_name_scope",
]


def log_sum_exp(x, axis=None, keepdims=False):
    """Numerically stable log-sum-exp along ``axis``.

    Parity: reference ``zhusuan/utils.py:156-174`` (deprecated there in favor
    of tf.reduce_logsumexp; here we delegate to the XLA-fused
    ``jax.scipy.special.logsumexp``).
    """
    return jax.scipy.special.logsumexp(x, axis=axis, keepdims=keepdims)


def log_mean_exp(x, axis=None, keepdims=False):
    """Numerically stable log-mean-exp along ``axis``.

    Parity: reference ``zhusuan/utils.py:177-208``. Used by the
    importance-weighted objective (IWAE bound) and IS evaluation.
    """
    x = jnp.asarray(x)
    x_max = jax.lax.stop_gradient(
        jnp.max(x, axis=axis, keepdims=True)
    )
    # Guard against -inf max producing nan (all -inf slice); treat as 0 shift.
    x_max = jnp.where(jnp.isfinite(x_max), x_max, jnp.zeros_like(x_max))
    out = jnp.log(jnp.mean(jnp.exp(x - x_max), axis=axis, keepdims=True)) + x_max
    if not keepdims:
        out = out if axis is None else jnp.squeeze(out, axis=axis)
        if axis is None:
            out = jnp.reshape(out, ())
    return out


def merge_dicts(*dict_list: Dict[str, Any]) -> Dict[str, Any]:
    """Merge dicts; later dicts take precedence on key conflicts.

    Parity: reference ``zhusuan/utils.py:220-231``.
    """
    out: Dict[str, Any] = {}
    for d in dict_list:
        if d:
            out.update(d)
    return out


def split_by_names(d: Dict[str, Any], names) -> Dict[str, Any]:
    """Return the sub-dict of ``d`` restricted to ``names`` present in ``d``."""
    return {k: d[k] for k in names if k in d}


def add_name_scope(fn):
    """Decorator annotating ``fn``'s ops with a named scope so XLA HLO and
    profiler traces are readable.

    Parity: reference ``zhusuan/utils.py:211-217`` (tf.name_scope for
    TensorBoard); here it is ``jax.named_scope``.
    """

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.named_scope(fn.__name__):
            return fn(*args, **kwargs)

    return wrapper


def docinherit(src):
    """Decorator: copy the docstring from ``src`` if the target has none."""

    def deco(fn):
        if not fn.__doc__:
            fn.__doc__ = src.__doc__
        return fn

    return deco


def if_raise(cond: bool, exception: Exception):
    """Raise ``exception`` if ``cond``. Parity: ``zhusuan/utils.py:234``."""
    if cond:
        raise exception


def cached_property(fn):
    """Per-instance cached property (used for lazily computed node stats)."""
    attr = "_cached_" + fn.__name__

    @property
    @functools.wraps(fn)
    def wrapper(self):
        if not hasattr(self, attr):
            setattr(self, attr, fn(self))
        return getattr(self, attr)

    return wrapper
