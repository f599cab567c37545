"""Shared distribution helpers.

Capability parity with reference ``zhusuan/distributions/utils.py``:
``log_combination`` (utils.py:19), explicit broadcasting (utils.py:36-78 — in
JAX plain ``jnp.broadcast_arrays`` suffices, kept as thin wrappers for parity),
dtype assertions (utils.py:111-184), and the open-interval standard uniform
(utils.py:311-324) used by Gumbel/Logistic inverse-CDF samplers.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "log_combination",
    "explicit_broadcast",
    "maybe_explicit_broadcast",
    "is_same_dynamic_shape",
    "assert_same_float_dtype",
    "assert_same_float_and_int_dtype",
    "open_interval_standard_uniform",
    "broadcast_shapes",
]


def is_same_dynamic_shape(x, y):
    """Whether two arrays have the same shape.

    Parity: reference ``distributions/utils.py:81-108`` needed a dynamic
    graph-side comparison; JAX shapes are always static, so this is a plain
    Python bool.
    """
    return tuple(jnp.shape(x)) == tuple(jnp.shape(y))


def log_combination(n, ks):
    """Compute the log multinomial coefficient
    ``log( Gamma(n+1) / prod_i Gamma(ks_i+1) )`` with ks summed over the last
    axis.

    Parity: reference ``zhusuan/distributions/utils.py:19-33``.

    :param n: broadcastable to ``ks.shape[:-1]``; number of trials.
    :param ks: counts per category, last axis is the category axis.
    """
    n = jnp.asarray(n)
    ks = jnp.asarray(ks)
    return jax.lax.lgamma(n + 1.0) - jnp.sum(jax.lax.lgamma(ks + 1.0), axis=-1)


def explicit_broadcast(x, y, x_name="x", y_name="y"):
    """Broadcast ``x`` and ``y`` to a common shape, raising on mismatch.

    Parity: reference ``zhusuan/distributions/utils.py:36-49`` (which needed a
    multiply-by-ones trick under TF; XLA broadcasting is shape-static so a
    plain ``jnp.broadcast_arrays`` is both correct and free after fusion).
    """
    try:
        return jnp.broadcast_arrays(x, y)
    except ValueError:
        raise ValueError(
            "{} and {} cannot broadcast to match. ({} vs. {})".format(
                x_name, y_name, jnp.shape(x), jnp.shape(y)
            )
        )


def maybe_explicit_broadcast(x, y, x_name="x", y_name="y"):
    """Parity alias of :func:`explicit_broadcast`
    (reference ``distributions/utils.py:52-78``)."""
    return explicit_broadcast(x, y, x_name, y_name)


def broadcast_shapes(*shapes: Sequence[int]) -> Tuple[int, ...]:
    """Static broadcast of shapes, raising ValueError on incompatibility."""
    try:
        return tuple(np.broadcast_shapes(*shapes))
    except ValueError:
        raise ValueError(
            "Shapes cannot broadcast to match: {}".format(shapes)
        )


_FLOAT_DTYPES = (jnp.float16, jnp.bfloat16, jnp.float32, jnp.float64)
_INT_DTYPES = (jnp.int16, jnp.int32, jnp.int64)


def _dtype_of(t):
    return jnp.result_type(t)


def assert_same_float_dtype(tensors_with_name, dtype=None):
    """Check that all named tensors share one floating dtype; return it.

    Parity: reference ``zhusuan/distributions/utils.py:140-155``.

    :param tensors_with_name: list of ``(array_like, name)`` pairs.
    :param dtype: if given, the required dtype.
    :return: the common dtype.
    """
    return _assert_same_dtype_in(
        tensors_with_name, dtype, tuple(np.dtype(d) for d in _FLOAT_DTYPES), "float"
    )


def assert_same_float_and_int_dtype(tensors_with_name, dtype=None):
    """Like :func:`assert_same_float_dtype` but also admits integer dtypes.

    Parity: reference ``zhusuan/distributions/utils.py:158-174``.
    """
    allowed = tuple(np.dtype(d) for d in (_FLOAT_DTYPES + _INT_DTYPES))
    return _assert_same_dtype_in(tensors_with_name, dtype, allowed, "float or int")


def _assert_same_dtype_in(tensors_with_name, dtype, allowed, kind):
    expected = np.dtype(dtype) if dtype is not None else None
    for tensor, name in tensors_with_name:
        if tensor is None:
            continue
        if isinstance(tensor, (int, float)) and not isinstance(tensor, bool):
            # Python scalars are weakly typed: they adopt the dtype of the
            # other parameters (JAX weak-type semantics).
            continue
        t_dtype = np.dtype(_dtype_of(tensor))
        if expected is None:
            if t_dtype not in allowed:
                raise TypeError(
                    "{}({}) must have a {} dtype.".format(name, t_dtype, kind)
                )
            expected = t_dtype
        elif t_dtype != expected:
            raise TypeError(
                "{}({}) must have the same dtype as other parameters ({}).".format(
                    name, t_dtype, expected
                )
            )
    if expected is None:
        expected = np.dtype(jnp.float32)
    return expected


def open_interval_standard_uniform(key, shape, dtype=jnp.float32):
    """Sample Uniform on the open interval (0, 1).

    Parity: reference ``zhusuan/distributions/utils.py:311-324`` — minval is
    ``np.finfo(dtype).tiny`` so downstream ``log(u)`` / ``log(1-u)`` (Gumbel,
    Logistic, Laplace inverse-CDF samplers) never see 0.
    """
    dtype = np.dtype(dtype)
    # jnp.finfo handles ml_dtypes (bfloat16); np.finfo rejects it.
    tiny = float(jnp.finfo(dtype).tiny)
    return jax.random.uniform(key, shape, dtype=dtype, minval=tiny, maxval=1.0)
